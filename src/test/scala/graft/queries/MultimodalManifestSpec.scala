package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Structural invariants of the cross-modal manifest beyond its oracle
  * hash: the keep flag must be exactly the conjunction of the four
  * lane flags, every document must appear exactly once (the doc-keyed
  * joins neither drop nor duplicate), and each lane must discriminate
  * on the fixture (a gate that always passes or always fails is a
  * broken gate even if it hashes consistently).
  */
class MultimodalManifestSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("keep is exactly the four-lane conjunction; one row per document") {
    val m = NorthStar.multimodalManifest(spark, dir).cache()
    try {
      val nDocs = graft.Tables.t(spark, dir, "documents").count()
      assert(m.count() == nDocs, "one manifest row per document")
      assert(m.select(col("doc_id")).distinct().count() == nDocs, "no duplicate docs")
      assert(m.filter(col("keep") =!=
        (col("text_ok") && col("image_ok") && col("audio_ok") && col("video_ok")))
        .count() == 0, "keep == conjunction of lanes")
      // Lane-level replays of the generator contracts.
      assert(m.filter((col("doc_id") % 7 === 0) === col("image_ok")).count() == 0,
        "image_ok is exactly the uncorrupted set")
      assert(m.filter((col("n_frames") >= 3) =!= col("video_ok")).count() == 0)
      // Each gate discriminates on the fixture.
      for (flag <- Seq("text_ok", "image_ok", "audio_ok", "video_ok", "keep")) {
        val kept = m.filter(col(flag)).count()
        assert(kept > 0 && kept < nDocs, s"$flag must discriminate, kept=$kept/$nDocs")
      }
    } finally { m.unpersist(); () }
  }
}
