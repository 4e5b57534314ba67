package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The Bloom-skip contract: pruning must BITE (clustered keys resolve
  * to a strict subset of files), never lose a row (exactness vs the
  * plain scan), and degrade to ~zero files for absent keys (false
  * positives allowed, misses not).
  */
class BloomSkipSpec extends SparkTestBase {
  import spark.implicits._

  private def landed(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-bloomskip").toString
    val df = (0L until 8000L).map(k => (k, k % 97)).toDF("k", "v")
    ZoneMap.landClustered(df, path, "k", numFiles = 8)
    path
  }

  test("IN probe opens a strict subset of files and matches the plain scan") {
    val path = landed()
    val idx = BloomSkip.buildIndex(spark, path, "k", 10000L, 0.01)
    val keys = Seq(5L, 3003L, 7777L)
    val (scan, read, total) = BloomSkip.prunedInScan(spark, path, idx, "k", keys)
    assert(total === 8)
    // 3 clustered keys live in <=3 files; fpp 1% over 8 files adds at
    // most a file or two in pathological luck — strict subset still.
    assert(read < 8, s"no pruning: $read/$total")
    val got = scan.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = keys.map(k => (k, k % 97)).toSet
    assert(got === expect)
  }

  test("absent keys prune to (almost) nothing and return zero rows") {
    val path = landed()
    val idx = BloomSkip.buildIndex(spark, path, "k", 10000L, 0.01)
    val (scan, read, total) = BloomSkip.prunedInScan(
      spark, path, idx, "k", Seq(1000000L, 2000000L))
    assert(total === 8)
    assert(read <= 2, s"false-positive burst: $read files for absent keys")
    assert(scan.count() === 0)
  }

  test("per-file partial blooms merge: keys from every split are found") {
    val path = landed()
    // Force tiny splits so single files span multiple input partitions
    // and the OR-merge path actually runs.
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val idx = BloomSkip.buildIndex(spark, path, "k", 10000L, 0.01)
      assert(idx.count() === 8)
      assert(idx.agg(sum("n_rows")).head().getLong(0) === 8000L)
      // Every landed key must be found in its own file's bloom.
      val probe = Seq(0L, 1999L, 4001L, 7999L)
      val files = BloomSkip.qualifyingFiles(idx, probe)
      val (scan, _, _) = BloomSkip.prunedInScan(spark, path, idx, "k", probe)
      assert(files.nonEmpty)
      assert(scan.count() === probe.size.toLong)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
