package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.{IvfIndex, SimSearch}

case class SivVec(vec_id: Long, embedding: Seq[Float])

/** Streaming IVF upsert: the accumulated index equals a one-shot
  * assignment for any micro-batch slicing; replay is idempotent;
  * serving over the streamed index equals batch serving.
  */
class StreamIvfUpsertSpec extends SparkTestBase {

  private lazy val all: Seq[SivVec] = {
    val s = spark
    s.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 48)
      .select("vec_id", "embedding")
      .collect()
      .map(r => SivVec(r.getLong(0), r.getSeq[Float](1)))
      .toSeq
  }

  private lazy val cents = {
    val s = spark
    SimSearch.trainCentroidsLocked(
      s.read.parquet(s"$sf0001/embeddings.parquet"), 16, 2).localCheckpoint()
  }

  private def oneShot = {
    val s = spark; import s.implicits._
    IvfIndex.assignCells(all.toDF(), cents).collect().map(_.toSeq).toSet
  }

  private def runStream(split: Int): String = {
    val s = spark
    val ms = MemoryStream[SivVec](
      org.apache.spark.sql.Encoders.product[SivVec], s.sqlContext)
    val out = Files.createTempDirectory("siv_out").toString
    val ckpt = Files.createTempDirectory("siv_ckpt").toString
    val q = StreamIvfUpsert.start(s, ms.toDF(), cents, out, ckpt)
    try all.grouped(split).foreach(g => { ms.addData(g); q.processAllAvailable() })
    finally q.stop()
    out
  }

  test("serving may start before the first micro-batch commits:" +
    " empty/missing output dir reads as an empty index") {
    // Missing dir entirely.
    val missing = Files.createTempDirectory("siv_empty").toString + "/never_written"
    val idx0 = StreamIvfUpsert.readIndex(spark, missing)
    assert(idx0.columns.toSeq === Seq("vec_id", "cell"))
    assert(idx0.count() === 0L)
    // Dir exists (e.g. created by the sink) but no batch_id= partition
    // has committed yet.
    val bare = Files.createTempDirectory("siv_bare").toString
    val idx1 = StreamIvfUpsert.readIndex(spark, bare)
    assert(idx1.count() === 0L)
  }

  test("accumulated index equals the one-shot assignment, any slicing") {
    val truth = oneShot
    for (split <- Seq(7, 16, 48)) {
      val out = runStream(split)
      val got = StreamIvfUpsert.readIndex(spark, out)
        .collect().map(_.toSeq).toSet
      assert(got === truth, s"split=$split")
    }
  }

  test("replaying a micro-batch is idempotent and leaves other batches alone") {
    val s = spark; import s.implicits._
    val out = Files.createTempDirectory("siv_replay").toString
    val (b0, b1) = all.splitAt(24)
    StreamIvfUpsert.writeBatch(b0.toDF(), 0L, cents, out)
    StreamIvfUpsert.writeBatch(b1.toDF(), 1L, cents, out)
    val before = StreamIvfUpsert.readIndex(s, out).collect().map(_.toSeq).toSet
    StreamIvfUpsert.writeBatch(b1.toDF(), 1L, cents, out) // crash-window replay
    val after = StreamIvfUpsert.readIndex(s, out).collect().map(_.toSeq).toSet
    assert(after === before)
    assert(after.size === all.size)
  }

  test("serving over the streamed index equals batch serving") {
    val s = spark; import s.implicits._
    val out = runStream(16)
    val emb = all.toDF().withColumnRenamed("embedding", "embedding")
    val served = IvfIndex.topKOverCells(emb,
      StreamIvfUpsert.readIndex(s, out), cents, 8, 3, 4)
      .collect().map(_.toSeq).toSet
    val batch = IvfIndex.topKOverCells(emb,
      IvfIndex.assignCells(emb, cents), cents, 8, 3, 4)
      .collect().map(_.toSeq).toSet
    assert(served === batch)
    assert(served.nonEmpty)
  }
}
