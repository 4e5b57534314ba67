package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.config.WarehouseConfig
import graft.sink.WarehousePublisher

/** Streaming rollup maintenance: the published table IS the state —
  * folding micro-batch aggregates must reach the direct aggregate of
  * everything, version history must advance per fold, and a
  * redelivered batch must be a no-op (the applied-batch stamp commits
  * atomically with the data).
  */
class StreamRollupSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rollup(df: DataFrame): DataFrame = df
    .groupBy(col("user_id"))
    .agg(count(lit(1)).as("n_events"),
      sum(expr("cast(round(value * 100, 0) as bigint)")).as("v_cents"))

  private def seed(cfg: WarehouseConfig): Unit = {
    val s = spark; import s.implicits._
    WarehousePublisher.publish(spark,
      Seq.empty[(Long, Long, Long)].toDF("user_id", "n_events", "v_cents"), cfg)
  }

  private def snap(cfg: WarehouseConfig) =
    spark.table(cfg.qualified).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("stream of batches folds to the direct aggregate; versions advance") {
    val s = spark; import s.implicits._
    val cfg = WarehouseConfig(schema = "rollspec", table = "t1", analyze = false)
    seed(cfg)
    val b1 = Seq(Ev(1, 1, ts("2024-01-01 10:00:00"), "view", 1.00),
      Ev(2, 2, ts("2024-01-01 10:01:00"), "view", 2.00))
    val b2 = Seq(Ev(3, 1, ts("2024-01-01 10:02:00"), "view", 0.50))
    val b3 = Seq(Ev(4, 3, ts("2024-01-01 10:03:00"), "view", 9.00))
    val ms = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], s.sqlContext)
    val q = StreamSink.rollupEachBatch(spark, ms.toDF(), cfg,
      Seq("user_id"), Seq("n_events", "v_cents"), rollup,
      java.nio.file.Files.createTempDirectory("rollck").toString)
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val direct = rollup((b1 ++ b2 ++ b3).toDF()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(snap(cfg) == direct)
    assert(direct == Set((1L, 2L, 150L), (2L, 1L, 200L), (3L, 1L, 900L)))
    // One fold per batch on top of the seed: the rollup's history is
    // time-travelable.
    assert(WarehousePublisher.currentVersion(spark, cfg.qualified) == 4L)
  }

  test("redelivered batch is a no-op: marker commits with the data") {
    val s = spark; import s.implicits._
    val cfg = WarehouseConfig(schema = "rollspec", table = "t2", analyze = false)
    seed(cfg)
    val batch = Seq(Ev(1, 7, ts("2024-01-01 10:00:00"), "view", 3.00)).toDF()
    StreamSink.applyRollupBatch(spark, batch, 0L, cfg,
      Seq("user_id"), Seq("n_events", "v_cents"), rollup)
    val after = snap(cfg)
    // Crash-after-commit redelivery: same batch id arrives again.
    StreamSink.applyRollupBatch(spark, batch, 0L, cfg,
      Seq("user_id"), Seq("n_events", "v_cents"), rollup)
    assert(snap(cfg) == after)
    assert(after == Set((7L, 1L, 300L)))
    assert(WarehousePublisher.currentVersion(spark, cfg.qualified) == 2L)
    // The next batch id folds normally.
    StreamSink.applyRollupBatch(spark, batch, 1L, cfg,
      Seq("user_id"), Seq("n_events", "v_cents"), rollup)
    assert(snap(cfg) == Set((7L, 2L, 600L)))
  }
}
