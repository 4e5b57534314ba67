package graft.stream

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import graft.config.ConfigLoader

/** Config-driven SourceType.Stream branch: YAML → StreamPipeline.run →
  * checkpointed sink, for both the passthrough-landing and the
  * windowed-publish shapes.
  */
class StreamPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:05:00"), "click", 1.5),
    (2L, ts("2024-01-01 10:35:00"), "click", 2.0),
    (3L, ts("2024-01-01 11:10:00"), "view", 3.0),
    (4L, ts("2024-01-01 11:40:00"), "view", 0.5))

  test("file-stream passthrough lands parquet via config") {
    val landing = Files.createTempDirectory("graft-sp-land").toString
    val out = Files.createTempDirectory("graft-sp-out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft-sp-ckpt").toString
    events.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(landing)

    val cfg = ConfigLoader.fromYaml(
      s"""source:
         |  name: events_stream
         |  type: stream
         |  stream:
         |    format: parquet
         |    landing_path: $landing
         |    output_path: $out
         |    checkpoint_dir: $ckpt
         |""".stripMargin)
    val q = StreamPipeline.run(spark, cfg)
    q.awaitTermination()
    assert(spark.read.parquet(out).count() == 4)
  }

  test("windowed stream publishes hourly aggregate through the warehouse swap") {
    val landing = Files.createTempDirectory("graft-sp-land2").toString
    val ckpt = Files.createTempDirectory("graft-sp-ckpt2").toString
    val df = events.toDF("event_id", "ts", "event_type", "value")
    df.write.mode("overwrite").parquet(landing)

    val cfg = ConfigLoader.fromYaml(
      s"""source:
         |  name: events_hourly
         |  type: stream
         |  stream:
         |    format: parquet
         |    landing_path: $landing
         |    watermark_column: ts
         |    watermark_delay: 10 minutes
         |    window_duration: 1 hour
         |    checkpoint_dir: $ckpt
         |  warehouse:
         |    schema: streamcfg
         |    table: hourly
         |    analyze: false
         |""".stripMargin)
    val q = StreamPipeline.run(spark, cfg)
    try {
      q.processAllAvailable()
      val expected = EventWindows.tumblingByType(df, "1 hour")
        .collect().map(_.toSeq).toSet
      val got = spark.table("streamcfg_hourly").collect().map(_.toSeq).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
