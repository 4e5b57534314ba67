package graft.stream

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.config.{SourceConfig, SourceType, StreamConfig}

/** The executed streaming-broker contract (S13/S13c engine side): the
  * custom DSv2 [[BrokerLogMicroBatchStream]] must track per-partition
  * offsets, plan micro-batches between offset vectors, recover from a
  * checkpoint after restart WITHOUT reprocessing, discover partitions
  * appearing mid-stream, and replay from zero on a fresh checkpoint
  * (broker retention). Payloads flow through the same
  * [[StreamSource.parseJsonPayload]] the Kafka/Kinesis plans use.
  */
class BrokerLogStreamSpec extends SparkTestBase {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private val eventSchema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType)))

  private def appendEvent(dir: String, partition: Int, id: Long): Unit =
    BrokerLog.appendText(dir, partition, s"""{"id":$id,"kind":"k${id % 3}"}""",
      tsMicros = 1700000000000000L + id)

  private def runOnce(broker: String, out: String, ckpt: String): Unit = {
    val parsed = StreamSource.readBroker(spark, broker, eventSchema)
    val q = parsed.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("offset vector JSON round-trips through the checkpoint format") {
    val o = BrokerOffsets(Map(2 -> 7L, 0 -> 3L))
    assert(o.json() == """{"0":3,"2":7}""")
    assert(BrokerOffsets.fromJson(o.json()) == o)
    assert(BrokerOffsets.fromJson("{}") == BrokerOffsets(Map.empty))
  }

  test("appends are offset-contiguous per partition and batch read replays all") {
    val broker = tmp("broker-batch").toString
    (0 until 6).foreach(i => appendEvent(broker, i % 2, i.toLong))
    assert(BrokerLog.latestOffsets(broker) == Map(0 -> 3L, 1 -> 3L))
    val rows = spark.read.format("graft-broker").option("path", broker)
      .load().collect()
    assert(rows.length == 6)
    // Offsets are 0,1,2 within each partition; value bytes are intact.
    val byPart = rows.groupBy(_.getInt(0))
    assert(byPart.keySet == Set(0, 1))
    byPart.values.foreach(rs => assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L)))
    val texts = rows.map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toSet
    assert(texts.contains("""{"id":4,"kind":"k1"}"""))
  }

  test("micro-batch stream parses payloads and lands exactly the appended records") {
    val broker = tmp("broker-run").toString
    val out = tmp("broker-out").toString
    val ckpt = tmp("broker-ckpt").toString
    (0 until 10).foreach(i => appendEvent(broker, i % 3, i.toLong))
    runOnce(broker, out, ckpt)
    val landed = spark.read.parquet(out)
    assert(landed.count() == 10)
    assert(landed.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 10L).toSeq)
    assert(landed.schema.fieldNames.toSeq == Seq("id", "kind"))
  }

  test("restart from checkpoint resumes at committed offsets — no reprocessing, new partitions discovered") {
    val broker = tmp("broker-restart").toString
    val out = tmp("broker-restart-out").toString
    val ckpt = tmp("broker-restart-ckpt").toString
    (0 until 5).foreach(i => appendEvent(broker, i % 2, i.toLong))
    runOnce(broker, out, ckpt)
    assert(spark.read.parquet(out).count() == 5)

    // Crash/stop happened; more data arrives, including a partition the
    // first run never saw.
    (5 until 9).foreach(i => appendEvent(broker, i % 2, i.toLong))
    appendEvent(broker, partition = 2, id = 9L)
    runOnce(broker, out, ckpt)

    val landed = spark.read.parquet(out)
    // Exactly once: 10 distinct ids, 10 rows — the first five were NOT
    // re-read (a replay would double them).
    assert(landed.count() == 10)
    assert(landed.select("id").distinct().count() == 10)

    // The committed offset log itself carries the broker offset vector.
    val names = new scala.collection.mutable.ArrayBuffer[Path]
    Files.list(java.nio.file.Paths.get(ckpt, "offsets"))
      .iterator().forEachRemaining(p => names += p)
    val latest = names.filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    val text = new String(Files.readAllBytes(latest), "UTF-8")
    assert(text.contains(""""0":5""") && text.contains(""""1":4""") &&
      text.contains(""""2":1"""), s"checkpointed offsets should be the broker vector: $text")
  }

  test("fresh checkpoint replays the retained log from offset zero") {
    val broker = tmp("broker-replay").toString
    (0 until 4).foreach(i => appendEvent(broker, 0, i.toLong))
    val out1 = tmp("broker-replay-out1").toString
    runOnce(broker, out1, tmp("broker-replay-ckpt1").toString)
    val out2 = tmp("broker-replay-out2").toString
    runOnce(broker, out2, tmp("broker-replay-ckpt2").toString)
    assert(spark.read.parquet(out1).count() == 4)
    assert(spark.read.parquet(out2).count() == 4, "retention: a new consumer replays all")
  }

  test("retired partition: a checkpointed partition that disappears is dropped from planning, stream continues") {
    val broker = tmp("broker-shrink").toString
    val out = tmp("broker-shrink-out").toString
    val ckpt = tmp("broker-shrink-ckpt").toString
    (0 until 6).foreach(i => appendEvent(broker, i % 2, i.toLong))
    runOnce(broker, out, ckpt)
    assert(spark.read.parquet(out).count() == 6)

    // Retention retires partition 1 entirely (Kinesis shard merge /
    // topic shrink): its directory is gone, but the checkpoint still
    // carries {"1":3}. The next run must plan only surviving
    // partitions — no crash, no attempt to read the retired log.
    val p1 = java.nio.file.Paths.get(broker, "p1")
    Files.list(p1).iterator().forEachRemaining(f => Files.delete(f))
    Files.delete(p1)
    (6 until 9).foreach(i => appendEvent(broker, 0, i.toLong))
    runOnce(broker, out, ckpt)

    val landed = spark.read.parquet(out)
    assert(landed.count() == 9)
    assert(landed.select("id").distinct().count() == 9, "no reprocessing, no loss")

    // A REVIVED partition id is a NEW partition: the retirement run's
    // committed offset vector (always `latestOffset` of that run)
    // dropped p1, so a same-named partition reappearing replays from
    // its new offset 0 — Kinesis shard-retire semantics, where a
    // recreated shard carries no memory of its namesake. (Contrast
    // Kafka, which never reuses a retired partition id.)
    (0 until 5).foreach(i => appendEvent(broker, 1, (100 + i).toLong))
    runOnce(broker, out, ckpt)
    val after = spark.read.parquet(out)
    assert(after.count() == 14, s"revived p1 replays from zero: ${after.count()}")
    assert(after.where("id >= 100").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L, 102L, 103L, 104L))
  }

  test("two readers with separate checkpoints are isolated consumer groups") {
    val broker = tmp("broker-two").toString
    val outA = tmp("broker-two-outA").toString
    val outB = tmp("broker-two-outB").toString
    val ckptA = tmp("broker-two-ckptA").toString
    val ckptB = tmp("broker-two-ckptB").toString

    (0 until 4).foreach(i => appendEvent(broker, i % 2, i.toLong))
    runOnce(broker, outA, ckptA)               // A reads 0-3
    (4 until 7).foreach(i => appendEvent(broker, i % 2, i.toLong))
    runOnce(broker, outB, ckptB)               // B starts late: replays 0-6
    runOnce(broker, outA, ckptA)               // A catches up: 4-6 only

    assert(spark.read.parquet(outA).count() == 7)
    assert(spark.read.parquet(outB).count() == 7)
    assert(spark.read.parquet(outA).select("id").distinct().count() == 7,
      "reader A never reprocessed despite B's independent progress")

    // Concurrent tail: both run against the same new records; each
    // lands them exactly once in its own sink.
    (7 until 10).foreach(i => appendEvent(broker, i % 2, i.toLong))
    val qs = Seq((outA, ckptA), (outB, ckptB)).map { case (o, c) =>
      StreamSource.readBroker(spark, broker, eventSchema)
        .writeStream.format("parquet").option("path", o)
        .option("checkpointLocation", c).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
    }
    qs.foreach(_.awaitTermination())
    Seq(outA, outB).foreach { o =>
      val df = spark.read.parquet(o)
      assert(df.count() == 10 && df.select("id").distinct().count() == 10,
        s"$o must hold exactly the 10 appended records")
    }
  }

  test("malformed payloads degrade to all-null rows, never kill the stream") {
    val broker = tmp("broker-poison").toString
    appendEvent(broker, 0, 1L)
    BrokerLog.appendText(broker, 0, "not json at all {{{", 1700000000000000L)
    val out = tmp("broker-poison-out").toString
    runOnce(broker, out, tmp("broker-poison-ckpt").toString)
    val landed = spark.read.parquet(out)
    assert(landed.count() == 2)
    assert(landed.where("id IS NULL AND kind IS NULL").count() == 1)
  }

  test("config branch: format broker drives the stream pipeline end to end") {
    val broker = tmp("broker-cfg").toString
    val samples = tmp("broker-cfg-samples")
    Files.write(samples.resolve("sample.json"),
      """{"id":1,"kind":"k1","ts":"2026-01-01T00:00:00.000Z"}""".getBytes("UTF-8"))
    val iso = java.time.format.DateTimeFormatter.ISO_INSTANT
    (0 until 6).foreach { i =>
      BrokerLog.appendText(broker, i % 2,
        s"""{"id":$i,"kind":"k${i % 3}","ts":"${iso.format(java.time.Instant.ofEpochSecond(1700000000L + i * 60))}"}""",
        1700000000000000L + i)
    }
    val out = tmp("broker-cfg-out").toString
    val cfg = SourceConfig(
      name = "broker_pipeline", sourceType = SourceType.Stream,
      stream = Some(StreamConfig(
        format = "broker", topic = broker,
        landingPath = samples.toString,
        watermarkColumn = "ts",
        checkpointDir = tmp("broker-cfg-ckpt").toString,
        outputPath = out)))
    StreamPipeline.run(spark, cfg).awaitTermination()
    assert(spark.read.parquet(out).count() == 6)
  }
}
