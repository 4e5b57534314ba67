package graft.sink

import java.nio.file.Files
import java.time.LocalDateTime

import graft.SparkTestBase

/** K3 raw-zone landing: hive time-partition layout on disk, append
  * semantics across landings, and partition-pruned readback.
  */
class PartitionedWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("landRaw appends time-partitioned batches and prunes on read") {
    val path = Files.createTempDirectory("graft-raw").toString + "/landing"
    val t1 = LocalDateTime.of(2026, 3, 1, 10, 0)
    val t2 = LocalDateTime.of(2026, 3, 1, 11, 0)
    PartitionedWriter.landRaw(Seq((1, "a"), (2, "b")).toDF("id", "v"), path, t1)
    PartitionedWriter.landRaw(Seq((3, "c")).toDF("id", "v"), path, t2)

    // Hive layout on disk: ingest_year=2026/.../ingest_hour=10|11
    val hours = new java.io.File(
      s"$path/ingest_year=2026/ingest_month=3/ingest_day=1").list().sorted
    assert(hours.toSeq == Seq("ingest_hour=10", "ingest_hour=11"))

    val back = spark.read.json(path)
    assert(back.count() == 3) // append, not overwrite
    val pruned = back.filter($"ingest_hour" === 11)
    assert(pruned.count() == 1 && pruned.select("v").head().getString(0) == "c")
  }
}
