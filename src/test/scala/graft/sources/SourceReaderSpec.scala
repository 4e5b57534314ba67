package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkTestBase

/** Error-tolerant reads (MAXERROR parity) + parquet schema evolution. */
class SourceReaderSpec extends SparkTestBase {

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-reader")
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)
    dir.toString
  }

  test("json under budget: bad rows quarantined, clean rows proceed") {
    val path = writeLines("d.json", Seq(
      """{"id":1,"name":"a"}""",
      """{"id":2,"name":"b"""", // truncated
      """{"id":3,"name":"c"}""",
      """not json at all"""))
    val r = SourceReader.readTolerant(spark, "json", path, maxErrors = 2)
    assert(r.corruptCount == 2)
    assert(r.data.count() == 2)
    assert(!r.data.columns.contains(SourceReader.CorruptCol))
    assert(r.corrupt.count() == 2) // quarantine keeps the raw lines
  }

  test("json over budget: load fails with ErrorBudgetExceeded") {
    val path = writeLines("d.json", Seq(
      """{"id":1}""", "oops", "nope", "bad"))
    val e = intercept[SourceReader.ErrorBudgetExceeded](
      SourceReader.readTolerant(spark, "json", path, maxErrors = 2))
    assert(e.corrupt == 3 && e.budget == 2)
  }

  test("json all-clean: zero corrupt, full data") {
    val path = writeLines("d.json", Seq("""{"id":1}""", """{"id":2}"""))
    val r = SourceReader.readTolerant(spark, "json", path, maxErrors = 0)
    assert(r.corruptCount == 0 && r.data.count() == 2)
  }

  test("csv with declared shape: malformed rows quarantined") {
    val path = writeLines("d.csv", Seq(
      "id,name",
      "1,alpha",
      "2,beta,EXTRA,COLUMNS", // shape mismatch
      "3,gamma"))
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    val r = SourceReader.readTolerant(spark, "csv", path, maxErrors = 1, csvSchema = Some(schema))
    assert(r.corruptCount == 1)
    assert(r.data.count() == 2)
  }

  test("pipeline lands rejected rows in a quarantine path and reports the count") {
    import graft.config.{SchemaConfig, SourceConfig, SourceType}
    val in = writeLines("d.json", Seq(
      """{"id":1,"v":"a"}""", "garbage line", """{"id":2,"v":"b"}"""))
    val out = Files.createTempDirectory("graft-qr").toString + "/out"
    val cfg = SourceConfig(name = "qtest", sourceType = SourceType.File,
      schema = SchemaConfig(inputFormat = "json", maxErrors = Some(5)))
    val report = graft.orchestrate.PipelineRunner.run(spark, cfg, in, out)
    assert(report.inputCount == 2 && report.quarantinedCount == 1)
    val q = spark.read.json(s"${out}_quarantine")
    assert(q.count() == 1)
    assert(q.select("raw_record").head().getString(0) == "garbage line")
  }

  test("orc format dispatch round-trips typed columns") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString
    Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "score")
      .write.mode("overwrite").orc(dir)
    val back = SourceReader.read(spark, "orc", dir)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)).toSet ==
      Set(("id", "long"), ("name", "string"), ("score", "double")))
    assert(back.orderBy($"id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("parquet mergeSchema unions columns added over time") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-merge").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/p1")
    Seq((2L, 3.5)).toDF("id", "score").write.parquet(s"$dir/p2")
    val merged = SourceReader.readMerged(spark, s"$dir/p*")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 2)
  }
}
