package graft.transform

import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.config.{MappingTarget, SchemaConfig, TransformSpec}

class TransformsSuite extends SparkTestBase {
  import spark.implicits._

  private lazy val customers = spark.read.json(
    graft.SparkTestBase.resource("payloads/customers.json"))

  test("mapping: flat rename drops old name, dotted path keeps source struct") {
    val out = MappingCompiler.compile(Seq(
      "customerId" -> MappingTarget.Path("id"),
      "customerCity" -> MappingTarget.Path("address.city")))(customers)
    assert(out.columns.contains("customerId") && !out.columns.contains("id"))
    assert(out.columns.contains("customerCity") && out.columns.contains("address"))
    assert(out.filter($"customerId" === 1).select($"customerCity").head().getString(0)
      == "Springfield")
  }

  test("mapping: struct-valued target (P3 — declared semantics, fixed here)") {
    val out = MappingCompiler.compile(Seq(
      "customerAddress" -> MappingTarget.Struct(Seq(
        "street" -> MappingTarget.Path("address.street"),
        "zip" -> MappingTarget.Path("address.zipcode")))))(customers)
    val row = out.filter($"id" === 2).select($"customerAddress").head().getStruct(0)
    assert(row.getAs[String]("street") == "2 Oak Ave")
    assert(row.getAs[String]("zip") == "97201")
  }

  test("mapping: later entries see earlier renames (declaration order)") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = MappingCompiler.compile(Seq(
      "renamed" -> MappingTarget.Path("a"),
      "copy" -> MappingTarget.Path("renamed")))(df)
    assert(out.columns.toSeq == Seq("copy", "b")) // second rename consumed "renamed"
  }

  test("transforms: datetime truncates to date, moment format normalized, bad parse → null") {
    val out = Transforms.compile(Seq(
      TransformSpec("created_at", "datetime", format = Some("YYYY-MM-DD HH:mm:ss"))))(customers)
    val byId = out.select($"id", $"created_at").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(byId(1) == java.sql.Date.valueOf("2024-03-01")) // time truncated
    assert(byId(8) == null)                                // "not a date" → null, row kept
  }

  test("transforms: casts, trim, regexp_replace; unknown type and missing field skipped") {
    val df = Seq(("7", " pad ", "a1b2", "zzz")).toDF("num", "padded", "coded", "keep")
    val out = Transforms.compile(Seq(
      TransformSpec("num", "integer"),
      TransformSpec("padded", "trim"),
      TransformSpec("coded", "regexp_replace", pattern = Some("[0-9]"), replacement = Some("")),
      TransformSpec("keep", "definitely_not_a_transform"), // silently skipped
      TransformSpec("", "integer"),                        // missing field skipped
      TransformSpec("num", "")))(df)                       // missing type skipped
    val r = out.head()
    assert(r.getAs[Int]("num") == 7)
    assert(r.getAs[String]("padded") == "pad")
    assert(r.getAs[String]("coded") == "ab")
    assert(r.getAs[String]("keep") == "zzz")
  }

  test("transforms: string/double casts; bad integer cast → null (permissive)") {
    val df = Seq((1.5, "not_a_number")).toDF("d", "s")
    val out = Transforms.compile(Seq(
      TransformSpec("d", "string"),
      TransformSpec("s", "integer")))(df)
    val r = out.head()
    assert(r.getAs[String]("d") == "1.5")
    assert(r.get(r.fieldIndex("s")) == null)
  }

  test("null filter: conjunction over required fields") {
    val out = NullFilter.compile(Seq("name", "email"))(customers)
    assert(out.count() == 6) // drops id=4 (null name) and id=5 (null email)
    assert(NullFilter.compile(Nil)(customers).count() == 8)
  }

  test("metadata: source_name + pinned processed_timestamp") {
    val t0 = LocalDateTime.of(2026, 1, 15, 12, 30, 45)
    val out = Metadata.compile("my_source", t0)(customers)
    val r = out.select($"source_name", $"processed_timestamp").distinct().collect()
    assert(r.length == 1) // identical for every row — deterministic
    assert(r.head.getString(0) == "my_source")
    assert(r.head.getTimestamp(1).toString == "2026-01-15 12:30:45.0")
  }

  test("partitioner: first date-ish column heuristic; existing column untouched") {
    val df = Seq(("2024-03-01", "2030-01-01", 5))
      .toDF("update_date", "other_date", "day") // "day" already exists
      .withColumn("update_date", to_date($"update_date"))
      .withColumn("other_date", to_date($"other_date"))
    val out = Partitioner.compile(Seq("year", "month", "day"),
      LocalDateTime.of(2026, 6, 1, 0, 0))(df)
    val r = out.select($"year", $"month", $"day").head()
    assert(r == Row(2024, 3, 5)) // year/month from FIRST date col; day pre-existing
  }

  test("partitioner: constant fallback from pinned start time when no date column") {
    val df = Seq((1, "a")).toDF("k", "v")
    val out = Partitioner.compile(Seq("year", "month", "day"),
      LocalDateTime.of(2026, 6, 15, 0, 0))(df)
    assert(out.select($"year", $"month", $"day").head() == Row(2026, 6, 15))
  }

  test("partitioner idempotent: second application is a no-op") {
    val t0 = LocalDateTime.of(2026, 1, 1, 0, 0)
    val once = Partitioner.compile(Seq("year", "month"), t0)(customers)
    val twice = Partitioner.compile(Seq("year", "month"), t0)(once)
    assert(once.schema == twice.schema)
  }

  test("full pipeline composition matches stage order") {
    val t0 = LocalDateTime.of(2026, 2, 2, 2, 2, 2)
    val schema = SchemaConfig(
      mapping = Seq(
        "customerId" -> MappingTarget.Path("id"),
        "createdDate" -> MappingTarget.Path("created_at")),
      required = Seq("customerId"),
      transformations = Seq(TransformSpec("createdDate", "datetime",
        format = Some("yyyy-MM-dd HH:mm:ss"))))
    val out = TransformPipeline.compile(schema, "cust", t0, Seq("year", "month"))(customers)
    assert(out.columns.contains("source_name"))
    assert(out.count() == 8)
    // partition cols derive from createdDate (first "date"-ish col after mapping)
    val y = out.filter($"customerId" === 2).select($"year", $"month").head()
    assert(y == Row(2024, 3))
  }
}
