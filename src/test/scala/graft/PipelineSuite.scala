package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.{ConfigLoader, QualityCheck, TemplateResolver, WarehouseConfig}
import graft.orchestrate.{PipelineRunner, Retry}
import graft.quality.QualityChecks
import graft.sink.WarehousePublisher

/** End-to-end: config file → PipelineRunner.run → partitioned parquet on
  * disk + run report; plus publisher swap and quality/monitor units.
  */
class PipelineSuite extends SparkTestBase {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-e2e").toString

  test("orders end-to-end: config-driven transform, hive partition layout, counts") {
    val out = tmp()
    val cfg = ConfigLoader.fromFile(
      SparkTestBase.resource("configs/orders_basic.yaml"),
      TemplateResolver.fromMaps(env = sys.env ++ Map("GRAFT_TEST_OUT" -> out)))
    val report = PipelineRunner.run(spark, cfg,
      inputPath = s"$sf0001/orders.parquet",
      outputPath = cfg.destination.processed.get.path,
      startTime = java.time.LocalDateTime.of(2026, 3, 1, 0, 0))

    assert(report.inputCount == 1500 && report.outputCount == 1500)
    assert(report.qualityPassed)
    assert(report.breachedMonitors == Seq("record_count")) // >10 rows fires the monitor
    // Hive-style layout on disk: year=YYYY/month=M/day=D
    val years = new java.io.File(s"$out/orders_processed").list().filter(_.startsWith("year="))
    assert(years.nonEmpty && years.forall(_.matches("year=(199[5-9]|200[0-1])")))
    // read back: partition pruning columns present, mapping applied
    val back = spark.read.parquet(s"$out/orders_processed")
    assert(back.columns.toSet.contains("orderKey"))
    assert(back.columns.toSet.contains("source_name"))
    assert(back.filter($"year" === 1995).count() > 0)
    // priority regexp_replace applied: "1-URGENT" → "URGENT"
    assert(back.select($"priority").distinct().as[String].collect().forall(!_.matches("^[0-9]-.*")))
    // O5 crawler parity: the landed raw zone is now a discoverable
    // catalog table pointing at the input (no data copied), queryable
    // by name with the raw schema.
    assert(spark.catalog.tableExists("raw_orders_basic"))
    assert(spark.table("raw_orders_basic").count() == 1500)
    assert(spark.table("raw_orders_basic").columns.contains("o_orderkey"))
    // re-registration (crawler re-run) replaces, not fails
    PipelineRunner.registerRawZone(spark, "orders_basic", s"$sf0001/orders.parquet", "parquet")
    assert(spark.table("raw_orders_basic").count() == 1500)
  }

  test("customers end-to-end: nested mapping + quality violations detected") {
    val out = tmp()
    val cfg = ConfigLoader.fromFile(
      SparkTestBase.resource("configs/customers_nested.yaml"),
      TemplateResolver.fromMaps(
        env = sys.env ++ Map("GRAFT_TEST_OUT" -> out, "GRAFT_STUB_ENDPOINT" -> "http://unused"),
        secrets = Map("customer_api_key" -> "k")))
    val report = PipelineRunner.run(spark, cfg,
      inputPath = SparkTestBase.resource("payloads/customers.json"),
      outputPath = cfg.destination.processed.get.path,
      startTime = java.time.LocalDateTime.of(2026, 3, 1, 0, 0))

    assert(report.inputCount == 8)
    assert(report.outputCount == 6) // null name + null email dropped (required)
    assert(!report.qualityPassed)   // bad email + duplicate id survive to QC

    val back = spark.read.parquet(s"$out/customers_processed")
    val qc = QualityChecks.run(back, cfg.qualityChecks)
    val byKind = qc.results.map(r => r.check.kind -> r.violations).toMap
    assert(byKind("not_null") == 0) // nulls already filtered by required
    assert(byKind("unique") == 1)   // id=6 duplicated
    assert(byKind("regex") == 1)    // "not-an-email"
    // struct target materialized
    val addr = back.filter($"customerId" === 2).select($"customerAddress.street").head().getString(0)
    assert(addr == "2 Oak Ave")
  }

  test("quarantine returns exactly the violating rows") {
    val df = Seq(
      (1L, "a@x.com"), (2L, null.asInstanceOf[String]), (3L, "bad"), (3L, "c@x.com")
    ).toDF("id", "email")
    val checks = Seq(
      QualityCheck("not_null", Seq("email")),
      QualityCheck("regex", Seq("email"), pattern = Some("^[^@]+@[^@]+$")),
      QualityCheck("unique", Seq("id")))
    val q = QualityChecks.quarantine(df, checks)
    // null email, bad regex, and the 2nd copy of id=3
    assert(q.count() == 3)
  }

  test("warehouse publish: staging swap is atomic and repeatable; analyze runs") {
    val cfg = WarehouseConfig(schema = "t", table = "pub", distkey = Some("k"),
      sortkey = Seq("v"), analyze = true)
    val df1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r1 = WarehousePublisher.publish(spark, df1, cfg)
    assert(r1.rowsLoaded == 2 && r1.analyzed)
    assert(spark.table("t_pub").count() == 2)

    val df2 = Seq((3, "c")).toDF("k", "v")
    val r2 = WarehousePublisher.publish(spark, df2, cfg) // replaces, never appends
    assert(r2.rowsLoaded == 1)
    assert(spark.table("t_pub").count() == 1)
    assert(!spark.catalog.tableExists("t_pub_staging"))
    assert(!spark.catalog.tableExists("t_pub_old"))
  }

  test("retry: exponential backoff retries then succeeds; exhausts then throws") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val v = Retry.withBackoff(3, baseSeconds = 0.001, sleep = slept.append(_)) {
      calls += 1
      if (calls < 3) sys.error("flaky") else 42
    }
    assert(v == 42 && calls == 3)
    assert(slept.toSeq == Seq(1L, 2L)) // exponential: 1ms, 2ms

    intercept[RuntimeException] {
      Retry.withBackoff(2, baseSeconds = 0.001, sleep = _ => ()) { sys.error("always") }
    }
  }

  test("monitor evaluation comparisons") {
    import graft.config.MetricSpec
    val specs = Seq(
      MetricSpec("record_count", 10, "GreaterThan", 1),
      MetricSpec("error_count", 0, "GreaterThan", 1))
    val r = QualityChecks.evaluateMonitors(
      Map("record_count" -> 100.0, "error_count" -> 0.0), specs)
    assert(r == Seq((specs.head, true), (specs(1), false)))
  }
}
