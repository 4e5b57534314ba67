package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private def load(name: String, env: Map[String, String] = Map.empty,
      secrets: Map[String, String] = Map.empty): SourceConfig = {
    val url = getClass.getClassLoader.getResource(s"configs/$name.yaml")
    ConfigLoader.fromFile(url.getPath,
      TemplateResolver.fromMaps(secrets = secrets, env = sys.env ++ env))
  }

  test("orders_basic parses: mapping order, transforms, destination, warehouse") {
    val cfg = load("orders_basic", env = Map("GRAFT_TEST_OUT" -> "/tmp/graft_test"))
    assert(cfg.name == "orders_basic")
    assert(cfg.sourceType == SourceType.File)
    assert(cfg.schedule.contains("rate(1 hour)")) // O8: top-level schedule
    assert(cfg.schema.mapping.map(_._1) ==
      Seq("orderKey", "custKey", "status", "totalPrice", "orderDate", "priority"))
    assert(cfg.schema.mapping.head._2 == MappingTarget.Path("o_orderkey"))
    assert(cfg.schema.required == Seq("orderKey", "custKey"))
    assert(cfg.schema.transformations.map(_.kind) ==
      Seq("double", "trim", "regexp_replace", "bogus_type"))
    assert(cfg.schema.transformations(2).pattern.contains("^[0-9]-"))
    val proc = cfg.destination.processed.get
    assert(proc.path == "/tmp/graft_test/orders_processed")
    assert(proc.partitionBy == Seq("year", "month", "day"))
    val wh = cfg.warehouse.get
    assert(wh.distkey.contains("custKey") && wh.sortkey == Seq("orderDate"))
    assert(cfg.qualityChecks.map(_.kind) == Seq("not_null", "unique"))
    assert(cfg.monitoring.metrics.head == MetricSpec("record_count", 10.0, "GreaterThan", 1))
  }

  test("stream section and max_errors parse from YAML") {
    val cfg = ConfigLoader.fromYaml(
      """source:
        |  name: s1
        |  type: stream
        |  schema:
        |    type: json
        |    max_errors: 7
        |  stream:
        |    format: kafka
        |    brokers: broker1:9092
        |    topic: events
        |    landing_path: /tmp/schema_sample
        |    watermark_column: event_ts
        |    watermark_delay: 5 minutes
        |    window_duration: 10 minutes
        |    dedup_keys: [event_id]
        |    checkpoint_dir: /tmp/ckpt
        |    max_files_per_trigger: 7
        |""".stripMargin)
    assert(cfg.sourceType == SourceType.Stream)
    assert(cfg.schema.maxErrors.contains(7))
    val st = cfg.stream.get
    assert(st.format == "kafka" && st.brokers == "broker1:9092" && st.topic == "events")
    assert(st.watermarkColumn == "event_ts" && st.watermarkDelay == "5 minutes")
    assert(st.windowDuration.contains("10 minutes"))
    assert(st.dedupKeys == Seq("event_id") && st.maxFilesPerTrigger == 7)
  }

  test("customers_nested parses: struct-valued targets and dotted paths") {
    val cfg = load("customers_nested",
      env = Map("GRAFT_TEST_OUT" -> "/tmp/x", "GRAFT_STUB_ENDPOINT" -> "http://localhost:1"),
      secrets = Map("customer_api_key" -> "sk-123"))
    val m = cfg.schema.mapping.toMap
    assert(m("customerCity") == MappingTarget.Path("address.city"))
    assert(m("customerAddress") == MappingTarget.Struct(Seq(
      "street" -> MappingTarget.Path("address.street"),
      "city" -> MappingTarget.Path("address.city"),
      "zip" -> MappingTarget.Path("address.zipcode"))))
    val api = cfg.api.get
    assert(api.headers("Authorization") == "sk-123") // ${SECRET:} resolved
    assert(api.pagination.get.style == "offset")
    assert(api.pagination.get.maxPages == 10)
    assert(api.retry.attempts == 3)
    val regex = cfg.qualityChecks.find(_.kind == "regex").get
    assert(regex.columns == Seq("customerEmail"))
    assert(regex.pattern.get.startsWith("^[a-zA-Z0-9._%+-]+@"))
  }

  test("template resolver: ENV/SECRET/BUCKET, recursion, unknown kind, missing name") {
    val r = TemplateResolver.fromMaps(
      secrets = Map("key" -> "s3cr3t"),
      buckets = Map("raw" -> "s3://raw-bucket"),
      env = Map("STAGE" -> "prod"))
    assert(r.resolve("${BUCKET:raw}/data/${ENV:STAGE}/x") == "s3://raw-bucket/data/prod/x")
    assert(r.resolve("Bearer ${SECRET:key}") == "Bearer s3cr3t")
    assert(r.resolve("no templates") == "no templates")
    intercept[NoSuchElementException](r.resolve("${ENV:MISSING_VAR_XYZ}"))
    intercept[IllegalArgumentException](r.resolve("${NOPE:x}"))
  }

  test("registry: lookup by name, missing name fails") {
    val dir = getClass.getClassLoader.getResource("configs").getPath
    val reg = ConfigLoader.registry(dir,
      TemplateResolver.fromMaps(env = sys.env ++ Map(
        "GRAFT_TEST_OUT" -> "/tmp/x", "GRAFT_STUB_ENDPOINT" -> "http://x"),
        secrets = Map("customer_api_key" -> "k")))
    assert(reg("orders_basic").name == "orders_basic")
    intercept[NoSuchElementException](reg("does_not_exist"))
  }

  test("source type parsing") {
    assert(SourceType.parse("rest_api") == SourceType.RestApi)
    assert(SourceType.parse("EMAIL") == SourceType.Email)
    assert(SourceType.parse("kafka") == SourceType.Stream)
    intercept[IllegalArgumentException](SourceType.parse("carrier_pigeon"))
  }
}
