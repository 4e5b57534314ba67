package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver captures only a ~2,000-char TAIL of stdout and parses the
  * bench JSON out of it. This spec simulates exactly that: render the
  * stdout line for a query population LARGER than any real round (300),
  * truncate the surrounding output to its last 2,000 chars, and require
  * the summary to still parse. Guards the r3/r4/r5 `parsed: null` class
  * of failure at build time instead of judge time.
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def fakeResults(n: Int): Seq[(String, Double, Boolean)] =
    (1 to n).map(i => (f"query_with_a_long_name_$i%03d", i * 0.017, i % 97 != 0))

  test("stdout line fits the driver tail window and parses after truncation") {
    val results = fakeResults(300)
    val (_, stdoutLine) = Bench.renderLines(results, "/root/testdata/sf0.1")
    assert(stdoutLine.length <= Bench.StdoutBudget,
      s"stdout line is ${stdoutLine.length} bytes, budget ${Bench.StdoutBudget}")
    // Simulate the driver: noisy earlier stdout, then our line; keep the tail.
    val stdout = ("x" * 5000) + "\n" + stdoutLine + "\n"
    val tail = stdout.takeRight(2000)
    val parsedLine = tail.linesIterator.toSeq.reverse.find(_.startsWith("{"))
    assert(parsedLine.contains(stdoutLine))
    val node = mapper.readTree(parsedLine.get)
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() > 0)
    assert(node.get("failed").asInt() == results.count(!_._3))
    assert(node.get("queries").size() > 0, "some per-query detail should survive")
    assert(node.get("queries_full").asText() == "bench_last.json")
  }

  test("full line carries every query and parses") {
    val results = fakeResults(120)
    val (fullLine, _) = Bench.renderLines(results, "sfX")
    val node = mapper.readTree(fullLine)
    assert(node.get("queries").size() == 120)
    assert(node.get("metric").asText() == "total")
    val total = results.map(_._2).sum
    assert(math.abs(node.get("value").asDouble() - total) < 1e-3)
  }

  test("mass failure still fits the tail window — failed list is capped") {
    // Worst case: nearly every query failed. The stdout line must stay
    // within budget (the failure count survives; names are capped).
    val results = fakeResults(300).map { case (k, v, _) => (k, v, false) }
    val (_, stdoutLine) = Bench.renderLines(results, "/root/testdata/sf0.1")
    assert(stdoutLine.length <= Bench.StdoutBudget,
      s"mass-failure line is ${stdoutLine.length} bytes")
    val node = mapper.readTree(stdoutLine)
    assert(node.get("failed").asInt() == 300)
    assert(node.get("failed_queries").size() == Bench.MaxStdoutFailures)
    // The file line keeps every name.
    val (fullLine, _) = Bench.renderLines(results, "sfX")
    assert(mapper.readTree(fullLine).get("failed_queries").size() == 300)
  }

  test("stdout queries map keeps the slowest entries") {
    val results = fakeResults(300)
    val (_, stdoutLine) = Bench.renderLines(results, "sfX")
    val q = mapper.readTree(stdoutLine).get("queries")
    // Slowest query (index 300) must be present; fastest (index 1) dropped.
    assert(q.has("query_with_a_long_name_300"))
    assert(!q.has("query_with_a_long_name_001"))
  }

  test("failed canaries are excluded from sum/map and named; warmed flags sweep overlap") {
    val results = fakeResults(10)
    val canary = Seq(
      ("query_with_a_long_name_003", 1.5, true),   // healthy, in sweep
      ("not_in_this_slice", 2.0, true),            // healthy, other slice
      ("broken_canary", 0.01, false))              // failed fast
    val (fullLine, stdoutLine) = Bench.renderLines(results, "sfX", "{}", canary)
    val full = mapper.readTree(fullLine)
    assert(full.get("canary").size() == 2)
    assert(!full.get("canary").has("broken_canary"))
    assert(full.get("canary_failed").size() == 1)
    assert(full.get("canary_failed").get(0).asText() == "broken_canary")
    assert(full.get("warmed").size() == 1)
    assert(full.get("warmed").get(0).asText() == "query_with_a_long_name_003")
    val sd = mapper.readTree(stdoutLine)
    // The failed canary's time-to-failure must NOT leak into the sum.
    assert(math.abs(sd.get("canary_sec").asDouble() - 3.5) < 1e-3)
    assert(sd.get("canary_failed_n").asInt() == 1)
  }

  test("fixture stamp rides the full line; stdout carries the short hash within budget") {
    val stamp = """{"hash":"abc123def456","tables":{""" +
      (1 to 11).map(i => s""""t$i":{"rows":${i * 1000},"bytes":${i * 9999},"md5":"0123456789ab"}""")
        .mkString(",") + "}}"
    val results = fakeResults(300)
    val (fullLine, stdoutLine) = Bench.renderLines(results, "sfX", stamp)
    val full = mapper.readTree(fullLine)
    assert(full.get("fixture").get("hash").asText() == "abc123def456")
    assert(full.get("fixture").get("tables").size() == 11)
    assert(stdoutLine.length <= Bench.StdoutBudget)
    val node = mapper.readTree(stdoutLine)
    assert(node.get("fixture_hash").asText() == "abc123def456")
    assert(!node.has("fixture"), "full stamp must not ride the bounded stdout line")
  }

}
