package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** Fixture-identity stamping over the real sf0.001 fixture:
  * deterministic (cache hit on second call), carries per-table rows/
  * bytes/md5, and the short hash round-trips from the JSON.
  */
class FixtureStampSpec extends SparkTestBase {
  private val mapper = new ObjectMapper()

  test("stamps the real fixture deterministically and caches") {
    val a = FixtureStamp.stampJson(spark, sf0001)
    val b = FixtureStamp.stampJson(spark, sf0001)
    assert(a == b)
    val node = mapper.readTree(a)
    assert(node.get("hash").asText().length == 12)
    assert(node.get("tables").get("lineitem").get("rows").asLong() == 6000L)
    assert(node.get("tables").get("documents").get("bytes").asLong() > 0)
    assert(FixtureStamp.shortHash(a) == node.get("hash").asText())
  }
}
