package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tables.landOnce: build-once guard semantics incl. the failure-retry
  * contract (a failed build must not poison the path for the JVM).
  */
class TablesSpec extends AnyFunSuite {

  test("landOnce builds once, retries after failure, then stays built") {
    val key = s"tables-spec-${System.identityHashCode(this)}"
    var calls = 0
    intercept[RuntimeException] {
      Tables.landOnce(key) { calls += 1; throw new RuntimeException("boom") }
    }
    assert(calls == 1)
    Tables.landOnce(key) { calls += 1 } // retry succeeds
    assert(calls == 2)
    Tables.landOnce(key) { calls += 1 } // already built: no-op
    assert(calls == 2)
  }
}
