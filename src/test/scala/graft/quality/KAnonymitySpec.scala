package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-built group structure for the k-anonymity audit: exact
  * violating-group/row counts and the empty-violation lane (coalesce
  * keeps violating_rows 0, not NULL).
  */
class KAnonymitySpec extends SparkTestBase {
  import spark.implicits._

  test("counts violating groups and rows at k=3") {
    // Groups: A×2 (violates), B×3 (ok), C×1 (violates), D×5 (ok).
    val df = (Seq.fill(2)("A") ++ Seq.fill(3)("B") ++ Seq("C") ++
      Seq.fill(5)("D")).zipWithIndex.toDF("qi", "id")
    val r = QualityChecks.kAnonymity(df, Seq($"qi"), 3).head()
    assert(r.getLong(0) === 2)  // violating_groups: A, C
    assert(r.getLong(1) === 3)  // violating_rows: 2 + 1
    assert(r.getLong(2) === 4)  // n_groups
    assert(r.getLong(3) === 1 && r.getLong(4) === 5)
  }

  test("a k-anonymous table reports zero violations, not NULL") {
    val df = (Seq.fill(3)("A") ++ Seq.fill(4)("B")).zipWithIndex.toDF("qi", "id")
    val r = QualityChecks.kAnonymity(df, Seq($"qi"), 3).head()
    assert(r.getLong(0) === 0 && r.getLong(1) === 0)
    assert(r.getLong(3) === 3)
  }
}
