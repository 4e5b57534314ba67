package graft.queries

import graft.SparkTestBase

/** The second triangle geometry (`triangle_topk`): values are
  * oracle-gated; this spec pins the SCALE properties — the global
  * edge cap plans as a TakeOrderedAndProject (per-partition top-K +
  * merge, never a full sort) and the wedge closure stays equi-join
  * (no cartesian anywhere).
  */
class TriangleSpec extends SparkTestBase {

  test("triangle_topk: top-K edges via TakeOrderedAndProject, no cartesian, non-empty") {
    val df = ScaleOps.triangleTopK(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global edge cap must be a bounded top-K, not a full sort:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "wedge closure must stay equi-join")
    assert(df.count() > 0, "the geometry exists to be non-vacuous")
  }

  test("triangle_topk triangles all close within the capped edge set") {
    import spark.implicits._
    val edges = ScaleOps.minePairs(
        graft.Tables.t(spark, sf0001, "lineitem"), "l_orderkey", "l_partkey",
        fixedFloor = 2, floorFrac = None)
      .orderBy($"support".desc, $"part_a".asc, $"part_b".asc)
      .limit(ScaleOps.TriangleTopEdges)
      .select($"part_a", $"part_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tris = ScaleOps.triangleTopK(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tris.nonEmpty)
    tris.foreach { case (a, b, c) =>
      assert(a < b && b < c, s"canonical orientation violated: ($a,$b,$c)")
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)),
        s"non-edge in triangle ($a,$b,$c)")
    }
    assert(tris.distinct.length == tris.length, "each triangle enumerates once")
  }
}
