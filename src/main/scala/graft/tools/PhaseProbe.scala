package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: split a query's wall time into PLAN (analysis +
  * optimization + physical planning, forced via `executedPlan`) and
  * EXEC (the jobs). A query whose cost is mostly PLAN needs a smaller
  * tree (fewer self-joins of an expensive subtree, simpler
  * expressions), not a better shuffle shape.
  * Usage: runMain graft.tools.PhaseProbe <sfDir> <name>...
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").join(
      spark.read.parquet(s"$sfDir/nation.parquet")).count()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis→physical planning
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"PHASE $name%-24s build=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f s  rows=$n")
    }
    spark.stop()
  }
}
