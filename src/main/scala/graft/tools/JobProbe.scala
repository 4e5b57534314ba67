package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe: run named queries and report scheduler-level shape —
  * jobs, stages, tasks, shuffle bytes read/written, input bytes — via
  * a SparkListener. A query with many jobs is driver-sequenced; a
  * query whose shuffle bytes dwarf its input needs §2.3 (shuffle fewer
  * bytes); a query with thousands of tasks at fixture scale has a
  * partitioning constant wrong.
  * Usage: runMain graft.tools.JobProbe <sfDir> <name>...
  */
object JobProbe {
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufR = new AtomicLong(0)
    val shufW = new AtomicLong(0)
    val input = new AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0)
      shufR.set(0); shufW.set(0); input.set(0)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain before reading
      Thread.sleep(300)
      def mb(v: Long): String = f"${v / 1e6}%8.1f"
      println(f"JOBS $name%-24s $sec%6.2f s  jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d  in=${mb(input.get)}MB shufW=${mb(shufW.get)}MB shufR=${mb(shufR.get)}MB rows=$n")
    }
    spark.stop()
  }
}
