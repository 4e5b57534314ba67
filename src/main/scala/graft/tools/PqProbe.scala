package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: PQ raw-ADC agreement of first-K vs trained codebooks on
  * the clustered fixture, by iteration count.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    val df = spark.range(1000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (when(j === pmod(col("id"), lit(8)).cast("int") * 8, 1.0).otherwise(0.0) +
          (pmod(xxhash64(col("id") * dim + j.cast("long")), lit(1000L))
            .cast("double") / 1000.0 - 0.5) * 0.2)
          .cast("float")).as("embedding")).cache()
    val brute = graft.ext.SimSearch.bruteTopK(df, 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def agree(m: Map[Long, Long]): Int = brute.count { case (q, c) => m.get(q).contains(c) }
    val fk = graft.ext.SimSearch.pqTopK(df, 100, dim, shortlist = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"PQPROBE firstK=${agree(fk)}")
    for (it <- Seq(0, 1, 3)) {
      val tr = graft.ext.SimSearch.pqTopKTrained(df, 100, dim, shortlist = 1, iters = it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"PQPROBE trained(iters=$it)=${agree(tr)}")
    }
    spark.stop()
  }
}
