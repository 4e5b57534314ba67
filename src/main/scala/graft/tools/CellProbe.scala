package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: is the locked-centroid training / cell assignment stable
  * across evaluations in one session?
  */
object CellProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val c = graft.ext.SimSearch.trainCentroidsLocked(emb, 16, 2)
    def cellsSet() = graft.ext.SimSearch.clusterAssignWithCentroids(emb, c)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSet
    val c1 = cellsSet(); val c2 = cellsSet()
    println(s"CELLS eval1=${c1.size} eval2=${c2.size} equal=${c1 == c2}")
    val cents1 = c.collect().map(_.toString).sorted
    val cents2 = c.collect().map(_.toString).sorted
    println(s"CENTS equal=${cents1.sameElements(cents2)} n=${cents1.length}")

    val got = graft.ext.SimSearch.nearDupPairsCells(emb, 0.4, c)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cellMap = cellsSet().toMap
    val v = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vm = v.toMap
    println(s"GOT ${got.length} pairs")
    got.foreach { case (ia, ib, s) =>
      val ref = cos(vm(ia), vm(ib))
      println(f"PAIR $ia%4d $ib%4d cells=${cellMap(ia)}/${cellMap(ib)} simEngine=$s%.6f simRef=$ref%.6f")
    }
    spark.stop()
  }
}
