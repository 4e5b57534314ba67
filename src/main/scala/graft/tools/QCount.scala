package graft.tools
object QCount {
  def main(args: Array[String]): Unit = {
    val q = graft.queries.Registry.queries.keySet
    val o = graft.queries.Registry.oracle.keySet
    println(s"QUERIES=${q.size} ORACLES=${o.size} NO_ORACLE=${(q -- o).toSeq.sorted.mkString(",")}")
  }
}
