package graft.tools
object KeyAudit {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("queries: " + q.size + ", oracles: " + o.size)
    println("rows-only: " + (q -- o).toSeq.sorted.mkString(", "))
    println("orphan oracles (BUG if any): " + (o -- q).toSeq.sorted.mkString(", "))
  }
}
