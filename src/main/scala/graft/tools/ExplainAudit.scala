package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for headline queries — the plan-review loop
  * (pushdown reaching the scan? broadcast where expected? shuffle count?).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing", "q3_revenue", "join_global", "agg_count", "src_stream")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // resolve gate + bench-only names alike (TimeOne convention)
    val all = graft.SparkEntry.queries ++ graft.queries.ExtQueries.benchOnly
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
