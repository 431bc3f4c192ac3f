package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: break text_bm25_probe's warm cost into stages. */
object Bm25Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
    }
    // warm the index
    graft.queries.ExtQueries.benchOnly("text_bm25_probe")(spark, sfDir).count()
    val postingsPath = System.getProperty("java.io.tmpdir") +
      s"/graft_index/bm25_postings_${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}"
    val terms = Seq("spark", "table", "hash", "join", "merge", "window",
      "sort", "zzz_unseen")
    val buckets = terms.map(graft.ext.TextAnalysis.bm25TermBucket).distinct
    println(s"buckets probed: ${buckets.size}/64")
    time("read pruned postings") {
      spark.read.parquet(postingsPath)
        .where(col("tbucket").isin(buckets: _*)).count()
    }
    time("read + term filter") {
      spark.read.parquet(postingsPath)
        .where(col("tbucket").isin(buckets: _*))
        .where(col("term").isin(terms: _*)).count()
    }
    time("full probe") {
      graft.queries.ExtQueries.benchOnly("text_bm25_probe")(spark, sfDir)
        .count()
    }
    spark.stop()
  }
}
