package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SnDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm")(docs.count())
    val pairs = graft.ext.Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text", 3)
    time("pairs count")(println(pairs.count()))
    val scored = pairs.select(col("id_a"), col("id_b"),
      graft.ext.Dedup.editSimilarity(col("key_a"), col("key_b")).as("sim"))
      .where(col("sim") >= 0.9)
    time("scored count")(println(scored.count()))
    graft.ext.OpCaches.releaseAll()
    spark.stop()
  }
}
