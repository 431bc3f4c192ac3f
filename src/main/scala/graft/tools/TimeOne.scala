package graft.tools
import org.apache.spark.sql.SparkSession

/** Time a single registered query N times (dev tool). Looks up gate
  * queries and bench-only variants; fixture dir from SPARK_GRAFT_SF_DIR.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries ++ graft.queries.ExtQueries.benchOnly
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // mirror Bench's per-rep release: operator-internal persists
      // self-register in OpCaches; without releaseAll() they accumulate
      // across reps (MEMORY_AND_DISK pressure inflates later reps) and
      // the numbers stop being comparable to bench rows
      graft.ext.OpCaches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
