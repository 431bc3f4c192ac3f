package graft.tools
import org.apache.spark.sql.SparkSession
object TimeStreaming {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // diagnostic A/B for the Spark 4.1 checkpoint checksum layer (each
    // state commit writes twin checksum files); production default stays ON
    sys.env.get("SPARK_GRAFT_STREAM_CKSUM").foreach(v =>
      builder.config("spark.sql.streaming.checkpoint.fileChecksum.enabled", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    (1 to reps).foreach { i =>
      val (rows, secs) = graft.StreamingBench.windowedCount(
        spark, "/root/testdata/sf0.1", batches = batches)
      println(f"streaming run $i (batches=$batches): $secs%.2f s, " +
        f"${rows / secs}%.0f rows/s")
    }
    spark.stop()
  }
}
