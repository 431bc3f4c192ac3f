package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** Dev profiling harness: time each quality-battery kernel separately on
  * the adversarial 10 MB doc + nasties-style corpus (the AdversarialTextSpec
  * battery ran ~186 s solo on the r13 box — find the hot kernel).
  */
object BatteryProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tenMb: String = {
      val unit = ("word " * 200) + "bob@example.com 4111111111111111 " +
        "日本語テキスト 🚀🧪 " + ("x" * 800) + "\n"
      val reps = (10 * 1024 * 1024) / unit.getBytes("UTF-8").length + 1
      unit * reps
    }
    val nasties: Seq[(Long, String)] = Seq(
      7L -> ("1" * 5000),
      8L -> ("4111111111111111 " * 300),
      13L -> ("word." * 3000),
      15L -> ("🚀" * 20000),
      18L -> tenMb)
    def corpus = nasties.toDF("doc_id", "text")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def t(name: String)(c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val g0 = gcMs
      corpus.select(col("doc_id"), c.as("v")).collect()
      // process CPU time is steal-immune: the honest kernel cost on this box
      println(f"$name%-16s wall ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%8.2f s  " +
        f"gc ${(gcMs - g0) / 1e3}%8.2f s")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      t("langId")(TextAnalysis.langId(col("text")))
      t("tokenCount")(TextAnalysis.tokenCount(col("text")))
      t("c4Rules")(TextAnalysis.c4Rules(col("text")).getField("keep"))
      t("gopherRules")(TextAnalysis.gopherRules(col("text")).getField("keep"))
      t("repetition")(TextAnalysis.repetitionRatio(col("text")))
      t("compression")(TextAnalysis.compressionRatio(col("text")))
    }
    spark.stop()
  }
}
