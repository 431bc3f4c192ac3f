package graft.examples

import graft.ast._
import graft.ast.dsl._
import graft.compile.{Compiler, ParquetEnv}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's flagship example — wordcount (`README.md:59-73`) — plus
  * the anomaly-detection shape (`examples/ksml/examples/anomaly_detection
  * .clj:29-43`: re-key → group → windowed count → filter), run in batch mode
  * over the driver fixtures. Usage: sbt "runMain graft.examples.WordCount
  * [sfDir]".
  */
object WordCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val env = new ParquetEnv(spark, sfDir)

    // wordcount: stream → flatMapValues(tokenize) → groupBy(word) → count
    val wc =
      stream(Seq("documents"), Consumed(keys = Seq("doc_id")))
        .flatMapValues(split(lower(col("text")), " "), as = "word")
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .count(as = "n")

    val wcDf = Compiler.compile(wc, env).df
    println("=== wordcount: top 10 words ===")
    wcDf.orderBy(col("n").desc, col("word")).show(10, false)

    // anomaly shape: events → filter → group-by-key → windowed count
    val anomalies =
      stream(Seq("events"), Consumed(keys = Seq("user_id"), eventTime = Some("ts")))
        .filter(col("event_type") === "click")
        .groupByKey
        .windowedBy(WindowSpec.Tumbling("1 hour"))
        .count(as = "clicks")
        .toStream
        .filter(col("clicks") > 3)

    val anomDf = Compiler.compile(anomalies, env).df
    println("=== anomalous users (>3 clicks/hour): sample ===")
    anomDf.orderBy(col("clicks").desc, col("user_id"), col("window_start")).show(10, false)
    println(s"wordcount rows=${wcDf.count()} anomaly rows=${anomDf.count()}")
    spark.stop()
  }
}
