package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off leak attribution: run warm-up + prebuild (the exact prefix of
  * Bench.main), release, and print the lineage of any persisted RDD that
  * survives — localCheckpoint blocks bypass both OpCaches and
  * catalog.clearCache, so the debug string's call sites are the only way
  * to name the owner.
  */
object LeakHunt {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timed = graft.SparkEntry.queries ++ graft.queries.ExtQueries.benchOnly
    def dump(stage: String): Unit = {
      graft.ext.OpCaches.releaseAll()
      val left = spark.sparkContext.getPersistentRDDs
      if (left.nonEmpty) {
        println(s"== $stage: ${left.size} persisted RDD(s) survive ==")
        left.values.foreach { r =>
          println(s"-- id=${r.id} ${r.getStorageLevel.description}")
          println(r.toDebugString)
        }
      } else println(s"== $stage: clean ==")
    }
    only match {
      case Some(names) =>
        names.foreach { n =>
          try timed(n)(spark, d).count()
          catch { case e: Throwable => println(s"$n FAILED: $e") }
          dump(n)
        }
      case None =>
        timed.toSeq.sortBy(_._1).foreach { case (n, fn) =>
          try fn(spark, d).count() catch { case _: Throwable => }
        }
        dump("warmup")
        try graft.queries.ExtQueries.prebuildIndexes(spark, d)
        catch { case e: Throwable => println(s"prebuild FAILED: $e") }
        dump("prebuild")
    }
    spark.stop()
  }
}
