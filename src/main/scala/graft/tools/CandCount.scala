package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling of the dedup pipeline stages (dev tool). */
object CandCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val shDf = docs.select(col("doc_id").as("id"),
                           graft.ext.Dedup.shingles(col("text"), 3).as("sh"))
    t("shingles count")(println("  " + shDf.count()))
    val numHashes = 16
    val sig = shDf.select(col("id"), explode(col("sh")).as("s"))
      .groupBy("id")
      .agg(min(xxhash64(col("s"), lit(0))).as("m0"),
           (1 until numHashes).map(i =>
             min(xxhash64(col("s"), lit(i))).as(s"m$i")): _*)
      .select(col("id"),
              array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    t("signatures")(println("  " + sig.count()))
    val banded = sig.select(col("id"),
      posexplode(array((0 until 4).map { b =>
        xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * 4 + 1, 4), x => x.cast("string"))),
          lit(b))
      }: _*))).withColumnRenamed("col", "band_key")
    t("banded")(println("  " + banded.count()))
    val cached = banded.select("band_key", "id").persist()
    t("banded cached")(println("  " + cached.count()))
    val l = cached.select(col("band_key"), col("id").as("id_a"))
    val r = cached.select(col("band_key"), col("id").as("id_b"))
    val candJoin = l.join(r, Seq("band_key")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    t("cand via self-join (cached)")(println("  " + candJoin.count()))
    val candBp = cached.groupBy("band_key")
      .agg(array_sort(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
                  y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select("p.id_a", "p.id_b").distinct()
    t("cand via bucketPairs (cached)")(println("  " + candBp.count()))
    val candP = candJoin.persist()
    candP.count()
    val ver = candP
      .join(shDf.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shDf.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .where(col("jaccard") >= 0.7)
    t("verify (cand cached)")(println("  " + ver.count()))
    spark.stop()
  }
}
