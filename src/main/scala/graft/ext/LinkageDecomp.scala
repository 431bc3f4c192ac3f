package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level decomposition of `ds_record_linkage_multi` (VERDICT r8
  * #3: the solo wall-time floor drifted across rounds without a
  * stage-attributed explanation). Rebuilds the gate's exact fixture and
  * times each phase of [[Dedup.recordLinkageMultiPass]] cumulatively —
  * side encode, key-blocking pairs, sorted-neighborhood pairs, candidate
  * dedup, scoring — so the end-to-end number equals the sum of marginal
  * costs plus the terminal action. Lives in graft.ext for access to the
  * package-private sorted-neighborhood face.
  */
object LinkageDecomp {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs: DataFrame =
      spark.read.parquet(s"$d/documents.parquet")
    def recs: DataFrame = {
      val dd = docs
      def side(rid: org.apache.spark.sql.Column,
               name: org.apache.spark.sql.Column) = dd.select(rid.as("rid"),
        name.as("name"), col("lang"), col("source"),
        pmod(col("doc_id"), lit(7)).as("grp"))
      side(col("doc_id"), col("text")).union(
        side(col("doc_id") + 1000000,
          concat(col("text"), lit(" zzvariant"))))
    }
    for (r <- 1 to reps) {
      println(s"=== rep $r ===")
      // 0. raw fixture scan
      val (_, tScan) = time(recs.count())
      println(f"0 fixture scan+union         $tScan%6.2f s")
      // 1. side encode (shingle-hash arrays) + persist materialize
      val side = OpCaches.register(recs.select(col("rid").as("id"),
          col("lang"), col("source"),
          graft.functions.VectorFunctions
            .word_shingle_hashes(col("name"), 1).as("fz0"),
          col("grp").as("ex0"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val (_, tSide) = time(side.count())
      println(f"1 side encode+persist        $tSide%6.2f s")
      // 2. key-blocking pairs
      val kb = Dedup.bucketPairs(
        side.select(col("id"), col("lang"), col("source"))
          .where(col("lang").isNotNull && col("source").isNotNull),
        Seq("lang", "source")).select(col("id_a"), col("id_b"))
      val (nKb, tKb) = time(kb.count())
      println(f"2 key-blocking pairs         $tKb%6.2f s ($nKb rows)")
      // 3. sorted-neighborhood pairs (sort + zipWithIndex + rank join)
      val sn = Dedup.sortedNeighborhoodIdPairs(
        recs.select(col("rid"), col("name")), "rid", "name", 2)
      val (nSn, tSn) = time(sn.count())
      println(f"3 sorted-neighborhood pairs  $tSn%6.2f s ($nSn rows)")
      // 4. candidate union + normalize + distinct
      val cand = kb.union(sn.toDF("id_a", "id_b"))
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .where(col("id_a") =!= col("id_b"))
        .distinct()
      val (nC, tC) = time(cand.count())
      println(f"4 cand dedup (marginal)      $tC%6.2f s ($nC rows)")
      // 5. scoring join + threshold
      def renamed(suffix: String) = side.select(
        col("id").as(s"id$suffix"), col("fz0").as(s"fz0$suffix"),
        col("ex0").as(s"ex0$suffix"))
      val scored = cand.join(renamed("_a"), Seq("id_a"))
        .join(renamed("_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.VectorFunctions.sorted_jaccard(
            col("fz0_a"), col("fz0_b")) * 0.75 +
            when(col("ex0_a") <=> col("ex0_b"), 0.25).otherwise(0.0), 6)
            .as("score"))
        .where(col("score") >= 0.8)
      val (nS, tS) = time(scored.count())
      println(f"5 score+filter (marginal)    $tS%6.2f s ($nS rows)")
      OpCaches.releaseAll()
      // end-to-end reference: the gate's own plan, fresh
      val (nE, tE) = time(
        Dedup.recordLinkageMultiPass(recs, "rid",
          Seq(Dedup.KeyBlocking(Seq("lang", "source")),
            Dedup.NeighborhoodBlocking("name", windowSize = 2)),
          fuzzyFields = Seq("name" -> 0.75),
          exactFields = Seq("grp" -> 0.25), threshold = 0.8).count())
      OpCaches.releaseAll()
      println(f"E end-to-end gate plan       $tE%6.2f s ($nE rows)")
    }
    spark.stop()
  }
}
