package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftfn._

/** Cluster-wide installation point for the library's native functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Every session built with the extension resolves the graftfn expressions
  * by name in SQL (`SELECT simhash60(text) FROM corpus`), without the
  * per-session `VectorFunctions.register` call (which remains for
  * already-built sessions). Builders mirror register() exactly; both are
  * spec-checked equivalent to the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int = e.eval().asInstanceOf[Int]

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "simhash60" -> (es => SimHash60(es(0))),
    "char_ngrams" -> (es => CharNgrams(es(0), intArg(es(1)))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1)))),
    "word_shingle_hashes" -> (es => WordShingleHashes(es(0), intArg(es(1)))),
    "sorted_jaccard" -> (es => SortedJaccard(es(0), es(1))),
    "minhash_lanes" -> (es => MinHashLanes(es(0), intArg(es(1)))),
    "word_bigram_hashes" -> (es => WordBigramHashes(es(0))),
    "winnow_fingerprint" -> (es =>
      WinnowFingerprint(es(0), intArg(es(1)), intArg(es(2)))),
    "ordered_pairs" -> (es => OrderedPairs(es(0)))
  )

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("org.apache.spark.sql.graftfn", name),
        builder))
    }
}
