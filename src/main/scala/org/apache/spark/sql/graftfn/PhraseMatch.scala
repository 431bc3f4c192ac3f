// Hosted under org.apache.spark.sql for the same private[sql] plumbing
// access as VectorExpressions. Public face: graft.functions.VectorFunctions
// re-exports live in PhraseFunctions below.
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick automaton (Aho & Corasick 1975) over UTF-16 chars: one
  * linear pass matches ALL phrases simultaneously, versus one scan per
  * phrase for `contains`/`LIKE` chains or catastrophic alternation
  * regexes. Built once per task from the deduped, SORTED phrase list
  * (ids are sort ranks, so id order ≡ lexicographic order and match
  * output needs no re-sort).
  *
  * Matching is plain substring semantics (no word-boundary anchoring) —
  * the caller pads phrases with spaces when token-boundary semantics are
  * wanted, same convention as [[TextAnalysis.langMarkers]].
  */
final class AhoCorasick(rawPhrases: Seq[String]) extends Serializable {
  require(rawPhrases.nonEmpty, "aho-corasick needs at least one phrase")
  require(rawPhrases.forall(_.nonEmpty), "aho-corasick phrases must be non-empty")

  /** Deduped and sorted; match ids index into this. */
  val phrases: Array[String] = rawPhrases.distinct.sorted.toArray

  // Flat trie: per-node char→child map, failure link, and the id of the
  // phrase ENDING at this node (-1 if none). `outLink` chains to the
  // nearest suffix node that ends a phrase, so emitting all matches at a
  // position is O(#matches), not O(depth).
  private val gotoMaps = new scala.collection.mutable.ArrayBuffer[java.util.HashMap[Character, Integer]]
  private var fail: Array[Int] = _
  private var endsPhrase: Array[Int] = _
  private var outLink: Array[Int] = _

  locally {
    val ends = new scala.collection.mutable.ArrayBuffer[Int]
    gotoMaps += new java.util.HashMap[Character, Integer]
    ends += -1
    var pid = 0
    while (pid < phrases.length) {
      val p = phrases(pid)
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        val next = gotoMaps(node).get(c)
        if (next == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]
          ends += -1
          gotoMaps(node).put(c, Integer.valueOf(gotoMaps.length - 1))
          node = gotoMaps.length - 1
        } else node = next.intValue()
        i += 1
      }
      ends(node) = pid
      pid += 1
    }
    val n = gotoMaps.length
    fail = new Array[Int](n)
    endsPhrase = ends.toArray
    outLink = Array.fill(n)(-1)
    // BFS failure links (root's children fail to root)
    val queue = new java.util.ArrayDeque[Integer]
    gotoMaps(0).forEach { (_, child) =>
      fail(child.intValue()) = 0
      queue.add(child)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outLink(u) =
        if (endsPhrase(fail(u)) >= 0) fail(u) else outLink(fail(u))
      gotoMaps(u).forEach { (c, child) =>
        var f = fail(u)
        var hop = gotoMaps(f).get(c)
        while (hop == null && f != 0) {
          f = fail(f)
          hop = gotoMaps(f).get(c)
        }
        fail(child.intValue()) = if (hop == null) 0 else hop.intValue()
        queue.add(child)
      }
    }
  }

  /** Ids (= sort ranks) of every phrase occurring in `s` at least once,
    * ascending. One pass over the text; overlapping and nested matches
    * all count.
    */
  def matchedIds(s: String): Array[Int] = {
    val seen = new Array[Boolean](phrases.length)
    var found = 0
    var node = 0
    var i = 0
    while (i < s.length && found < phrases.length) {
      val c = Character.valueOf(s.charAt(i))
      var next = gotoMaps(node).get(c)
      while (next == null && node != 0) {
        node = fail(node)
        next = gotoMaps(node).get(c)
      }
      node = if (next == null) 0 else next.intValue()
      var emit = if (endsPhrase(node) >= 0) node else outLink(node)
      while (emit >= 0) {
        val pid = endsPhrase(emit)
        if (!seen(pid)) { seen(pid) = true; found += 1 }
        emit = outLink(emit)
      }
      i += 1
    }
    val out = new Array[Int](found)
    var j = 0
    var k = 0
    while (j < seen.length) { if (seen(j)) { out(k) = j; k += 1 }; j += 1 }
    out
  }
}

object PhraseKernels {
  /** Distinct matched phrases, lexicographically sorted (see
    * [[AhoCorasick.matchedIds]] — ids are sort ranks).
    */
  def acDistinctMatches(input: UTF8String, ac: AhoCorasick): ArrayData = {
    val ids = ac.matchedIds(input.toString)
    val out = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) {
      out(i) = UTF8String.fromString(ac.phrases(ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct phrases from a fixed blocklist occurring in the text, sorted —
  * the multi-phrase scrub/filter primitive (bad-word lists, boilerplate
  * banners, spam templates run to 10⁴–10⁵ phrases in production). The
  * automaton rides into generated code as ONE reference object (the
  * [[BpeEncode]] pattern), so at 100 TB this is a single linear pass per
  * document inside whole-stage codegen: no join, no shuffle, no per-row
  * list scan — O(|text| + matches) regardless of phrase count, where a
  * `contains` chain is O(|text| × phrases).
  */
case class MultiPhraseHits(child: Expression, phraseList: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(phraseList.nonEmpty, "multi_phrase_hits needs a non-empty phrase list")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_phrase_hits"

  @transient private lazy val automaton: AhoCorasick = new AhoCorasick(phraseList)

  override def nullSafeEval(input: Any): Any =
    PhraseKernels.acDistinctMatches(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftfn.PhraseKernels" +
        s".acDistinctMatches($c, $acRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseFunctions {
  /** Column face of [[MultiPhraseHits]]. */
  def multi_phrase_hits(text: Column, phrases: Seq[String]): Column =
    ExpressionUtils.column(MultiPhraseHits(ExpressionUtils.expression(text), phrases))
}
