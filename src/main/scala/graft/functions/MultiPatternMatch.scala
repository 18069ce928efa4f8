package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern substring counting (Aho & Corasick
  * 1975) as a native expression — blocklist/safety filtering at
  * corpus scale: a naive `OR` of `contains`/regex alternations scans
  * the text once PER PATTERN (O(len x patterns) — ruinous at
  * thousands of blocklist entries), while the AC automaton scans each
  * document exactly once regardless of pattern count, reporting every
  * (overlapping) occurrence. The automaton is built once per executor
  * from the closure-shipped pattern list (transient lazy — the
  * ArrayHitCount convention, but for SUBSTRING semantics where
  * token-set membership cannot see matches crossing token
  * boundaries).
  *
  * Matching is case-sensitive over exactly the bytes given — callers
  * wanting case-folding pass `lower(trim(col))`, which keeps the
  * semantics replayable (the `text_blocklist` oracle counts the same
  * overlapping occurrences by position enumeration).
  *
  * Returns `struct(hits, patterns_hit)`: total occurrence count and
  * how many distinct patterns matched at least once.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  override def dataType: DataType = StructType(Seq(
    StructField("hits", LongType, nullable = false),
    StructField("patterns_hit", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_pattern_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"multi_pattern_count requires a string input, got ${other.catalogString}")
  }

  @transient private lazy val automaton = new MultiPatternCount.AhoCorasick(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    countOf(input.asInstanceOf[UTF8String])

  /** public: called from generated code via an expression reference */
  def countOf(text: UTF8String): InternalRow = {
    val (hits, distinct) = automaton.count(text.toString)
    val row = new GenericInternalRow(2)
    row.update(0, hits)
    row.update(1, distinct)
    row
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("multiPatternExpr", this, classOf[MultiPatternCount].getName)
    defineCodeGen(ctx, ev, c => s"$self.countOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {

  def apply(c: Column, patterns: Seq[String]): Column =
    GraftColumnShim.column(
      MultiPatternCount(GraftColumnShim.expression(c), patterns))

  /** Classic goto/fail automaton. Built once per executor; `count`
    * walks the text once, following fail links on mismatch and
    * reporting the (pre-flattened) output set at each node — every
    * overlapping occurrence of every pattern, O(len + matches).
    */
  private[graft] final class AhoCorasick(patterns: Array[String]) extends Serializable {

    // trie over characters; node 0 is the root
    private val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // build trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var v = 0
      p.foreach { ch =>
        v = if (gotoMaps(v).containsKey(ch)) gotoMaps(v).get(ch)
        else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          ends += List.empty[Int]
          val n = gotoMaps.length - 1
          gotoMaps(v).put(ch, n)
          n
        }
      }
      ends(v) = pi :: ends(v)
    }
    private val fail = new Array[Int](gotoMaps.length)
    // outputs flattened through fail chains during the BFS
    private val out: Array[List[Int]] = {
      val o = ends.toArray
      val queue = new java.util.ArrayDeque[Int]()
      gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue.add(v); () })
      while (!queue.isEmpty) {
        val v = queue.poll()
        o(v) = o(v) ++ o(fail(v))
        gotoMaps(v).forEach { (ch, u) =>
          var f = fail(v)
          while (f != 0 && !gotoMaps(f).containsKey(ch)) f = fail(f)
          fail(u) = if (gotoMaps(f).containsKey(ch) && gotoMaps(f).get(ch) != u)
            gotoMaps(f).get(ch) else 0
          queue.add(u)
          ()
        }
      }
      o
    }

    /** (total overlapping occurrences, distinct patterns hit) */
    def count(text: String): (Long, Int) = {
      var hits = 0L
      val seen = new Array[Boolean](patterns.length)
      var v = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (v != 0 && !gotoMaps(v).containsKey(ch)) v = fail(v)
        if (gotoMaps(v).containsKey(ch)) v = gotoMaps(v).get(ch)
        var os = out(v)
        while (os.nonEmpty) {
          hits += 1L
          seen(os.head) = true
          os = os.tail
        }
        i += 1
      }
      (hits, seen.count(identity))
    }
  }
}
