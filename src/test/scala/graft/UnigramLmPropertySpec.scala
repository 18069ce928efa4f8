package graft

import graft.operators.UnigramLm

import org.apache.spark.sql.functions._

import scala.util.Random

/** Property checks of the Viterbi segmentation column against a
  * driver-side brute-force reference: over random words and random
  * vocabularies, (1) the pieces always concatenate back to the word
  * (lossless segmentation), and (2) the path cost equals the true
  * optimum over ALL valid segmentations, with the engine's tie-break
  * (longest-final-piece among equal-cost paths) reproduced exactly.
  * Seeded RNG -> deterministic cases.
  */
class UnigramLmPropertySpec extends SparkSpec {
  import spark.implicits._

  private val maxPieceLen = 3

  /** All segmentations of `w` into vocab pieces, as (pieces, cost). */
  private def enumerate(w: String, lp: Map[String, Long]): Seq[(List[String], Long)] =
    if (w.isEmpty) Seq((Nil, 0L))
    else (1 to math.min(maxPieceLen, w.length)).flatMap { l =>
      val (h, t) = (w.substring(0, l), w.substring(l))
      lp.get(h).toSeq.flatMap(c => enumerate(t, lp).map { case (ps, tc) => (h :: ps, tc - c) })
    }

  /** The reference best path: minimal cost; ties resolved the way the
    * fold does — walking BACK from the end, prefer the longer final
    * piece at every suffix (equivalently: min (cost, start-position)
    * at each DP cell). Enumerating lexicographically by reversed
    * piece-length sequence reproduces it.
    */
  private def reference(w: String, lp: Map[String, Long]): Option[(List[String], Long)] = {
    val all = enumerate(w, lp)
    if (all.isEmpty) None
    else {
      import scala.math.Ordering.Implicits._
      val minCost = all.map(_._2).min
      // among min-cost paths: compare piece lengths from the END —
      // longer last piece wins, then longer second-to-last, etc.
      // (no sequence is a prefix of another: lengths sum to |w|)
      Some(all.filter(_._2 == minCost).minBy { case (ps, _) =>
        ps.reverse.map(p => -p.length)
      })
    }
  }

  test("viterbi fold equals brute-force optimum over 300 random (word, vocab) cases") {
    val rnd = new Random(20260814L)
    val alphabet = "abc"
    val cases = (1 to 300).map { i =>
      val w = (1 to (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // random multi pieces over the same alphabet; chars always in
      val multi = (1 to 4).map { _ =>
        val l = 2 + rnd.nextInt(maxPieceLen - 1)
        (1 to l).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct
      val counts = (alphabet.map(_.toString) ++ multi).distinct
        .map(p => (p, 1L + rnd.nextInt(50).toLong))
      (i.toLong, w, counts)
    }
    // one vocab per case would need one plan per case; bucket cases
    // into 10 shared vocabs instead (same coverage, 10 plans)
    val byVocab = cases.groupBy(_._1 % 10)
    byVocab.foreach { case (_, group) =>
      val counts = group.head._3
      val total = counts.map(_._2).sum.toDouble
      val lp = counts.map { case (p, n) =>
        (p, math.floor(1e6 * math.log(n.toDouble / total)).toLong)
      }.toMap
      val vocab = UnigramLm.Vocab(
        counts.map { case (p, n) => (p, n, lp(p)) }, maxPieceLen)
      val words = group.map { case (id, w, _) => (id, w) }.toDF("id", "w")
      val got = UnigramLm.segmentWords(words, "w", vocab)
        .select(col("id"), col("pieces"))
        .as[(Long, Seq[String])].collect().toMap
      group.foreach { case (id, w, _) =>
        val exp = reference(w, lp)
        assert(exp.isDefined, s"case $id '$w': reference found no segmentation")
        assert(got(id).mkString == w, s"case $id: pieces ${got(id)} don't concat to '$w'")
        val expCost = exp.get._2
        val gotCost = got(id).map(p => -lp(p)).sum
        assert(gotCost == expCost,
          s"case $id '$w': fold cost $gotCost != optimum $expCost (${got(id)} vs ${exp.get._1})")
        assert(got(id).toList == exp.get._1,
          s"case $id '$w': tie-break diverged: ${got(id)} vs ${exp.get._1}")
      }
    }
  }
}
