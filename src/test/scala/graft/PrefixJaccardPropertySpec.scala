package graft

import graft.operators.TextDedup

import org.apache.spark.sql.functions._

import scala.util.Random

/** Property check of the PPJoin prefix-filter LOSSLESSNESS claim:
  * over seeded-random corpora (skewed vocabularies, duplicate-heavy
  * and sparse regimes, thresholds across the range) the banded
  * result must equal the brute-force all-pairs truth set EXACTLY —
  * the completeness theorem exercised where hand fixtures don't
  * reach: shared rare tokens, shared stop tokens, df ties, size
  * filter boundaries.
  */
class PrefixJaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  private def trigrams(text: String): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (t.size >= 3) t.sliding(3).map(_.mkString(" ")).toSet
    else Set(t.mkString(" "))
  }

  private def truthSet(
      docs: Seq[(Long, String)], tMicro: Long): Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = trigrams(ta); sb = trigrams(tb)
      inter = (sa & sb).size
      jm = if (inter == 0) 0L
           else inter.toLong * 1000000L / (sa.size + sb.size - inter)
      if inter > 0 && jm >= tMicro
    } yield (ia, ib, jm)).toSet

  test("random corpora: banded == brute force at random thresholds") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 6) {
      // skewed vocab: low token ids very common (stop-word analogue)
      val vocabSize = 6 + rnd.nextInt(20)
      def token(): String = {
        val r = rnd.nextDouble()
        val id = if (r < 0.5) rnd.nextInt(3)
                 else rnd.nextInt(vocabSize)
        s"w$id"
      }
      val nDocs = 15 + rnd.nextInt(25)
      val base = (1L to nDocs.toLong).map { i =>
        val len = 3 + rnd.nextInt(12)
        (i, Seq.fill(len)(token()).mkString(" "))
      }
      // duplicate-heavy tail: a few docs are mutations of earlier ones
      val docs = base ++ base.take(5).map { case (i, t) =>
        (i + 1000L, t + " w0 w1")
      }
      val tMicro = Seq(300000L, 500000L, 700000L, 900000L)(rnd.nextInt(4))
      val truth = truthSet(docs, tMicro)
      val got = TextDedup
        .prefixFilteredJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          shingleSize = 3, minJaccardMicro = tMicro)
        .select(col("id_a"), col("id_b"), col("jaccard_micro"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == truth,
        s"trial $trial (t=$tMicro): missing ${truth.diff(got)}, spurious ${got.diff(truth)}")
    }
  }
}
