package graft

import graft.operators.TextDedup

import org.apache.spark.sql.functions._

/** [[TextDedup.prefixFilteredJaccardPairs]] — the PPJoin-style
  * LOSSLESS similarity join: result == all-pairs truth (completeness
  * is the prefix-filter theorem, checked here by brute force), exact
  * integer Jaccard, and the prefix actually prunes the index.
  */
class PrefixJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def trigrams(text: String): Set[String] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    if (t.size >= 3) t.sliding(3).map(_.mkString(" ")).toSet
    else Set(t.mkString(" "))
  }

  private val docs = (1L to 40L).map { i =>
    val base = s"alpha bravo charlie delta echo fox$i golf$i hotel$i india$i juliet$i"
    (i, if (i % 4 == 0) s"alpha bravo charlie delta echo fox${i - 1} golf${i - 1} hotel${i - 1} india${i - 1} juliet${i - 1} extra tail"
        else base)
  }

  test("pairs equal the brute-force truth set with exact micro-Jaccard") {
    val t = 500000L
    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = trigrams(ta); sb = trigrams(tb)
      inter = (sa & sb).size
      jm = inter.toLong * 1000000L / (sa.size + sb.size - inter)
      if inter > 0 && jm >= t
    } yield (ia, ib, jm)).toSet
    val got = TextDedup
      .prefixFilteredJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleSize = 3, minJaccardMicro = t)
      .select(col("id_a"), col("id_b"), col("jaccard_micro"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == truth, s"diff: ${got.diff(truth)} / ${truth.diff(got)}")
    assert(truth.nonEmpty, "fixture produced no true pairs")
  }

  test("a higher threshold shortens prefixes and the result stays lossless") {
    val t = 800000L
    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = trigrams(ta); sb = trigrams(tb)
      inter = (sa & sb).size
      jm = inter.toLong * 1000000L / (sa.size + sb.size - inter)
      if inter > 0 && jm >= t
    } yield (ia, ib, jm)).toSet
    val got = TextDedup
      .prefixFilteredJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleSize = 3, minJaccardMicro = t)
      .select(col("id_a"), col("id_b"), col("jaccard_micro"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == truth)
  }

  test("identical documents pair at exactly 1e6; disjoint ones never pair") {
    val d = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val got = TextDedup
      .prefixFilteredJaccardPairs(d, "doc_id", "text", shingleSize = 3,
        minJaccardMicro = 100000L)
      .select(col("id_a"), col("id_b"), col("jaccard_micro"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1000000L)))
  }

  test("short documents fall back to the whole-text gram consistently") {
    val d = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other thing"))
      .toDF("doc_id", "text")
    val got = TextDedup
      .prefixFilteredJaccardPairs(d, "doc_id", "text", shingleSize = 3,
        minJaccardMicro = 500000L)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }
}
