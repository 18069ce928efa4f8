package graft

import graft.operators.SuffixArray

import org.apache.spark.sql.functions._

/** Prefix-doubling suffix array + binary-descent LCP vs a brute-force
  * in-memory reference (sort the actual token suffixes, compare
  * elementwise) on hand-built and randomized corpora.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  /** Reference: (doc, pos, rank) by sorting real suffixes; ties by
    * (doc, pos). Token-sequence lexicographic order, shorter prefix
    * first.
    */
  private def refSa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val suff = for {
      (id, text) <- docs
      toks = text.trim.toLowerCase.split("\\s+").toSeq
      p <- 1 to toks.length
    } yield (id, p.toLong, toks.drop(p - 1))
    implicit val ord: Ordering[Seq[String]] = (a, b) => {
      val c = a.zip(b).iterator.map { case (x, y) => x.compare(y) }.find(_ != 0)
      c.getOrElse(a.length.compare(b.length))
    }
    suff.sortBy { case (id, p, s) => (s, id, p) }(
      Ordering.Tuple3(ord, Ordering.Long, Ordering.Long))
      .zipWithIndex.map { case ((id, p, _), i) => (id, p, i + 1L) }
  }

  private def refLcp(a: Seq[String], b: Seq[String]): Long =
    a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong

  test("suffix ranks equal brute-force suffix sorting on a planted corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the hat"),
      (3L, "a cat"),
      (4L, "the cat sat on the mat")) // doc 4 identical to doc 1
    val ix = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text")
    val got = ix.sa.as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val want = refSa(docs).sortBy(r => (r._1, r._2))
    assert(got == want, s"got=$got\nwant=$want")
    ix.unpersist()
  }

  test("differential vs brute force on a random small-alphabet corpus") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 12L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(20))("abc" (rnd.nextInt(3)).toString).mkString(" "))
    }
    val ix = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text")
    val got = ix.sa.as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == refSa(docs).sortBy(r => (r._1, r._2)), "ranks diverged from brute force")
    // LCP differential over every adjacent pair
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val bySa = refSa(docs).sortBy(_._3)
    val wantLcp = bySa.sliding(2).collect { case Seq((da, pa, _), (db, pb, _)) =>
      (da, pa, db, pb) ->
        refLcp(toks(da).drop(pa.toInt - 1), toks(db).drop(pb.toInt - 1))
    }.toMap
    val gotLcp = SuffixArray.adjacentLcp(ix)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    assert(gotLcp == wantLcp, s"lcp diverged")
    ix.unpersist()
  }

  test("repeatedSpans finds a planted shared passage at its full length") {
    val boiler = "subscribe to our newsletter for updates"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"delta $boiler epsilon zeta"),
      (3L, "entirely unrelated words here"))
    val ix = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text")
    val spans = SuffixArray.repeatedSpans(ix, minLen = 6)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the 6-token boilerplate must surface as a cross-doc adjacent pair
    assert(spans.exists { case (da, _, db, _, l) =>
      Set(da, db) == Set(1L, 2L) && l == 6L
    }, s"planted passage missed: $spans")
    // no pair claims more than the passage plus its longest shared
    // extension (docs share nothing else)
    assert(spans.forall(_._5 <= 6L), s"overlong span: $spans")
    ix.unpersist()
  }

  test("identical suffixes rank adjacently with doc/pos tie-break and clamped lcp") {
    val docs = Seq((7L, "x y z"), (9L, "x y z"))
    val ix = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text")
    val sa = ix.sa.orderBy(col("sa_rank")).as[(Long, Long, Long)].collect().toSeq
    // equal suffixes: lower doc_id first
    val xs = sa.filter(_._2 == 1L)
    assert(xs.map(_._1) == Seq(7L, 9L))
    val lcp = SuffixArray.adjacentLcp(ix).as[(Long, Long, Long, Long, Long)]
      .collect().map(r => ((r._1, r._2, r._3, r._4), r._5)).toMap
    // the two full-doc suffixes are identical: lcp exactly 3, not the
    // doubling overshoot
    assert(lcp(((7L, 1L, 9L, 1L))) == 3L, s"clamp failed: $lcp")
    ix.unpersist()
  }

  test("removeRepeatedSpans keep-one: canonical occurrence survives, every other drops") {
    // the 6-token passage repeats in docs 1, 2 and twice in doc 5;
    // canonical = minimal (doc_id, pos) = doc 1
    val boiler = "one two three four five six"
    val docs = Seq(
      (1L, s"alpha $boiler beta"),
      (2L, s"$boiler gamma delta"),
      (5L, s"$boiler epsilon $boiler"),
      (9L, "nothing shared here at all whatsoever"))
    val ix = SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text")
    val got = SuffixArray.removeRepeatedSpans(ix, minLen = 6, keepCanonical = true)
      .orderBy(col("id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 0L, s"alpha $boiler beta"),
      (2L, 8L, 6L, "gamma delta"),
      (5L, 13L, 12L, "epsilon"),
      (9L, 6L, 0L, "nothing shared here at all whatsoever")), s"got $got")
    ix.unpersist()
  }

  test("removeRepeatedSpans remove-all == TextDedup.removeDupSpans at k = minLen") {
    val boiler = "subscribe to our newsletter for updates now"
    val base = Seq(
      (1L, s"$boiler unique tail for document one with extra words"),
      (2L, s"completely different content here $boiler"),
      (3L, "no repeated material in this document at all plainly"),
      (4L, s"$boiler and then some more $boiler"),
      (5L, "short one"))
    val df = base.toDF("doc_id", "text")
    val ix = SuffixArray.build(df, "doc_id", "text")
    val viaSuffix = SuffixArray.removeRepeatedSpans(ix, minLen = 5, keepCanonical = false)
      .orderBy(col("id")).as[(Long, Long, Long, String)].collect().toSeq
    val viaGrams = graft.operators.TextDedup
      .removeDupSpans(df, "doc_id", "text", k = 5, minOccurrences = 2)
      .orderBy(col("id")).as[(Long, Long, Long, String)].collect().toSeq
    assert(viaSuffix == viaGrams,
      s"suffix path diverged from gram path:\n$viaSuffix\n$viaGrams")
    // and the differential is not vacuous: something was removed
    assert(viaSuffix.exists(_._3 > 0))
    ix.unpersist()
  }

  test("empty corpus and single-token docs degrade gracefully") {
    val ix = SuffixArray.build(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text")
    assert(ix.sa.count() == 0)
    val one = SuffixArray.build(Seq((1L, "solo"), (2L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(one.sa.count() == 2)
    assert(SuffixArray.adjacentLcp(one).as[(Long, Long, Long, Long, Long)]
      .collect().toSeq.map(_._5) == Seq(1L))
    ix.unpersist(); one.unpersist()
  }
}
