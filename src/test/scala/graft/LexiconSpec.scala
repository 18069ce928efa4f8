package graft

import graft.operators.Lexicon

import org.apache.spark.sql.functions.col

class LexiconSpec extends SparkSpec {
  import spark.implicits._

  // corpus counts: apple 3, banana 3, cherry 2, durian 1, fig 1
  private lazy val docs = Seq(
    (1L, "apple banana cherry cherry"),
    (2L, "apple banana banana durian"),
    (3L, "apple fig")).toDF("doc_id", "text")

  test("buildVocab: frequency order with token tie-break, bounded size") {
    assert(Lexicon.buildVocab(docs, "text", 2) == Seq("apple", "banana"))
    assert(Lexicon.buildVocab(docs, "text", 4) ==
      Seq("apple", "banana", "cherry", "durian"))
  }

  test("oovStats: per-occurrence OOV counts against the vocab set") {
    val r = Lexicon.oovStats(docs, "doc_id", "text", Seq("apple", "banana"))
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 4L, 2L, 0.5)), s"got ${r(1L)}") // cherry x2
    assert(r(2L) == ((2L, 4L, 1L, 0.25)), s"got ${r(2L)}") // durian
    assert(r(3L) == ((3L, 2L, 1L, 0.5)), s"got ${r(3L)}") // fig
    // empty text tokenizes to [""], which is OOV — never a zero divisor
    val empty = Lexicon.oovStats(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("apple")).as[(Long, Long, Long, Double)].head()
    assert(empty == ((9L, 1L, 1L, 1.0)), s"got $empty")
  }

  test("tfIdfTopTerms: distinctive terms outrank ubiquitous ones; grid score exact") {
    val top1 = Lexicon.tfIdfTopTerms(docs, "doc_id", "text", topK = 1)
      .as[(Long, String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // apple is in every doc (idf floor 1.0); the doc-heavy rare term wins
    assert(top1(1L)._2 == "cherry" && top1(2L)._2 == "banana" && top1(3L)._2 == "fig")
    // cherry: tf=2, df=1, idfQ = floor(ln(4/2)*1e6)+1e6 = 1693147
    assert(top1(1L) == ((1L, "cherry", 2L, 1L, 3.3863)), s"got ${top1(1L)}")
    // every doc yields exactly topK rows when it has >= topK terms
    val all = Lexicon.tfIdfTopTerms(docs, "doc_id", "text", topK = 2)
    assert(all.groupBy("id").count().as[(Long, Long)].collect().forall(_._2 == 2L))
  }

  test("bpePairStats: hand-computed pair counts, weighted by word frequency") {
    // "aa ab aa" + "b": pairs from aa(x2): "aa","a</w>"x2; ab: "ab","b</w>"; b: "b</w>"
    val tiny = Seq((1L, "aa ab aa"), (2L, "b")).toDF("doc_id", "text")
    val stats = Lexicon.bpePairStats(tiny, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(stats.toMap == Map("aa" -> 2L, "a</w>" -> 2L, "ab" -> 1L, "b</w>" -> 2L))
    // ranking: count desc, pair asc
    assert(stats.map(_._1) == Seq("a</w>", "aa", "b</w>", "ab"))
  }

  test("bpePairStats: single-char words contribute only their boundary pair") {
    val tiny = Seq((1L, "x x y")).toDF("doc_id", "text")
    val stats = Lexicon.bpePairStats(tiny, "text", topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("x</w>" -> 2L, "y</w>" -> 1L))
  }

  test("bpeTrain: hand-traced merges with the </w>-before-letters tie rule") {
    // "aa"x2 + "ab": iter1 pairs (a,a)=2, (a,</w>)=2, (a,b)=1, (b,</w>)=1;
    // tie at 2 breaks on y: '</w>' < 'a' byte-wise -> merge (a, </w>)
    val tiny = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = Lexicon.bpeTrain(tiny, "text", nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges(0) == ((1, "a", "</w>", 2L)))
    // after merge 1: 'aa' is (a)(a</w>), so (a, a</w>) leads with 2
    assert(merges(1) == ((2, "a", "a</w>", 2L)))
  }

  test("bpeTrain + bpeSegment: greedy left-to-right merge on runs") {
    // "aaaa": (a,a) appears 3 times overlapping; greedy BPE merges
    // non-overlapping left-to-right -> (aa)(aa)
    val tiny = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val merges = Lexicon.bpeTrain(tiny, "text", nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges(0) == ((1, "a", "a", 3L)), s"got $merges")
    assert(merges(1) == ((2, "aa", "</w>", 1L)), s"got $merges")
    val seg = tiny
      .select(Lexicon.bpeSegment(col("text"), merges.map(m => (m._2, m._3))).as("s"))
      .head().getSeq[Seq[String]](0)
    assert(seg == Seq(Seq("aa", "aa</w>")), s"got $seg")
  }

  test("bpeSegment with no merges yields bracketless character symbols") {
    val seg = Seq((1L, "hi")).toDF("doc_id", "text")
      .select(Lexicon.bpeSegment(col("text"), Nil).as("s"))
      .head().getSeq[Seq[String]](0)
    assert(seg == Seq(Seq("h", "i", "</w>")))
  }

  test("collocations: PMI ranks the always-together pair above the frequent pair") {
    // "x y" always co-occur (every occurrence of each is in the pair);
    // "a b" co-occur but a and b also appear apart -> lower PMI
    val corpus = Seq(
      (1L, "x y a b"), (2L, "x y b a"), (3L, "x y a c"),
      (4L, "a d"), (5L, "b d"), (6L, "x y")).toDF("doc_id", "text")
    val got = Lexicon.collocations(corpus, "text", minCount = 2L, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.head._1 == "x y", s"got $got")
    assert(got.head._2 == 4L)
    // every returned pair meets the count floor
    assert(got.forall(_._2 >= 2L))
  }

  test("collocations: single-token docs contribute no bigrams") {
    val corpus = Seq((1L, "solo"), (2L, "solo"), (3L, "p q"), (4L, "p q")).toDF("doc_id", "text")
    val got = Lexicon.collocations(corpus, "text", minCount = 1L, topK = 10)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("p q"), s"got $got")
  }

  test("zipfSlope: an exact power law fits its own exponent") {
    // counts c(r) = floor(1000 * r^-1) for ranks 1..8 -> slope ~ -1
    val words = (1 to 8).flatMap { r =>
      val c = (1000.0 / r).toInt
      Seq.fill(c)(s"w$r")
    }
    val corpus = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = Lexicon.zipfSlope(corpus, "text", topR = 8).head()
    assert(row.getLong(0) == 8L)
    val slope = row.getDouble(1)
    assert(slope > -1.01 && slope < -0.99, s"slope $slope")
  }

  test("zipfSlope: uniform counts have slope 0") {
    val corpus = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val row = Lexicon.zipfSlope(corpus, "text", topR = 4).head()
    assert(row.getDouble(1) == 0.0)
  }
}
