package graft

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.AsOfJoin

import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest right row at or before left ts, per key") {
    val left = Seq( // (key, ts, id)
      (1, 100L, "L1"), (1, 200L, "L2"), (2, 50L, "L3"))
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1, 90L, "R1"), (1, 150L, "R2"), (1, 201L, "R3"), (3, 10L, "R4"))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts")
      .select("lid", "right_rid").as[(String, Option[String])].collect().toMap
    assert(out("L1").contains("R1")) // 90 <= 100 < 150
    assert(out("L2").contains("R2")) // 150 <= 200 < 201
    assert(out("L3").isEmpty) // no right rows for key 2
  }

  test("asOf: right row at exactly left ts matches (<= semantics)") {
    val left = Seq((1, 100L, "L")).toDF("k", "ts", "lid")
    val right = Seq((1, 100L, "R")).toDF("k", "ts", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts")
      .select("right_rid").as[Option[String]].collect().head
    assert(out.contains("R"))
  }

  test("asOf forward: earliest right row at or after left ts") {
    val left = Seq((1, 100L, "L1"), (1, 200L, "L2")).toDF("k", "ts", "lid")
    val right = Seq((1, 100L, "R1"), (1, 150L, "R2"), (1, 250L, "R3")).toDF("k", "ts", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts", forward = true)
      .select("lid", "right_rid").as[(String, Option[String])].collect().toMap
    assert(out("L1").contains("R1")) // equal ts matches (>= semantics)
    assert(out("L2").contains("R3")) // 250 is the nearest at-or-after 200
  }

  test("asOf: multi-column payload comes from the SAME right row") {
    val left = Seq((1, 100L, "L")).toDF("k", "ts", "lid")
    val right = Seq(
      (1, 50L, Option("x"), Option.empty[String]), // older: a=x, b=null
      (1, 90L, Option.empty[String], Option("y"))) // newest: a=null, b=y
      .toDF("k", "ts", "a", "b")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts")
      .select("right_a", "right_b").as[(Option[String], Option[String])].collect().head
    // both columns must reflect the ts=90 row, not a null-skipping mix
    assert(out == ((None, Some("y"))))
  }

  test("text: token count, fingerprint, quality are deterministic and sane") {
    val df = Seq(
      (1, "The quick brown fox."),
      (2, "the   QUICK  brown fox."),
      (3, "wordswithoutstops !!!!?!")).toDF("id", "text")
    val got = df.select(
      col("id"),
      TF.tokenCount(col("text")).as("n"),
      TF.fingerprint(col("text")).as("fp"),
      TF.qualityScore(col("text")).as("q")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 4L, 2L))
    // fingerprint is whitespace/case-insensitive: rows 1 and 2 collide
    assert(got(0).getString(2) == got(1).getString(2))
    assert(got(0).getString(2) != got(2).getString(2))
    val q = got.map(_.getDouble(3))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(2), "prose must outscore punctuation soup")
  }

  test("text: subword tokens, 64-bit fingerprint, char shingles") {
    val df = Seq((1, "parseJson fast2x now!")).toDF("id", "text")
    val r = df.select(
      TF.subwordTokenCount(col("text")).as("sub"),
      TF.tokenCount(col("text")).as("words"),
      TF.fingerprint64(col("text")).as("fp64"),
      size(TF.charShingles(col("text"), 5)).as("nsh")).collect().head
    assert(r.getLong(0) > r.getLong(1), "subword count must exceed word count")
    // fingerprint64 collides for case/whitespace variants
    val fp2 = Seq((1, "PARSEJSON  fast2x   now!")).toDF("id", "text")
      .select(TF.fingerprint64(col("text"))).collect().head.getLong(0)
    assert(r.getLong(2) == fp2)
    assert(r.getInt(3) == "parsejson fast2x now!".length - 4)
  }

  test("text: Gopher repetition signals against hand-computed values") {
    // "a bb a bb a" -> words [a,bb,a,bb,a]: 5 words, 2 distinct,
    // mean len 7/5, top word a = 3/5, bigrams [a bb, bb a, a bb, bb a]
    // -> 2 of 4 duplicated
    val df = Seq(
      (1, "a bb A bb a"),
      (2, "one two three four five six seven eight nine ten")).toDF("id", "text")
    val r = df.select(
      col("id"),
      TF.dupWordFraction(TF.tokens(col("text"))).as("dwf"),
      TF.topWordFraction(TF.tokens(col("text"))).as("twf"),
      TF.dupNgramFraction(TF.tokens(col("text")), 2).as("dbf"),
      TF.meanWordLength(TF.tokens(col("text"))).as("mwl"),
      TF.gopherKeep(TF.tokens(col("text"))).as("keep"))
      .collect().map(row => row.getInt(0) -> row).toMap
    assert(r(1).getDouble(1) == 3.0 / 5)
    assert(r(1).getDouble(2) == 3.0 / 5)
    assert(r(1).getDouble(3) == 2.0 / 4)
    assert(r(1).getDouble(4) == 7.0 / 5)
    assert(!r(1).getBoolean(5), "repetitive short-word doc must be dropped")
    assert(r(2).getDouble(1) == 0.0 && r(2).getDouble(3) == 0.0)
    assert(r(2).getDouble(2) == 1.0 / 10)
    assert(r(2).getDouble(4) == 39.0 / 10)
    assert(r(2).getBoolean(5), "clean doc must be kept")
  }

  test("text: max equal run and top n-gram multiplicity") {
    val df = Seq(
      (1, "buy buy buy now now one"),      // run: buy x3; top bigram "buy buy" x2
      (2, "a b a b a b"),                  // no adjacent repeats; "a b" x3
      (3, "solo"),                         // single token
      (4, "")).toDF("id", "text")          // empty -> [""] -> run 1
    val r = df.select(
      col("id"),
      TF.maxEqualRun(TF.tokens(col("text"))).as("run"),
      TF.topNgramCount(TF.tokens(col("text")), 2).as("top2"))
      .collect().map(row => row.getInt(0) -> ((row.getLong(1), row.getLong(2)))).toMap
    assert(r(1) == ((3L, 2L)), s"got ${r(1)}")
    assert(r(2) == ((1L, 3L)), s"got ${r(2)}")
    // < n tokens: ngramsFromTokens falls back to one whole-text shingle
    assert(r(3) == ((1L, 1L)) && r(4) == ((1L, 1L)), s"got ${r(3)} ${r(4)}")
  }

  test("text: langId picks the dominant stopword profile") {
    val df = Seq(
      (1, "the cat sat on the mat and it is happy"),
      (2, "der hund ist nicht auf der couch und das ist gut"),
      (3, "xyzzy qwerty plugh")).toDF("id", "text")
    val got = df.select(col("id"), TF.langId(col("text")).as("lang"))
      .as[(Int, String)].collect().toMap
    assert(got(1) == "en")
    assert(got(2) == "de")
    assert(got(3) == "und")
  }

  test("vector: dot/cosine/l2 against hand-computed values") {
    val df = Seq(
      (1, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
      (2, Seq(1.0f, 2.0f, 2.0f), Seq(1.0f, 2.0f, 2.0f)),
      (3, Seq(3.0f, 4.0f, 0.0f), Seq(6.0f, 8.0f, 0.0f)))
      .toDF("id", "a", "b")
    val got = df.select(
      col("id"),
      VF.dot(col("a"), col("b")).as("dot"),
      VF.cosine(col("a"), col("b")).as("cos"),
      VF.l2Norm(col("a")).as("norm")).collect()
    assert(got(0).getDouble(1) == 0.0 && math.abs(got(0).getDouble(2)) < 1e-12)
    assert(got(1).getDouble(1) == 9.0 && math.abs(got(1).getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(got(2).getDouble(2) - 1.0) < 1e-12 && got(2).getDouble(3) == 5.0)
  }

  test("vector: normalize + meanPool") {
    val df = Seq(
      (1, Seq(3.0f, 4.0f), Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))),
      (2, Seq(0.0f, 0.0f), Seq.empty[Seq[Float]]))
      .toDF("id", "v", "vs")
    val got = df.select(
      col("id"),
      VF.normalize(col("v")).as("unit"),
      VF.meanPool(col("vs")).as("pooled")).orderBy("id").collect()
    val unit = got(0).getSeq[Double](1)
    assert(math.abs(unit(0) - 0.6) < 1e-12 && math.abs(unit(1) - 0.8) < 1e-12)
    assert(got(0).getSeq[Double](2) == Seq(2.0, 3.0))
    assert(got(1).getSeq[Double](1) == Seq(0.0, 0.0)) // zero vector unchanged
    assert(got(1).isNullAt(2)) // empty pool -> null
  }

  test("vector: hyperplane signatures agree for near-identical vectors") {
    val base = (0 until 16).map(i => math.sin(i * 1.7).toFloat)
    val near = base.updated(3, base(3) + 0.001f)
    val far = (0 until 16).map(i => math.cos(i * 3.1).toFloat)
    val df = Seq((1, base, near), (2, base, far)).toDF("id", "a", "b")
    val got = df.select(
      col("id"),
      VF.hammingDistance(
        VF.hyperplaneSignature(col("a"), 32, seed = 7),
        VF.hyperplaneSignature(col("b"), 32, seed = 7)).as("ham")).collect()
    val nearHam = got(0).getInt(1)
    val farHam = got(1).getInt(1)
    assert(nearHam <= 2, s"near-duplicate hamming $nearHam too high")
    assert(farHam > nearHam, "unrelated vector not separated")
  }
}
