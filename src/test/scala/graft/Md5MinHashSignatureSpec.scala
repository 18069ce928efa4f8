package graft

import graft.operators.TextDedup

import org.apache.spark.sql.functions._

/** The native md5-scheme MinHashSignature expression must be
  * bit-for-bit identical to the HOF (aggregate/zip_with) formulation it
  * replaces — the oracle replays exactly those md5-hex semantics in
  * SQL, so ANY divergence here is an oracle break, not a perf issue.
  */
class Md5MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val S = TextDedup.PortableMd5Scheme

  private def bothForms(shingles: Seq[Seq[String]], numHashes: Int) = {
    val df = shingles.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sh")
    df.select(
      col("id"),
      TextDedup.minhashSignatureFromShingles(col("sh"), numHashes, S).as("native"),
      TextDedup.minhashSignatureFromShinglesHof(col("sh"), numHashes, S).as("hof"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[String]]("native").toSeq,
        r.getAs[scala.collection.Seq[String]]("hof").toSeq))
  }

  test("native matches the HOF form bit-for-bit on a varied corpus") {
    val corpus = Seq(
      Seq("the quick", "quick brown", "brown fox"),
      Seq("a"),
      Seq(""), // empty string is a valid shingle
      Seq("x" * 500, "y" * 500), // long shingles
      (1 to 200).map(i => s"shingle $i"), // wide array
      Seq("uniçode", "日本語 テスト")) // multi-byte UTF-8
    bothForms(corpus, 32).foreach { case (id, native, hof) =>
      assert(native == hof, s"row $id diverged")
      assert(native.size == 32)
      native.foreach(h => assert(h.length == 32 && h.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))))
    }
  }

  test("corner semantics: empty array, null element, null array") {
    val df = Seq(
      (1L, Some(Seq[String]())),
      (2L, Some(Seq("a", null, "b"))),
      (3L, None))
      .toDF("id", "sh")
    val rows = df.select(
      col("id"),
      TextDedup.minhashSignatureFromShingles(col("sh"), 8, S).as("native"),
      TextDedup.minhashSignatureFromShinglesHof(col("sh"), 8, S).as("hof"))
      .collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // empty -> the all-"g" least-identity init, identical in both forms
    assert(byId(1L).getAs[scala.collection.Seq[String]]("native").toSeq ==
      Seq.fill(8)("g"))
    assert(byId(1L).getAs[scala.collection.Seq[String]]("native") ==
      byId(1L).getAs[scala.collection.Seq[String]]("hof"))
    // null element contributes nothing (concat -> null, least keeps acc)
    assert(byId(2L).getAs[scala.collection.Seq[String]]("native") ==
      byId(2L).getAs[scala.collection.Seq[String]]("hof"))
    // null array -> null signature in both
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(2))
  }

  test("spark's own md5 agrees with the native per-position minimum") {
    // independent ground truth: recompute position 0 and 7 with
    // spark's md5() + array_min over an exploded shingle set
    val sh = Seq("alpha beta", "beta gamma", "gamma delta")
    val df = sh.toDF("s")
    val expect = (0 until 8).map { i =>
      df.select(md5(concat(lit(s"$i:"), col("s"))).as("h"))
        .agg(min(col("h"))).head.getString(0)
    }
    val native = Seq((1L, sh)).toDF("id", "sh")
      .select(TextDedup.minhashSignatureFromShingles(col("sh"), 8, S).as("sig"))
      .head.getAs[scala.collection.Seq[String]]("sig").toSeq
    assert(native == expect)
  }
}
