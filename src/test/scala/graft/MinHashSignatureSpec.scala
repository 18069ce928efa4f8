package graft

import graft.operators.TextDedup

import org.apache.spark.sql.functions._

/** The native MinHashSignature expression must be bit-for-bit
  * identical to the HOF (aggregate/zip_with) formulation it replaces,
  * across ordinary shingles and every corner case.
  */
class MinHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def bothForms(shingles: Seq[Seq[String]], numHashes: Int) = {
    val df = shingles.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sh")
    df.select(
      col("id"),
      TextDedup.minhashSignatureFromShingles(col("sh"), numHashes).as("native"),
      TextDedup.minhashSignatureFromShinglesHof(col("sh"), numHashes).as("hof"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Long]]("native").toSeq,
        r.getAs[scala.collection.Seq[Long]]("hof").toSeq))
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
      TextDedup.minhashSignatureFromShingles(col("sh"), 8).as("native"),
      TextDedup.minhashSignatureFromShinglesHof(col("sh"), 8).as("hof"))
      .collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // empty -> the least-identity init, identical in both forms
    assert(byId(1L).getAs[scala.collection.Seq[Long]]("native").toSeq ==
      Seq.fill(8)(Long.MaxValue))
    assert(byId(1L).getAs[scala.collection.Seq[Long]]("native") ==
      byId(1L).getAs[scala.collection.Seq[Long]]("hof"))
    // null element folds as xxhash64(seed-only), same as the HOF
    assert(byId(2L).getAs[scala.collection.Seq[Long]]("native") ==
      byId(2L).getAs[scala.collection.Seq[Long]]("hof"))
    // null array -> null signature in both
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(2))
  }

  test("signatures drive identical LSH candidate pairs on the doc corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "the quick brown fox jumps over the lazy dog by the river!"),
      (3L, "completely unrelated text about catalyst and tungsten internals"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.minhashCandidatePairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("SQL surface: minhash_signature registered and identical") {
    GraftFunctions.registerAll(spark)
    Seq((1L, Seq("a b", "b c"))).toDF("id", "sh").createOrReplaceTempView("mh_in")
    val sql = spark.sql("SELECT minhash_signature(sh, 16) AS sig FROM mh_in")
      .collect().head.getAs[scala.collection.Seq[Long]]("sig").toSeq
    val col16 = Seq((1L, Seq("a b", "b c"))).toDF("id", "sh")
      .select(TextDedup.minhashSignatureFromShingles(col("sh"), 16).as("sig"))
      .collect().head.getAs[scala.collection.Seq[Long]]("sig").toSeq
    assert(sql == col16)
  }
}
