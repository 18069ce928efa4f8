package graft

import org.apache.spark.sql.functions._

/** The round-9 natives resolve through the SQL registry and agree
  * with their Column-API forms (the U3 registration contract).
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("sign_bits / hamming_words / normalize_text / multi_pattern_count via SQL") {
    GraftFunctions.registerAll(spark)
    Seq((1L, Seq(0.5f, -1.0f, 2.0f), "café", "slow slow fast"))
      .toDF("id", "vec", "txt", "body")
      .createOrReplaceTempView("sql_surface_in")
    val row = spark.sql(
      """SELECT sign_bits(vec) AS sb,
        |       hamming_words(sign_bits(vec), array(0L)) AS hw,
        |       normalize_text(txt, 'NFC') AS nt,
        |       multi_pattern_count(body, array('slow', 'fast')).hits AS hits
        |FROM sql_surface_in""".stripMargin).collect().head
    assert(row.getSeq[Long](0) == Seq(5L)) // bits 0 and 2 set
    assert(row.getLong(1) == 2L)
    assert(row.getString(2) == "café")
    assert(row.getLong(3) == 3L)
    spark.catalog.dropTempView("sql_surface_in")
  }

  test("bloom_agg + bloom_contains and hist_sketch via SQL") {
    GraftFunctions.registerAll(spark)
    spark.range(100).select(concat(lit("v"), col("id")).as("v"),
        (col("id") % 10).cast("double").as("x"))
      .createOrReplaceTempView("sql_sketch_in")
    val bloomHits = spark.sql(
      """WITH b AS (SELECT bloom_agg(v, 4096, 5) AS words FROM sql_sketch_in)
        |SELECT count(*) FROM sql_sketch_in, b
        |WHERE bloom_contains(b.words, v, 4096, 5)""".stripMargin)
      .collect().head.getLong(0)
    assert(bloomHits == 100L) // zero false negatives
    val counters = spark.sql(
      "SELECT hist_sketch(x, 10, 0.0, 10.0) FROM sql_sketch_in")
      .collect().head.getSeq[Long](0)
    assert(counters.sum == 100L && counters(1) == 10L)
    spark.catalog.dropTempView("sql_sketch_in")
  }

  test("scrub_lines via SQL") {
    GraftFunctions.registerAll(spark)
    Seq(Tuple1("keep\nBOILER\nalso keep")).toDF("t")
      .createOrReplaceTempView("sql_scrub_in")
    val r = spark.sql(
      """SELECT scrub_lines(t, array('BOILER'), '\n').text AS clean,
        |       scrub_lines(t, array('BOILER'), '\n').removed_lines AS rem
        |FROM sql_scrub_in""".stripMargin).collect().head
    assert(r.getString(0) == "keep\nalso keep")
    assert(r.getLong(1) == 1L)
    spark.catalog.dropTempView("sql_scrub_in")
  }

  test("word_ngrams / char_shingles via SQL match the Column forms") {
    GraftFunctions.registerAll(spark)
    Seq(Tuple1("the quick brown fox")).toDF("t")
      .createOrReplaceTempView("sql_grams_in")
    val r = spark.sql(
      """SELECT word_ngrams(split(lower(trim(t)), '\\s+'), 2) AS wg,
        |       char_shingles(regexp_replace(lower(trim(t)), '\\s+', ' '), 5) AS cs
        |FROM sql_grams_in""".stripMargin).collect().head
    val exp = Seq(Tuple1("the quick brown fox")).toDF("t")
      .select(
        graft.functions.TextFunctions.ngramsFromTokens(
          graft.functions.TextFunctions.tokens(col("t")), 2).as("wg"),
        graft.functions.TextFunctions.charShingles(col("t"), 5).as("cs"))
      .collect().head
    assert(r.getSeq[String](0) == exp.getSeq[String](0))
    assert(r.getSeq[String](1) == exp.getSeq[String](1))
    assert(r.getSeq[String](0).head == "the quick")
    spark.catalog.dropTempView("sql_grams_in")
  }

  test("decimal_cosine via SQL matches the Column form bit for bit") {
    GraftFunctions.registerAll(spark)
    Seq((Seq(0.5f, -1.25f, 2.0f), Seq(1.0f, 0.75f, -0.5f)))
      .toDF("a", "b").createOrReplaceTempView("sql_cos_in")
    val r = spark.sql("SELECT decimal_cosine(a, b) AS c FROM sql_cos_in")
      .head().getDouble(0)
    val e = Seq((Seq(0.5f, -1.25f, 2.0f), Seq(1.0f, 0.75f, -0.5f)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosineDecimal(col("a"), col("b")))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(r)
      == java.lang.Double.doubleToRawLongBits(e))
    spark.catalog.dropTempView("sql_cos_in")
  }
}
