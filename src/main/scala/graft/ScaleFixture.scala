package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic scale-rehearsal fixture generator: writes `documents`
  * and `embeddings` parquet tables shaped like the driver's testdata
  * (TESTDATA.md) at an arbitrary row count, so the dedup/ANN/span
  * operator family can be exercised one order of magnitude above the
  * largest driver scale factor (the round-7 sf1 rehearsal).
  *
  * Everything is hash-derived (seeded xxhash64 per cell — the same
  * no-RNG-state discipline as sampling/LSH), so any two runs produce
  * byte-identical tables. Duplicate structure is planted so the dedup
  * operators do real work at every size:
  *   - 2% of docs are EXACT copies of a doc in the first 1000
  *     (`doc_id % 100 < 2` copies `doc_id % 1000`'s text);
  *   - 2% are NEAR-duplicates of the same base with a 3-token tail
  *     (`doc_id % 100 in [2,3]`);
  *   - everything else is an independent word-soup whose length varies
  *     30..69 tokens.
  *
  * Usage: `runMain graft.ScaleFixture <outDir> <nDocs> <nVecs>`
  * (sf1 rehearsal: 50000 docs / 20000 vecs — 10x the driver's sf0.1).
  */
object ScaleFixture {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleFixture <outDir> <nDocs> <nVecs>")
    val Array(outDir, nDocsS, nVecsS) = args
    val nDocs = nDocsS.toLong
    val nVecs = nVecsS.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir, nDocs, nVecs)
    spark.stop()
  }

  /** Testable core: writes `<outDir>/documents.parquet` and
    * `<outDir>/embeddings.parquet`.
    */
  def write(spark: SparkSession, outDir: String, nDocs: Long, nVecs: Long): Unit = {
    val vocab = array(Seq(
      "spark", "batch", "part", "line", "column", "order", "small", "sort",
      "fast", "value", "scan", "query", "agg", "table", "hash", "stream",
      "filter", "customer", "key", "group", "vector", "slow", "join",
      "merge", "shuffle", "page", "index", "row", "cache", "disk").map(lit): _*)
    val langs = array(Seq("en", "zh", "de", "fr", "es").map(lit): _*)

    // exact/near dups copy a base doc's text; the base is the word
    // soup of `baseId`, a pure function, so no join is needed
    val baseId = when(pmod(col("id"), lit(100)) < 4, pmod(col("id"), lit(1000)))
      .otherwise(col("id"))
    val nTokens = (pmod(xxhash64(lit("len"), baseId), lit(40)) + 30).cast("int")
    val soup = concat_ws(" ",
      transform(sequence(lit(1), nTokens),
        i => element_at(vocab, pmod(xxhash64(baseId, i), lit(30)).cast("int") + 1)))
    val text = when(pmod(col("id"), lit(100)).between(2, 3),
        concat(soup, lit(" near duplicate tail")))
      .otherwise(soup)

    spark.range(nDocs)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col("id").as("doc_id"),
        text.as("text"),
        element_at(langs, pmod(xxhash64(lit("lang"), col("id")), lit(5)).cast("int") + 1).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    spark.range(nVecs)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => (pmod(xxhash64(col("id"), d), lit(2000)).cast("double") / 1000.0 - 1.0)
            .cast("float")).as("embedding"),
        pmod(col("id"), lit(3)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }
}
