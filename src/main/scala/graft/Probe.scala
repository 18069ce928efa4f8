package graft

import graft.functions.TextFunctions
import graft.operators.TextDedup
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the LSH pipeline (not part of the driver
  * contract). Run: `sbt "runMain graft.Probe [sfDir]"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val d = Tables(spark, sfDir, "documents").select("doc_id", "text", "lang", "source", "n_chars")
    val mutated = d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val docs = d.unionByName(mutated)

    val spread = docs.repartition(32)
    val tokenized = spread.select(col("doc_id").as("id"),
      TextFunctions.tokens(col("text")).as("toks")).persist()
    time("tokenized")(tokenized.count())
    val shingled = tokenized.select(col("id"),
      array_distinct(TextFunctions.ngramsFromTokens(col("toks"), 3)).as("sh")).persist()
    time("shingled")(shingled.count())
    println("avg shingles: " + shingled.select(avg(size(col("sh")))).collect().head.getDouble(0))

    val sigs = shingled.select(col("id"),
      array((0 until 32).map(i => array_min(transform(col("sh"), s => xxhash64(lit(i), s)))): _*).as("sig"))
      .persist()
    time("sigs")(sigs.count())

    val banded = sigs.select(col("id"),
      posexplode(array((0 until 8).map(b => xxhash64(slice(col("sig"), b * 4 + 1, 4))): _*))
        .as(Seq("band", "band_hash")))
    time("banded")(banded.count())

    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val joined = a.join(b, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
    time("bucket join pairs")(println("  raw pairs: " + joined.count()))
    val cands = joined.select("id_a", "id_b").distinct().persist()
    time("distinct candidates")(println("  cands: " + cands.count()))

    val withSigs = cands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"), TextDedup.estimatedJaccard(col("sig_a"), col("sig_b")).as("est"))
      .filter(col("est") >= 0.5)
    time("verify + threshold")(println("  final: " + withSigs.count()))
    spark.stop()
  }
}
