package graft

import graft.functions.{BloomFilter, CountMinSketch, HistogramSketch, HyperLogLog}
import graft.operators.SketchStore

import org.apache.spark.sql.functions._

/** Parquet round-trip + in-plan absorb for every mergeable sketch:
  * absorb(load(save(base)), increment) must equal the whole-corpus
  * sketch ELEMENT FOR ELEMENT — the merges are the aggregates' own
  * partial-combine folds, so equality is exact, and any lost/reordered
  * element in the round trip breaks it.
  */
class SketchStoreSpec extends SparkSpec {

  import spark.implicits._

  test("save/load/absorb == whole-corpus sketch for all four kinds") {
    val df = spark.range(4000).select(
      col("id"),
      concat(lit("t"), (col("id") % 700)).as("term"),
      ((col("id") * 13) % 97).cast("double").as("x"))
    val base = df.filter(col("id") % 2 === 0)
    val inc = df.filter(col("id") % 2 =!= 0)
    def sk(d: org.apache.spark.sql.DataFrame, sfx: String) = d.agg(
      HyperLogLog.sketch(col("term")).as("hll" + sfx),
      BloomFilter.sketch(col("term"), 4096, 5).as("bloom" + sfx),
      CountMinSketch.sketch(col("term"), 4, 64).as("cms" + sfx),
      HistogramSketch.sketch(col("x"), 10, 0.0, 100.0).as("hist" + sfx))

    val path = tmpDir("sketch-store")
    SketchStore.save(sk(base, ""), path)
    val merged = SketchStore.load(spark, path)
      .crossJoin(broadcast(sk(inc, "_i")))
      .select(
        HyperLogLog.union(col("hll"), col("hll_i")).as("hll_m"),
        BloomFilter.union(col("bloom"), col("bloom_i")).as("bloom_m"),
        CountMinSketch.merge(col("cms"), col("cms_i")).as("cms_m"),
        HistogramSketch.merge(col("hist"), col("hist_i")).as("hist_m"))
      .collect().head
    val whole = sk(df, "").collect().head
    assert(merged.getSeq[Int](0) == whole.getSeq[Int](0), "hll")
    assert(merged.getSeq[Long](1) == whole.getSeq[Long](1), "bloom")
    assert(merged.getSeq[Long](2) == whole.getSeq[Long](2), "cms")
    assert(merged.getSeq[Long](3) == whole.getSeq[Long](3), "hist")
  }
}
