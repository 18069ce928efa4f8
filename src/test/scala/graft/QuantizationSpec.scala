package graft

import graft.functions.{VectorFunctions => VF}

import org.apache.spark.sql.functions._

/** Int8 quantization must trade ≤~1% cosine error for its 4x memory
  * cut, and must preserve nearest-neighbor ranking well enough to
  * serve as an ANN scan format.
  */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.sources.Tables(spark, "/root/testdata/sf0.01", "embeddings")

  test("quantized cosine tracks exact cosine within 2% everywhere") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        VF.cosine(col("embedding"), col("qv")).as("exact"),
        VF.cosineQuantized(
          VF.quantizeInt8(col("embedding"), VF.quantizeScale(col("embedding"))),
          VF.quantizeInt8(col("qv"), VF.quantizeScale(col("qv")))).as("approx"))
    val maxErr = both.agg(max(abs(col("exact") - col("approx")))).as[Double].collect().head
    assert(maxErr < 0.02, s"max |exact - quantized| = $maxErr")
  }

  test("top-10 neighbors by quantized cosine recall >= 0.8 vs exact") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    def topIds(scoreCol: org.apache.spark.sql.Column): Set[Long] =
      emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), scoreCol.as("s"))
        .orderBy(col("s").desc, col("vec_id"))
        .limit(10).select("vec_id").as[Long].collect().toSet
    val exact = topIds(VF.cosine(col("embedding"), col("qv")))
    val approx = topIds(VF.cosineQuantized(
      VF.quantizeInt8(col("embedding"), VF.quantizeScale(col("embedding"))),
      VF.quantizeInt8(col("qv"), VF.quantizeScale(col("qv")))))
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("quantized values are integers in [-127, 127]; zero vector -> zeros") {
    val rows = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val out = rows
      .select(col("id"), VF.quantizeInt8(col("v"), VF.quantizeScale(col("v"))).as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(64L, -127L, 32L)) // floor(x/scale + 0.5), scale = 1/127
    assert(out(2L) == Seq(0L, 0L, 0L))
    assert(out.values.flatten.forall(q => q >= -127 && q <= 127))
  }
}
