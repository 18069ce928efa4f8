package graft

import graft.functions._
import graft.operators.QualityClassifier

import org.apache.spark.sql.{DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The hot-loop custom expressions must participate in whole-stage
  * codegen (a CodegenFallback anywhere in a projection ejects the
  * ENTIRE stage from generated code — a constant factor on the per-row
  * hottest loops of the dedup/ANN/classifier scans), and the generated
  * path must agree bit-for-bit with the interpreted `eval` path.
  *
  * Inputs are derived from `range(1)`'s id column (id=0) rather than
  * literals: a foldable child would be constant-folded at plan time and
  * never reach the generated code this spec exists to exercise.
  */
class ExpressionCodegenSpec extends SparkSpec {
  import spark.implicits._

  private def asCol(e: Expression) = GraftColumnShim.column(e)

  private def idS = col("id").cast("string") // "0" at runtime, not foldable

  /** A projection fused into whole-stage codegen renders with the `*(n)`
    * stage marker; a CodegenFallback projection renders bare.
    */
  private def fused(df: DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"projection not whole-stage-codegen'd:\n$plan")
  }

  test("minhash_signature: codegen'd stage, bit-identical to interpreted eval") {
    val df = spark.range(1)
      .select(array(
        concat(lit("the quick"), idS),
        concat(lit("quick brown"), idS),
        concat(lit("uniçode"), idS)).as("sh"))
      .select(asCol(MinHashSignature(GraftColumnShim.expression(col("sh")), 16)).as("sig"))
    fused(df)
    val fromCodegen = df.collect().head.getAs[scala.collection.Seq[Long]]("sig").toSeq
    val sh = Seq("the quick0", "quick brown0", "uniçode0")
    val interpreted = MinHashSignature(Literal.create(sh, ArrayType(StringType)), 16)
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(fromCodegen == interpreted)
  }

  test("hyperplane_signature: codegen'd stage, bit-identical to interpreted eval") {
    val idF = col("id").cast("float")
    val df = spark.range(1)
      .select(array(
        idF + lit(0.25f), idF - lit(1.5f), idF + lit(0.75f), idF + lit(2.0f),
        idF - lit(0.125f), idF + lit(0.5f), idF - lit(3.0f), idF + lit(1.0f)).as("v"))
      .select(asCol(HyperplaneSignature(GraftColumnShim.expression(col("v")), 32, 41)).as("sig"))
    fused(df)
    val fromCodegen = df.collect().head.getLong(0)
    val vec = Seq(0.25f, -1.5f, 0.75f, 2.0f, -0.125f, 0.5f, -3.0f, 1.0f)
    val interpreted = HyperplaneSignature(Literal.create(vec, ArrayType(FloatType)), 32, 41)
      .eval(null).asInstanceOf[Long]
    assert(fromCodegen == interpreted)
  }

  test("hashed_linear_score: codegen'd stage, bit-identical to interpreted eval") {
    val df = spark.range(1)
      .select(array(
        concat(lit("alpha"), idS), concat(lit("beta"), idS),
        concat(lit("alpha"), idS), idS).as("t"))
      .select(asCol(HashedLinearScore(GraftColumnShim.expression(col("t")),
        QualityClassifier.NumBuckets, QualityClassifier.A, QualityClassifier.C,
        QualityClassifier.M)).as("s"))
    fused(df)
    val fromCodegen = df.collect().head.getLong(0)
    val toks = Seq("alpha0", "beta0", "alpha0", "0")
    val interpreted = HashedLinearScore(Literal.create(toks, ArrayType(StringType)),
      QualityClassifier.NumBuckets, QualityClassifier.A, QualityClassifier.C,
      QualityClassifier.M).eval(null).asInstanceOf[Long]
    assert(fromCodegen == interpreted)
  }

  test("hashed_weight_score: codegen'd stage, bit-identical to interpreted eval") {
    val weights = (0 until 64).map(i => (i - 32) * 0.125)
    val df = spark.range(1)
      .select(array(
        concat(lit("alpha"), idS), concat(lit("beta"), idS),
        concat(lit("alpha"), idS)).as("t"))
      .select(asCol(HashedWeightScore(GraftColumnShim.expression(col("t")), weights)).as("s"))
    fused(df)
    val fromCodegen = df.collect().head.getDouble(0)
    val toks = Seq("alpha0", "beta0", "alpha0")
    val interpreted = HashedWeightScore(Literal.create(toks, ArrayType(StringType)), weights)
      .eval(null).asInstanceOf[Double]
    assert(fromCodegen == interpreted)
  }

  test("array_hit_count: codegen'd stage, bit-identical to interpreted eval") {
    val needles = Seq("alpha0", "gamma0", "zeta0")
    val df = spark.range(1)
      .select(array(
        concat(lit("alpha"), idS), concat(lit("beta"), idS),
        concat(lit("alpha"), idS), concat(lit("zeta"), idS)).as("g"))
      .select(asCol(ArrayHitCount(GraftColumnShim.expression(col("g")), needles)).as("h"))
    fused(df)
    val fromCodegen = df.collect().head.getLong(0)
    val arr = Seq("alpha0", "beta0", "alpha0", "zeta0")
    val interpreted = ArrayHitCount(Literal.create(arr, ArrayType(StringType)), needles)
      .eval(null).asInstanceOf[Long]
    assert(fromCodegen == interpreted)
    assert(fromCodegen == 3L) // alpha0 twice + zeta0; input here is not distinct
  }

  test("lang_id: codegen'd stage, identical to interpreted eval") {
    val base = "  The Quick Brown Fox AND the lazy dog "
    val df = spark.range(1)
      .select(concat(lit(base), idS).as("t"))
      .select(asCol(
        LangIdExpression(GraftColumnShim.expression(col("t")), TextFunctions.LangProfiles))
        .as("lang"))
    fused(df)
    val fromCodegen = df.collect().head.getString(0)
    val interpreted =
      LangIdExpression(Literal(UTF8String.fromString(base + "0"), StringType),
        TextFunctions.LangProfiles).eval(null).asInstanceOf[UTF8String].toString
    assert(fromCodegen == interpreted)
  }

  test("nearest_centroid: codegen'd stage, identical to interpreted eval") {
    val centroids = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
    val idF = col("id").cast("float")
    val df = spark.range(1)
      .select(array(idF + lit(0.1f), idF + lit(0.9f), idF + lit(0.2f)).as("v"))
      .select(asCol(NearestCentroid(GraftColumnShim.expression(col("v")), centroids)).as("c"))
    fused(df)
    val fromCodegen = df.collect().head.getInt(0)
    val interpreted = NearestCentroid(
      Literal.create(Seq(0.1f, 0.9f, 0.2f), ArrayType(FloatType)), centroids)
      .eval(null).asInstanceOf[Int]
    assert(fromCodegen == interpreted)
  }

  test("nearest_centroid_l2: codegen'd stage, identical to interpreted eval") {
    val centroids = Seq(Seq(0L, 0L, 0L), Seq(1000000L, 0L, 0L), Seq(0L, 1000000L, 0L))
    val idL = col("id") // 0 at runtime, not foldable
    val df = spark.range(1)
      .select(array(idL + lit(900000L), idL + lit(100000L), idL - lit(50000L)).as("v"))
      .select(asCol(NearestCentroidL2(GraftColumnShim.expression(col("v")), centroids)).as("c"))
    fused(df)
    val fromCodegen = df.collect().head.getInt(0)
    val interpreted = NearestCentroidL2(
      Literal.create(Seq(900000L, 100000L, -50000L), ArrayType(LongType)), centroids)
      .eval(null).asInstanceOf[Int]
    assert(fromCodegen == interpreted && fromCodegen == 1)
  }

  test("avro_encode/avro_decode: codegen'd stage, bit-identical to interpreted eval") {
    import graft.avro.{AvroDecode, AvroEncode}
    import org.apache.spark.sql.catalyst.InternalRow
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":["null","string"]}]}""".stripMargin
    val st = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val df = spark.range(1)
      .select(struct(col("id").cast("int").as("a"), concat(lit("x"), idS).as("b")).as("r"))
      .select(asCol(AvroEncode(GraftColumnShim.expression(col("r")), schema)).as("bytes"))
      .select(col("bytes"),
        asCol(AvroDecode(GraftColumnShim.expression(col("bytes")), schema, failFast = true)).as("rec"))
    fused(df)
    val row = df.collect().head
    val bytes = row.getAs[Array[Byte]]("bytes")
    val rec = row.getStruct(1)
    assert(rec.getInt(0) == 0 && rec.getString(1) == "x0")
    // interpreted encode produces the same wire bytes…
    val interpretedBytes = AvroEncode(
      Literal(InternalRow(0, UTF8String.fromString("x0")), st), schema)
      .eval(null).asInstanceOf[Array[Byte]]
    assert(bytes.sameElements(interpretedBytes))
    // …and the interpreted decode agrees field-for-field
    val interpreted = AvroDecode(Literal(bytes, BinaryType), schema, failFast = true)
      .eval(null).asInstanceOf[InternalRow]
    assert(interpreted.getInt(0) == 0 && interpreted.getUTF8String(1).toString == "x0")
  }

  test("avro_decode PERMISSIVE: malformed bytes yield null through the codegen path") {
    import graft.avro.AvroDecode
    val schema = """{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}"""
    // 0x83 is a varint with its continuation bit set and no next byte:
    // guaranteed malformed, and the `when` on id keeps it non-foldable
    val df = spark.range(1)
      .select(when(col("id") >= 0, lit(Array[Byte](0x83.toByte))).as("bytes"))
      .select(asCol(
        GraftColumnShim.expression(col("bytes")) match {
          case e => AvroDecode(e, schema, failFast = false)
        }).as("rec"))
    fused(df)
    assert(df.collect().head.isNullAt(0))
  }

  test("bigram_lm_score: codegen'd stage, bit-identical to interpreted eval") {
    val bi = Map(("the", "quick") -> 2L, ("quick", "fox") -> 1L)
    val ctxC = Map("the" -> 3L, "quick" -> 1L)
    val tok = (s: String) => when(col("id") >= 0, lit(s)).otherwise(lit("x"))
    val df = spark.range(1)
      .select(array(tok("the"), tok("quick"), tok("fox"), tok("unseen")).as("toks"))
      .select(asCol(BigramLmScore(GraftColumnShim.expression(col("toks")), bi, ctxC, 5L)).as("s"))
    fused(df)
    val fromCodegen = df.collect().head.getStruct(0)
    val interpreted = BigramLmScore(
        Literal.create(Seq("the", "quick", "fox", "unseen"), ArrayType(StringType)), bi, ctxC, 5L)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(fromCodegen.getLong(0) == interpreted.getLong(0))
    assert(fromCodegen.getDouble(1) == interpreted.getDouble(1))
    assert(fromCodegen.getDouble(2) == interpreted.getDouble(2))
    assert(fromCodegen.getLong(0) == 3L)
  }

  test("backoff_lm_score: codegen'd stage, bit-identical to interpreted eval") {
    val tri = Map(("the", "quick", "fox") -> 1L)
    val bi = Map(("the", "quick") -> 2L, ("quick", "fox") -> 1L)
    val uni = Map("the" -> 3L, "quick" -> 2L, "fox" -> 1L)
    val tok = (s: String) => when(col("id") >= 0, lit(s)).otherwise(lit("x"))
    val df = spark.range(1)
      .select(array(tok("the"), tok("quick"), tok("fox"), tok("unseen")).as("toks"))
      .select(asCol(BackoffLmScore(GraftColumnShim.expression(col("toks")), tri, bi, uni, 6L)).as("s"))
    fused(df)
    val fromCodegen = df.collect().head.getStruct(0)
    val interpreted = BackoffLmScore(
        Literal.create(Seq("the", "quick", "fox", "unseen"), ArrayType(StringType)),
        tri, bi, uni, 6L)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    (0 to 3).foreach(i => assert(fromCodegen.getLong(i) == interpreted.getLong(i)))
    assert(fromCodegen.getDouble(4) == interpreted.getDouble(4))
    // the/quick/fox: uni, big, tri; unseen: double back-off to unigram
    assert((fromCodegen.getLong(1), fromCodegen.getLong(2), fromCodegen.getLong(3)) == ((1L, 1L, 2L)))
  }

  test("null inputs stay null through the codegen path") {
    val df = spark.range(1)
      .select(
        when(col("id") < 0, array(lit("x"))).as("sh"),
        when(col("id") < 0, array(lit(1.0f))).as("v"),
        when(col("id") < 0, lit("x")).as("t"))
      .select(
        asCol(MinHashSignature(GraftColumnShim.expression(col("sh")), 8)).as("a"),
        asCol(HyperplaneSignature(GraftColumnShim.expression(col("v")), 16, 41)).as("b"),
        asCol(LangIdExpression(GraftColumnShim.expression(col("t")), TextFunctions.LangProfiles))
          .as("c"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
