package graft

import graft.functions.NormalizeText

import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {

  import spark.implicits._

  test("NFC composes combining sequences; ASCII passes through untouched") {
    val rows = Seq(
      "cafe\u0301",      // e + combining acute -> é
      "u\u0308ber",      // u + combining diaeresis -> ü
      "plain ascii",
      "already café")
      .toDF("t")
      .select(NormalizeText.nfc(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(rows(0) == "caf\u00e9")
    assert(rows(1) == "\u00fcber")
    assert(rows(2) == "plain ascii")
    assert(rows(3) == "already caf\u00e9")
    // composed forms are strictly shorter in codepoints
    assert(rows(0).length == 4 && "cafe\u0301".length == 5)
  }

  test("NFKC folds compatibility forms (ligatures, fullwidth)") {
    val rows = Seq("ﬁle", "ＡＢＣ")
      .toDF("t")
      .select(NormalizeText(col("t"), "NFKC").as("n"))
      .as[String].collect().toSeq
    assert(rows(0) == "file")
    assert(rows(1) == "ABC")
  }

  test("NFD decomposes what NFC composes; null propagates; bad form fails loud") {
    val back = Seq("caf\u00e9").toDF("t")
      .select(NormalizeText(col("t"), "NFD").as("n"))
      .as[String].collect().head
    assert(back == "cafe\u0301")
    val n = Seq[String](null).toDF("t")
      .select(NormalizeText.nfc(col("t")).as("n")).collect().head
    assert(n.isNullAt(0))
    val e = intercept[IllegalArgumentException] { NormalizeText(col("t"), "NFX") }
    assert(e.getMessage.contains("unknown normalization form"))
  }

  test("normalization fuses into whole-stage codegen") {
    val scan = spark.range(16).select(
      NormalizeText.nfc(concat(lit("cafe\u0301 "), col("id").cast("string"))).as("n"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"not codegen'd:\n$plan")
    assert(scan.collect().forall(_.getString(0).startsWith("caf\u00e9")))
  }
}
