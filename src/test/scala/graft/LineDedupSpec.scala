package graft

import graft.operators.LineDedup

import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "HEADER\nalpha beta\nFOOTER"),
    (2L, "HEADER\ngamma delta\nFOOTER"),
    (3L, "HEADER\nepsilon\nHEADER\nFOOTER"), // repeated line inside one doc
    (4L, "HEADER\nFOOTER"),                  // nothing but boilerplate
    (5L, "unique only")
  ).toDF("doc_id", "text")

  test("lineStats counts distinct docs and total occurrences") {
    val full = LineDedup.lineStats(docs)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(full("HEADER") == ((4L, 5L))) // doc 3 has it twice
    assert(full("FOOTER") == ((4L, 4L)))
    assert(full("alpha beta") == ((1L, 1L)))
    assert(full.size == 6)
  }

  test("removeFrequentLines deletes >=minDocs lines, keeps order, empties survive") {
    val out = LineDedup.removeFrequentLines(docs, minDocs = 3L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out(0)._2 == "alpha beta" && out(0)._3 == 2L && out(0)._4 == 1L)
    assert(out(2)._2 == "epsilon" && out(2)._3 == 3L) // both HEADER copies removed
    assert(out(3)._2 == "" && out(3)._3 == 2L && out(3)._4 == 0L)
    assert(out(4)._2 == "unique only" && out(4)._3 == 0L)
  }

  test("hashed and string line keys produce identical output") {
    val a = LineDedup.removeFrequentLines(docs, minDocs = 3L, hashedKeys = true)
      .orderBy("doc_id").collect().toSeq
    val b = LineDedup.removeFrequentLines(docs, minDocs = 3L, hashedKeys = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("multi-line reconstruction preserves interior order") {
    val doc = Seq((9L, "BP\nz last\nBP\na first\nBP\nm mid\nBP")).toDF("doc_id", "text")
    val corpus = doc.union(Seq((10L, "BP"), (11L, "BP")).toDF("doc_id", "text"))
    val out = LineDedup.removeFrequentLines(corpus, minDocs = 3L)
      .filter(col("doc_id") === 9L)
      .as[(Long, String, Long, Long)].collect().head
    assert(out._2 == "z last\na first\nm mid")
    assert(out._3 == 4L && out._4 == 3L)
  }
}
