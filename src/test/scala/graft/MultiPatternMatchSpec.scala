package graft

import graft.functions.MultiPatternCount

import org.apache.spark.sql.functions._

class MultiPatternMatchSpec extends SparkSpec {

  import spark.implicits._

  private def countOf(text: String, pats: Seq[String]): (Long, Int) = {
    val r = Seq(text).toDF("t")
      .select(MultiPatternCount(col("t"), pats).as("m"))
      .select(col("m.hits"), col("m.patterns_hit"))
      .collect().head
    (r.getLong(0), r.getInt(1))
  }

  test("overlapping occurrences all count, within and across patterns") {
    // "aa" occurs at positions 1,2 in "aaa" (overlapping)
    assert(countOf("aaa", Seq("aa")) == ((2L, 1)))
    // "he" inside "she"; "she" and "he" both end at the same position
    assert(countOf("she said he did", Seq("she", "he", "hers")) == ((3L, 2)))
    // patterns sharing prefixes
    assert(countOf("fast table fast tab", Seq("fast table", "fast tab")) == ((3L, 2)))
  }

  test("no match, empty text, and null propagate sanely") {
    assert(countOf("nothing here", Seq("zzz")) == ((0L, 0)))
    assert(countOf("", Seq("zzz")) == ((0L, 0)))
    val n = Seq[String](null).toDF("t")
      .select(MultiPatternCount(col("t"), Seq("x")).as("m")).collect().head
    assert(n.isNullAt(0))
  }

  test("brute-force differential on pseudo-random texts") {
    val pats = Seq("ab", "aba", "ba", "aab")
    def brute(t: String): (Long, Int) = {
      val counts = pats.map(p =>
        (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)))
      (counts.map(_.toLong).sum, counts.count(_ > 0))
    }
    val texts = (0 until 60).map { s =>
      val chars = "ab"
      (0 until 20).map(i => chars(((s * 31 + i * 7) % 13) % 2)).mkString
    }
    texts.foreach { t =>
      assert(countOf(t, pats) == brute(t), s"text=$t")
    }
  }

  test("automaton pass fuses into whole-stage codegen") {
    val scan = spark.range(32).select(
      MultiPatternCount(
        concat(lit("slow fast table "), col("id").cast("string")),
        Seq("fast table", "slow")).getField("hits").as("h"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
    assert(scan.agg(sum(col("h"))).collect().head.getLong(0) == 64L)
  }
}
