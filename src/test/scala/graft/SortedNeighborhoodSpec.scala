package graft

import graft.operators.SortedNeighborhood

import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  test("prefix-sharing near-dups land adjacent and clear the exact Jaccard gate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi tail"),
      (3L, "alpha different words entirely here nothing shared beyond the bucket token"),
      (4L, "omega psi chi phi upsilon tau sigma rho pi omicron")
    ).toDF("doc_id", "text")
    val pairs = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    val (_, _, inter, uni) = pairs.head
    assert(inter == 14L && uni == 15L) // 14 shared tokens, "tail" extra
  }

  test("window distance limits comparisons: 3 same-key docs, window 2") {
    // identical keys -> sort by id; window 2 compares only adjacent
    val base = "common prefix tokens here for sorting purposes only"
    val docs = Seq(
      (1L, base + " one"), (2L, base + " one"), (3L, base + " one")
    ).toDF("doc_id", "text")
    val w2 = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text", windowSize = 2)
      .as[(Long, Long, Long, Long)].collect().map(p => (p._1, p._2)).sorted.toSeq
    assert(w2 == Seq((1L, 2L), (2L, 3L))) // 1-3 is 2 apart: missed at w=2
    val w3 = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text", windowSize = 3)
      .as[(Long, Long, Long, Long)].collect().map(p => (p._1, p._2)).sorted.toSeq
    assert(w3 == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("bucket partitioning: different first tokens never compare") {
    val docs = Seq(
      (1L, "aaa shared rest of text here exactly the same"),
      (2L, "bbb shared rest of text here exactly the same")
    ).toDF("doc_id", "text")
    val pairs = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text")
    assert(pairs.count() == 0L)
  }

  test("threshold is an exact integer rational: 4/5 boundary included") {
    // 4 shared of 5 union = exactly 0.8 -> kept; 3 of 5 -> dropped
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d e"),   // inter 4, uni 5 -> keep
      (3L, "a b c x y")    // vs 2: inter 3, uni 7 -> drop; vs 1: inter 3, uni 6 -> drop
    ).toDF("doc_id", "text")
    val pairs = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text", windowSize = 3)
      .as[(Long, Long, Long, Long)].collect().map(p => (p._1, p._2)).toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("no global single-partition window: plan partitions by bucket") {
    val docs = Seq((1L, "x y z"), (2L, "q r s")).toDF("doc_id", "text")
    val plan = SortedNeighborhood.nearDupPairs(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__bucket"), plan)
  }

  test("edit verify: exact distance within threshold, -1 band excluded") {
    val docs = Seq(
      (1L, "shared prefix tokens keep these adjacent in the sort order"),
      (2L, "shared prefix tokens keep these adjacent in the sort ordEr"), // 1 edit
      (3L, "shared prefix tokens keep these adjacent in the sort order plus a very long unrelated tail far beyond any threshold")
    ).toDF("doc_id", "text")
    val pairs = SortedNeighborhood
      .nearDupPairsByEdit(docs, "doc_id", "text", windowSize = 3, maxDist = 10)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // 1-2: distance 1 (case folded e vs E? normalization lowercases both -> 0)
    assert(pairs == Seq((1L, 2L, 0L)))
  }

  test("edit verify: real edits measured, length pre-filter prunes") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta common tail words here"),
      (2L, "alpha beta gamma delta epsilon zeta common tail words therx"), // subst+subst
      (4L, "alpha beta gamma delta epsilon zeta " + ("pad " * 20) + "end")
    ).toDF("doc_id", "text")
    val pairs = SortedNeighborhood
      .nearDupPairsByEdit(docs, "doc_id", "text", windowSize = 3, maxDist = 6)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // "here" -> "therx": insert leading t, substitute final e->x = 2
    assert(pairs == Seq((1L, 2L, 2L)))
  }

  test("edit verify agrees with unthresholded levenshtein on kept pairs") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eightx")
    ).toDF("doc_id", "text")
    val got = SortedNeighborhood
      .nearDupPairsByEdit(docs, "doc_id", "text", maxDist = 24)
      .as[(Long, Long, Long)].collect().head
    val full = docs.as[(Long, String)].collect().sortBy(_._1).map(_._2.toLowerCase.trim)
    val expected = {
      val (a, b) = (full(0), full(1))
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    assert(got == ((1L, 2L, expected)))
  }
}
