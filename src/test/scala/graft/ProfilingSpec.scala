package graft

import graft.operators.Profiling

import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns counts nulls/distincts and stringifies ranges in one scan") {
    val df = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("a")), (4L, None))
      .toDF("k", "s")
    val got = Profiling.profileColumns(df, Seq("k", "s"))
      .orderBy(col("column"))
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("k", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b")), s"got $got")
  }

  test("profileColumns plans one pruned scan per column, hash aggregates only") {
    val df = Seq((1L, "x")).toDF("k", "s")
    val qe = Profiling.profileColumns(df, Seq("k", "s")).queryExecution
    val scans = qe.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 2, s"expected one scan per column:\n${qe.optimizedPlan}")
    // the value-grouped formulation must never eject to SortAggregate
    // (string min/max over the RAW rows would; over the grouped table
    // it stays tiny and the grouping agg is hash/mutable)
    val planStr = qe.executedPlan.toString
    assert(!planStr.contains("Expand"), s"unexpected Expand:\n$planStr")
  }

  test("skewReport: uniform keys gini 0; one hot key dominates the tail") {
    val uniform = (1 to 40).map(i => (s"k${i % 4}", i)).toDF("k", "v")
    val u = Profiling.skewReport(uniform, "k").head()
    assert(u.getLong(0) == 40L && u.getLong(1) == 4L)
    assert(u.getLong(2) == 10L)            // max
    assert(u.getLong(6) == 0L, s"uniform gini ${u.getLong(6)}") // gini 0
    val skewed = (Seq.fill(97)("hot") ++ Seq("a", "b", "c")).map((_, 1)).toDF("k", "v")
    val s = Profiling.skewReport(skewed, "k").head()
    assert(s.getString(3) == "hot")
    assert(s.getLong(4) == 1L)             // median count
    assert(s.getLong(6) > 700000L, s"skewed gini ${s.getLong(6)}")
  }

  test("trendSlopes: exact slope on a line, flat series is 0, singletons drop") {
    import graft.operators.TimeSeries
    val df = Seq(
      ("up", 0L, 0L), ("up", 10L, 50L), ("up", 20L, 100L),   // slope 5
      ("flat", 0L, 7L), ("flat", 100L, 7L),                  // slope 0
      ("single", 5L, 3L)).toDF("k", "t", "y")                // dropped
    val got = TimeSeries.trendSlopes(df, "k", col("t"), col("y"))
      .orderBy(col("k")).as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("flat", 2L, 0.0), ("up", 3L, 5.0)), s"got $got")
  }

  test("orphanCount finds exactly the planted gaps") {
    val child = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "d")).toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Profiling.orphanCount("c->p", child, "fk", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(got == (("c->p", 4L, 2L))) // both fk=3 rows are orphans
  }
}
