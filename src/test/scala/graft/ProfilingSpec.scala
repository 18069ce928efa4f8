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

  test("profileColumns is a single-scan plan (one aggregate, no reread)") {
    val df = Seq((1L, "x")).toDF("k", "s")
    val plan = Profiling.profileColumns(df, Seq("k", "s"))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}:\n$plan")
  }

  test("orphanCount finds exactly the planted gaps") {
    val child = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "d")).toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Profiling.orphanCount("c->p", child, "fk", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(got == (("c->p", 4L, 2L))) // both fk=3 rows are orphans
  }
}
