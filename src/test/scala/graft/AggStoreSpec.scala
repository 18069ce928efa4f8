package graft

import graft.operators.AggStore

import org.apache.spark.sql.functions._

class AggStoreSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.select("k", "cnt", "sum_micro", "min_micro", "max_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("build quantizes to the micro-grid and aggregates exactly") {
    val df = Seq(("a", 1.25), ("a", 2.5), ("b", -0.000001)).toDF("k", "v")
    val got = rows(AggStore.build(df, Seq("k"), col("v")))
    assert(got == Set(
      ("a", 2L, 3750000L, 1250000L, 2500000L),
      ("b", 1L, -1L, -1L, -1L)))
  }

  test("merge is the monoid fold, groups unique to either side survive") {
    val a = AggStore.build(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), Seq("k"), col("v"))
    val b = AggStore.build(Seq(("a", 3.0), ("c", 4.0)).toDF("k", "v"), Seq("k"), col("v"))
    val got = rows(AggStore.merge(a, b, Seq("k")))
    assert(got == Set(
      ("a", 2L, 4000000L, 1000000L, 3000000L),
      ("b", 1L, 2000000L, 2000000L, 2000000L),
      ("c", 1L, 4000000L, 4000000L, 4000000L)))
  }

  test("absorbIntoSaved == rebuild over the union, element for element") {
    val base = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("k", "v")
    val inc = Seq(("a", 10.0), ("d", 4.0)).toDF("k", "v")
    val path = tmpDir("agg-store")
    AggStore.save(AggStore.build(base, Seq("k"), col("v")), Seq("k"), path)
    AggStore.absorbIntoSaved(spark, path, inc, col("v"))
    val absorbed = rows(AggStore.load(spark, path).groups.drop("__kp"))
    val rebuilt = rows(AggStore.build(base.unionByName(inc), Seq("k"), col("v")))
    assert(absorbed == rebuilt)
  }

  test("absorb leaves untouched partitions' files byte-identical") {
    // many keys spread the store over several __kp dirs; the increment
    // touches exactly one key -> at most a few dirs rewritten
    val base = (0 until 200).map(i => (s"k$i", i.toDouble)).toDF("k", "v")
    val path = tmpDir("agg-store-files")
    AggStore.save(AggStore.build(base, Seq("k"), col("v")), Seq("k"), path)
    def fileMap(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/groups"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = fileMap()
    AggStore.absorbIntoSaved(spark, path, Seq(("k5", 100.0)).toDF("k", "v"), col("v"))
    val after = fileMap()
    // some partition was rewritten (the touched one)...
    assert((after.keySet -- before.keySet).nonEmpty)
    // ...but most survive untouched, byte-for-byte the same files
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size > before.size / 2,
      s"too many partitions rewritten: ${before.size - untouched.size} of ${before.size}")
    assert(untouched.forall(f => before(f) == after(f)))
  }

  test("probe prunes the store scan to the probe's prefixes") {
    val base = (0 until 100).map(i => (s"k$i", i.toDouble)).toDF("k", "v")
    val path = tmpDir("agg-store-probe")
    AggStore.save(AggStore.build(base, Seq("k"), col("v")), Seq("k"), path)
    val st = AggStore.load(spark, path)
    val probed = AggStore.probe(st, Seq(("k7", 0), ("k13", 0)).toDF("k", "x").select("k"))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__kp"),
      s"expected __kp partition pruning in:\n$plan")
    assert(probed.select("k", "cnt").as[(String, Long)].collect().toSet ==
      Set(("k7", 1L), ("k13", 1L)))
  }

  test("present derives avg and rounds at the boundary") {
    val g = AggStore.build(Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v"), Seq("k"), col("v"))
    val r = AggStore.present(g, Seq("k"))
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(r == (("a", 2L, 3.0, 1.0, 2.0, 1.5)))
  }
}
