package graft

import graft.operators.QuantileSketch

import org.apache.spark.sql.functions._

import scala.util.Random

/** Property checks of the quantile-sketch invariants over
  * seeded-random inputs: the rank-containment bound holds for EVERY
  * requested quantile at every mantissa width, quantiles are invariant
  * to how the input was split into merged sketches, and an un-merged
  * union (duplicate bucket rows) answers identically to the merged
  * form — the read path must not require a prior compaction.
  */
class QuantileSketchPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random inputs, random m: every quantile obeys the containment bound") {
    val rnd = new Random(23)
    for (trial <- 1 to 5) {
      val m = 2 + rnd.nextInt(9) // 2..10
      val mag = 4 + rnd.nextInt(50)
      val rows = (1 to 1500).map(_ =>
        (s"g${rnd.nextInt(3)}", (math.abs(rnd.nextLong()) % (1L << mag)) + 1))
      val df = rows.toDF("k", "v")
      val qs = Seq(("q1", 1, 10), ("q2", 1, 2), ("q3", 9, 10), ("q4", 1, 1))
      val est = QuantileSketch
        .quantiles(QuantileSketch.build(df, Seq("k"), col("v"), m), Seq("k"), qs)
        .collect().map(r => r.getString(0) ->
          (1 to 4).map(r.getLong(_))).toMap
      for ((k, grp) <- rows.groupBy(_._1)) {
        val sorted = grp.map(_._2).sorted
        def exact(num: Int, den: Int): Long =
          sorted(((num.toLong * sorted.size + den - 1) / den - 1).toInt)
        val exacts = Seq(exact(1, 10), exact(1, 2), exact(9, 10), exact(1, 1))
        est(k).zip(exacts).foreach { case (a, e) =>
          assert(a <= e && e - a <= (a >> m),
            s"trial $trial m=$m k=$k est=$a exact=$e")
        }
      }
    }
  }

  test("random split into merged sketches == one-shot build; un-merged union reads the same") {
    val rnd = new Random(41)
    for (trial <- 1 to 3) {
      val rows = (1 to 2000).map(_ =>
        (s"g${rnd.nextInt(4)}", (math.abs(rnd.nextLong()) % 3000000L) + 1))
      val parts = {
        val n = 2 + rnd.nextInt(4)
        rows.groupBy(_ => rnd.nextInt(n)).values.toSeq.filter(_.nonEmpty)
      }
      val built = parts.map(p =>
        QuantileSketch.build(p.toDF("k", "v"), Seq("k"), col("v"), 7))
      val merged = built.reduce(QuantileSketch.merge(_, _, Seq("k")))
      val oneShot = QuantileSketch.build(rows.toDF("k", "v"), Seq("k"), col("v"), 7)
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("k"), col("__qb")).as[(String, Long, Long)].collect().toSeq
      assert(rowsOf(merged) == rowsOf(oneShot), s"trial $trial: merge != rebuild")
      // duplicate bucket rows (no re-sum) must answer identically: the
      // cumulative window closes each bucket at its last duplicate
      val unmerged = built.reduce(_ unionByName _)
      val qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p99", 99, 100))
      def q(df: org.apache.spark.sql.DataFrame) =
        QuantileSketch.quantiles(df, Seq("k"), qs)
          .orderBy(col("k")).collect().map(_.toSeq).toSeq
      assert(q(unmerged) == q(oneShot), s"trial $trial: un-merged union diverged")
    }
  }
}
