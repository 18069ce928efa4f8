package graft

import graft.operators.ZOrder

import org.apache.spark.sql.functions._

import scala.util.Random

/** Property checks of the z-order arithmetic where hand fixtures
  * don't reach: extreme Long ranges (the decimal(38,0) claim),
  * interleave injectivity, and agreement with an independent BigInt
  * driver-side reference over seeded-random data.
  */
class ZOrderPropertySpec extends SparkSpec {
  import spark.implicits._

  private def refZ(
      rows: Seq[(Long, Long)], bits: Int): Map[(Long, Long), Long] = {
    val (as, bs) = (rows.map(_._1), rows.map(_._2))
    val (mna, mxa, mnb, mxb) = (as.min, as.max, bs.min, bs.max)
    def bucket(v: Long, mn: Long, mx: Long): Long =
      ((BigInt(v) - mn) * (1L << bits) / (BigInt(mx) - mn + 1)).toLong
    rows.map { case (a, b) =>
      val (ba, bb) = (bucket(a, mna, mxa), bucket(b, mnb, mxb))
      val z = (0 until bits).map { j =>
        (((ba >> j) & 1L) << (2 * j + 1)) | (((bb >> j) & 1L) << (2 * j))
      }.sum
      (a, b) -> z
    }.toMap
  }

  test("withZ equals the BigInt reference on extreme and random Long ranges") {
    val rnd = new Random(20260814L)
    val regimes: Seq[() => Long] = Seq(
      () => rnd.nextLong(),                        // full Long range
      () => rnd.nextInt(1000).toLong - 500,        // small signed
      () => Long.MaxValue - rnd.nextInt(100000),   // near-max cluster
      () => Long.MinValue + rnd.nextInt(100000))   // near-min cluster
    for (ga <- regimes; gb <- regimes) {
      val rows = Seq.fill(60)((ga(), gb())).distinct
      val got = ZOrder.withZ(rows.toDF("a", "b"), Seq("a", "b"), bits = 8)
        .select(col("a"), col("b"), col("__z"))
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == refZ(rows, 8), s"diverged for regime pair")
    }
  }

  test("interleave is injective over distinct bucket tuples") {
    val rnd = new Random(7L)
    val tuples = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .distinct
    val zs = tuples.toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), bits = 8).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == tuples.length,
      "distinct bucket tuples must map to distinct z values")
    // and three columns at 8 bits stay within the promised 62 bits
    val z3 = Seq((255L, 255L, 255L)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].head()
    assert(z3 == (1L << 24) - 1, s"3-column all-ones interleave wrong: $z3")
  }

  test("file assignment is total, ordered, and matches the written layout") {
    val rnd = new Random(99L)
    val rows = Seq.fill(3000)((rnd.nextLong(), rnd.nextLong())).distinct
    val withId = ZOrder.withFileId(rows.toDF("a", "b"), Seq("a", "b"),
      bits = 8, numFiles = 16)
      .select(col("a"), col("b"), col("file_id"))
      .as[(Long, Long, Long)].collect()
    assert(withId.length == rows.length)
    assert(withId.forall(r => r._3 >= 0 && r._3 < 16), "file_id out of range")
    // z-min row lands in file 0, z-max row in file 15 (range split)
    val ref = refZ(rows, 8)
    val byZ = withId.map(r => ref((r._1, r._2)) -> r._3)
    assert(byZ.minBy(_._1)._2 == 0L && byZ.maxBy(_._1)._2 == 15L)
    // monotone: a higher z never lands in a lower file
    assert(byZ.sortBy(_._1).map(_._2).sliding(2).forall(p => p.head <= p.last),
      "file assignment must be monotone in z")
  }
}
