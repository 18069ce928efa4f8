package graft

import graft.operators.ZOrder

import org.apache.spark.sql.functions._

/** Morton interleave closed forms, range-normalized bucketing, and
  * the point of it all: a z-ordered layout prunes files on EITHER
  * dimension where a plain sort prunes only its leading column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave closed form on hand-picked bit patterns") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 0L), (0L, 3L), (3L, 3L))
      .toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      ZOrder.interleave(Seq(col("a"), col("b")), bits = 2).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // column 0 holds the higher bit of each pair: z = interleave(a hi)
    assert(got == Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 1L) -> 3L,
      (3L, 0L) -> 10L, (0L, 3L) -> 5L, (3L, 3L) -> 15L), s"got $got")
  }

  test("withZ normalizes ranges so both dimensions share the z domain") {
    // a in [100, 355], b in [0, 1023): both normalize to 8-bit buckets
    val df = (0L until 256L).map(i => (100L + i, i * 4L)).toDF("a", "b")
    val z = ZOrder.withZ(df, Seq("a", "b"), bits = 8)
    // identical normalized buckets -> z = interleave(k, k), strictly
    // monotone in the common bucket
    val rows = z.orderBy(col("a")).select(col("__z")).as[Long].collect()
    assert(rows.length == 256 && rows.toSeq == rows.sorted.toSeq)
    assert(rows.distinct.length == 256)
  }

  test("fileRanges: z-order keeps BOTH dimensions narrow per file") {
    // a uniform grid where a and b are independent — the case a plain
    // sort cannot cluster on both
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val ranges = ZOrder.fileRanges(grid, Seq("x", "y"), bits = 6, numFiles = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(ranges.map(_._2).sum == 64L * 64L, "every row lands in exactly one file")
    // each file's window on EACH dimension is far narrower than the
    // full 64-value domain (perfect z on a 64x64 grid gives 16- or
    // 32-wide windows; a plain x-sort gives 64-wide y windows)
    ranges.foreach { case (f, _, minX, maxX, minY, maxY) =>
      assert(maxX - minX <= 32 && maxY - minY <= 32,
        s"file $f window too wide: x [$minX,$maxX] y [$minY,$maxY]")
    }
  }

  test("writeZordered produces files a point predicate prunes on either column") {
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val path = tmpDir("zorder-layout")
    ZOrder.writeZordered(grid, Seq("x", "y"), path, bits = 6, numFiles = 16)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size == 16, s"expected 16 files, got ${files.size}")
    def touched(c: String, v: Long): Int = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx")).head()
      r.getLong(0) <= v && v <= r.getLong(1)
    }
    // a point predicate on either dimension overlaps only a quarter of
    // the files; an x-sorted layout would touch ALL 16 for y = 17
    assert(touched("x", 17L) <= 4, s"x pruning weak: ${touched("x", 17L)}")
    assert(touched("y", 17L) <= 4, s"y pruning weak: ${touched("y", 17L)}")
  }

  test("single-column and constant-column degenerate cases") {
    val one = Seq((5L, 9L), (6L, 9L), (7L, 9L)).toDF("a", "b")
    // constant column: every bucket 0, z reduces to the varying column
    val z = ZOrder.withZ(one, Seq("a", "b"), bits = 4)
      .orderBy(col("a")).select(col("__z")).as[Long].collect().toSeq
    assert(z == z.sorted && z.distinct.size == 3)
    val empty = ZOrder.fileRanges(
      Seq.empty[(Long, Long)].toDF("a", "b"), Seq("a", "b"))
    assert(empty.count() == 0)
  }
}
