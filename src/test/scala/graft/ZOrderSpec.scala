package graft

import graft.config.TableConfig
import graft.functions.ZOrder
import graft.operators.MergeEngine

import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton implementation mirroring the expression spec. */
  private def mortonRef(values: Seq[Long]): Long = {
    val n = values.size
    val bitsPer = 64 / n
    var out = 0L
    var pos = 63
    for (b <- 0 until bitsPer; c <- 0 until n if pos >= 0) {
      out |= ((values(c) >>> (63 - b)) & 1L) << pos
      pos -= 1
    }
    out
  }
  private def uLong(v: Long): Long = v ^ Long.MinValue
  private def uDouble(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits | Long.MinValue
  }

  test("interleave matches the reference Morton construction") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((rnd.nextLong(), rnd.nextInt(), rnd.nextDouble() * 2000 - 1000))
    val got = rows.toDF("a", "b", "c")
      .select(ZOrder.zorder(col("a"), col("b"), col("c"))).as[Long].collect()
    rows.zip(got).foreach { case ((a, b, c), z) =>
      assert(z == mortonRef(Seq(uLong(a), uLong(b.toLong), uDouble(c))), s"($a,$b,$c)")
    }
  }

  test("single column z-order preserves the column's total order") {
    val vals = Seq(Long.MinValue, -5L, -1L, 0L, 1L, 42L, Long.MaxValue)
    val zs = vals.toDF("a").select(ZOrder.zorder(col("a"))).as[Long].collect()
    // unsigned comparison of the z keys must match signed order of inputs
    assert(zs.map(z => java.lang.Long.compareUnsigned(z, zs.head)).sliding(2).forall(p => p.head <= p.last))
  }

  test("z-order write clusters BOTH dimensions into row groups") {
    val grid = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val df = grid.toDF("x", "y").repartition(1)
    def fileRanges(sorted: org.apache.spark.sql.DataFrame): Double = {
      val dir = tmpDir("zorder") + "/t"
      sorted.write.option("maxRecordsPerFile", 64).parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("y") - min("y")).as("yr"))
        .agg(avg("yr")).as[Double].collect().head
    }
    val lexSpread = fileRanges(df.sortWithinPartitions(col("x"), col("y")))
    val zSpread = fileRanges(df.sortWithinPartitions(ZOrder.zorder(
      ZOrder.rangeScaled(col("x"), 0, 31), ZOrder.rangeScaled(col("y"), 0, 31))))
    // lexicographic: every 64-row file spans the full y range (~31);
    // z-order: files are ~8x8 blocks (y range ~7)
    assert(zSpread < lexSpread / 2, s"z=$zSpread lex=$lexSpread")
  }

  test("generated code compiles and agrees with interpreted eval (no silent fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rnd = new scala.util.Random(11)
      val rows = Seq.fill(100)((rnd.nextLong(), rnd.nextDouble() * 100, rnd.nextInt()))
      val out = rows.toDF("a", "b", "c")
        .select(ZOrder.zorder(col("a"), col("b"), col("c"))).as[Long].collect()
      rows.zip(out).foreach { case ((a, b, c), z) =>
        assert(z == mortonRef(Seq(uLong(a), uDouble(b), uLong(c.toLong))))
      }
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      prev.foreach(spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("MergeEngine zOrderWrite preserves merge semantics") {
    val path = tmpDir("merge-zorder")
    val cfg = TableConfig("graft_test", "z_tbl", s"$path/t",
      sortCols = Seq("a", "b"), zOrderWrite = true)
    val b1 = Seq((1, 10, "x", 1L), (2, 20, "y", 2L), (3, 30, "z", 3L)).toDF("a", "b", "name", "lsn")
    MergeEngine.upsert(spark, cfg, b1, Seq("a"), "lsn")
    val b2 = Seq((2, 20, "y2", 9L)).toDF("a", "b", "name", "lsn")
    MergeEngine.upsert(spark, cfg, b2, Seq("a"), "lsn")
    val out = MergeEngine.readTable(spark, cfg.path).get
      .select("a", "name").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "x", 2 -> "y2", 3 -> "z"))
  }
}
