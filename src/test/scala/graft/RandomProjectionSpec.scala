package graft

import graft.operators.RandomProjection

import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {

  import spark.implicits._

  test("Scala matrix entries equal the SQL md5 derivation") {
    val sql = spark.range(8).select(col("id").as("i"))
      .crossJoin(spark.range(64).select(col("id").as("j")))
      .select(col("i"), col("j"),
        (expr("conv(substr(md5(concat(i, '_', j)), 1, 15), 16, 10)").cast("long")
          % 2001 - 1000).as("r"))
      .as[(Long, Long, Long)].collect()
    sql.foreach { case (i, j, r) =>
      assert(RandomProjection.matrixEntry(i.toInt, j.toInt) == r, s"($i,$j)")
    }
  }

  test("projection values are exact integer combinations on unit inputs") {
    // x = e_j (one-hot) -> p_i = r(i, j) exactly
    val oneHot = (0 until 64).map(j =>
      (j.toLong, (0 until 64).map(jj => if (jj == j) 1.0f else 0.0f)))
    val out = RandomProjection
      .project(oneHot.toDF("vec_id", "embedding"), "vec_id", "embedding", d = 64, k = 4)
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    out.foreach { case (j, p0, p1, p2, p3) =>
      assert(p0 == RandomProjection.matrixEntry(0, j.toInt).toDouble)
      assert(p1 == RandomProjection.matrixEntry(1, j.toInt).toDouble)
      assert(p2 == RandomProjection.matrixEntry(2, j.toInt).toDouble)
      assert(p3 == RandomProjection.matrixEntry(3, j.toInt).toDouble)
    }
  }

  test("projection is linear and partition-invariant") {
    val vecs = (0L until 40L).map { id =>
      id -> (0 until 64).map(j => ((id * 64 + j) % 17).toFloat / 17.0f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val a = RandomProjection.project(df, "vec_id", "embedding", 64, 8)
      .collect().map(_.toSeq).toSeq
    val b = RandomProjection.project(df.repartition(7), "vec_id", "embedding", 64, 8)
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.head.asInstanceOf[Long]) == b)
    // linearity: project(2x) == 2*project(x) (exact at scale-6 rounding
    // of exact decimal sums for these small values)
    val doubled = vecs.map { case (id, v) => (id, v.map(_ * 2.0f)) }
      .toDF("vec_id", "embedding")
    val pa = RandomProjection.project(df, "vec_id", "embedding", 64, 2, scale = 8)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val pb = RandomProjection.project(doubled, "vec_id", "embedding", 64, 2, scale = 8)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    pa.zip(pb).foreach { case ((_, x0, x1), (_, y0, y1)) =>
      assert(math.abs(y0 - 2 * x0) < 1e-6 && math.abs(y1 - 2 * x1) < 1e-6)
    }
  }

  test("native fused projection == chained decimal form, bit for bit") {
    // (d=64, k=8) is exactly the shape whose chained form overflowed
    // janino's 64 KB method limit and silently ran interpreted
    val df = spark.range(40).select(
      col("id").as("vec_id"),
      array((0 until 64).map(j =>
        ((col("id") * 7 + j * 3) % 41 / lit(9.0) - 2.0).cast("float")): _*)
        .as("embedding"))
    val a = RandomProjection.project(df, "vec_id", "embedding", 64, 8)
      .orderBy(col("vec_id")).collect()
    val b = RandomProjection.projectChained(df, "vec_id", "embedding", 64, 8)
      .orderBy(col("vec_id")).collect()
    a.zip(b).foreach { case (ra, rb) =>
      (0 to 8).foreach { c =>
        assert(ra.get(c) == rb.get(c), s"col $c: ${ra.get(c)} != ${rb.get(c)}")
      }
    }
  }

  test("overflow fallback (|sum| past the scale-14 long range) still matches the chain") {
    // elements ~1e4 push Σ round14(x*w) past 2^63/10^14 ≈ 9.2e4, so
    // the fused expression's Math.addExact fast path throws and the
    // BigDecimal fallback computes the sum — which must stay
    // bit-identical to the chained decimal form (exact on both paths)
    val df = spark.range(20).select(
      col("id").as("vec_id"),
      array((0 until 64).map(j =>
        (((col("id") * 11 + j * 5) % 17 + lit(9000.0)) / 0.7).cast("float")): _*)
        .as("embedding"))
    val a = RandomProjection.project(df, "vec_id", "embedding", 64, 8)
      .orderBy(col("vec_id")).collect()
    val b = RandomProjection.projectChained(df, "vec_id", "embedding", 64, 8)
      .orderBy(col("vec_id")).collect()
    // the fixture must actually cross the fallback boundary
    assert(a.exists(r => (1 to 8).exists(c => math.abs(r.getDouble(c)) > 9.3e4)),
      "fixture failed to exceed the long fast-path range")
    a.zip(b).foreach { case (ra, rb) =>
      (0 to 8).foreach { c =>
        assert(ra.get(c) == rb.get(c), s"col $c: ${ra.get(c)} != ${rb.get(c)}")
      }
    }
  }

  test("native projection nulls match the chain: null element, null array") {
    val df = Seq(
      (2L, Some(Seq[Option[Float]](Some(1f), None, Some(3f)))),
      (3L, None: Option[Seq[Option[Float]]]))
      .toDF("vec_id", "embedding")
    val a = RandomProjection.project(df, "vec_id", "embedding", 3, 2)
      .orderBy(col("vec_id")).collect()
    val b = RandomProjection.projectChained(df, "vec_id", "embedding", 3, 2)
      .orderBy(col("vec_id")).collect()
    a.zip(b).foreach { case (ra, rb) =>
      (1 to 2).foreach { c =>
        assert(ra.isNullAt(c) == rb.isNullAt(c), s"null mismatch col $c")
      }
    }
    assert(a.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("a vector shorter than d throws on both paths (ANSI element_at)") {
    val df = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val exN = intercept[Exception] {
      RandomProjection.project(df, "vec_id", "embedding", 3, 2).collect()
    }
    val exC = intercept[Exception] {
      RandomProjection.projectChained(df, "vec_id", "embedding", 3, 2).collect()
    }
    assert(exN.getMessage.contains("INVALID_ARRAY_INDEX"), exN.getMessage)
    assert(exC.getMessage.contains("INVALID_ARRAY_INDEX"), exC.getMessage)
  }

  test("projection stays in whole-stage codegen (no HOF lambdas)") {
    val df = spark.range(16).select(
      col("id").as("vec_id"),
      array((0 until 64).map(j => (col("id") + j).cast("float")): _*).as("embedding"))
    val plan = RandomProjection.project(df, "vec_id", "embedding", 64, 4)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
    assert(!plan.contains("lambdafunction"), "projection must not use HOFs")
  }
}
