package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection for embedding columns: a
  * deterministic md5-derived integer projection matrix maps d-dim
  * float vectors to k dims, preserving pairwise distances within the
  * JL distortion — THE preprocessing step that makes downstream ANN
  * cheaper (PQ subspaces, brute-force rerank, clustering all scale
  * with dimensionality). At 100 TB the projection is a stateless
  * per-row fold with the matrix shipped as plan literals — no joins,
  * no shuffle, one scan, whole-stage codegen'd (the matrix expands to
  * explicit column arithmetic, not interpreted HOF lambdas).
  *
  * Determinism/replay contract (the KMeansTrain convention): matrix
  * entries are `hex60(md5(i||'_'||j)) mod 2001 - 1000` — exact
  * integers on the [-1000, 1000] grid that any engine reproduces from
  * its own md5 — and each output coordinate accumulates
  * `decimal(28,14)` products, so the projected values are identical
  * regardless of summation order AND engine (`embed_project`
  * hash-matches every coordinate).
  */
object RandomProjection {

  /** Matrix entry r(i, j) — Scala-side twin of the SQL derivation
    * (`CAST('0x'||substr(md5(i||'_'||j),1,15) AS BIGINT) % 2001 -
    * 1000`); RandomProjectionSpec asserts the twins agree.
    */
  def matrixEntry(i: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
  }

  /** Project `vecCol` (array<float/double>, fixed dim `d`) to `k`
    * dims. Output columns `p0..p{k-1}`, decimal-exact then rounded at
    * `scale` for the output boundary.
    *
    * Native fused-loop expression per output column
    * ([[graft.functions.DecimalWeightedSum]], real codegen): the
    * chained decimal form ([[projectChained]], kept as the
    * differential reference) inlines O(d·k) Java into one generated
    * method, which crosses janino's 64 KB limit at (64, 8) and
    * silently dropped the whole projection stage to interpretation.
    */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      d: Int,
      k: Int,
      scale: Int = 6): DataFrame = {
    require(k > 0 && d > 0, "dims must be positive")
    val pCols = (0 until k).map { i =>
      val w = (0 until d).map(j => matrixEntry(i, j).toDouble)
      val sum = org.apache.spark.sql.GraftColumnShim.column(
        graft.functions.DecimalWeightedSum(
          org.apache.spark.sql.GraftColumnShim.expression(col(vecCol)), w))
      round(sum, scale).as(s"p$i")
    }
    df.select(col(idCol) +: pCols: _*)
  }

  /** The original chained-decimal form of [[project]] — retained ONLY
    * as the differential-spec reference for the native expression's
    * exact semantic mimicry (RandomProjectionSpec asserts bit
    * identity).
    */
  private[graft] def projectChained(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      d: Int,
      k: Int,
      scale: Int = 6): DataFrame = {
    require(k > 0 && d > 0, "dims must be positive")
    val pCols = (0 until k).map { i =>
      val terms = (0 until d).map { j =>
        (element_at(col(vecCol), j + 1).cast("double") * lit(matrixEntry(i, j).toDouble))
          .cast("decimal(28,14)")
      }
      // cast each partial back to a fixed precision so the 64-term
      // chain never widens past decimal's cap (the dotDecimal rule)
      val sum = terms.reduce((a, b) => (a + b).cast("decimal(30,14)"))
      round(sum.cast("double"), scale).as(s"p$i")
    }
    df.select(col(idCol) +: pCols: _*)
  }
}
