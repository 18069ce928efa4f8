package graft

import graft.operators.TextDedup

import org.apache.spark.sql.functions._

/** The packed-nibble in-join prefilter's two claims
  * ([[TextDedup.packedNibbles]] / [[TextDedup.nibbleAgreement]]):
  * the SWAR agreement count equals a brute-force nibble comparison,
  * and nibble agreement dominates full-signature agreement (the
  * losslessness theorem the bucket-join filter rests on).
  */
class PackedNibbleSpec extends SparkSpec {
  import spark.implicits._

  private def nibbles(x: Long): Seq[Long] = (0 until 16).map(i => (x >>> (i * 4)) & 15L)

  test("SWAR nibbleAgreement equals brute-force nibble comparison") {
    val pairs = (0 until 200).map { i =>
      (i.toLong, scala.util.hashing.MurmurHash3.stringHash(s"a$i").toLong * 2654435761L,
        scala.util.hashing.MurmurHash3.stringHash(s"b$i").toLong * 40503L)
    }
    val got = pairs.toDF("i", "a", "b")
      .select(col("i"), TextDedup.nibbleAgreement(col("a"), col("b")).as("agree"))
      .as[(Long, Int)].collect().toMap
    pairs.foreach { case (i, a, b) =>
      val expected = nibbles(a).zip(nibbles(b)).count { case (x, y) => x == y }
      assert(got(i) == expected, s"pair $i: $a vs $b")
    }
  }

  test("packed-nibble agreement dominates full-signature agreement (lossless bound)") {
    // random 32-long signatures with planted partial agreement
    val sigs = (0 until 100).map { i =>
      val a = Seq.tabulate(32)(j => (i * 31L + j * 7L) % 19L)
      val b = Seq.tabulate(32)(j => if ((i + j) % 3 == 0) a(j) else a(j) + 1 + j)
      (i.toLong, a, b)
    }
    val df = sigs.toDF("i", "sa", "sb")
    val pa = TextDedup.packedNibbles(col("sa"), 32)
    val pb = TextDedup.packedNibbles(col("sb"), 32)
    val bbAgree = pa.zip(pb).map { case (x, y) => TextDedup.nibbleAgreement(x, y) }
      .reduce(_ + _)
    val fullAgree = size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), p => p))
    val rows = df.select(col("i"), bbAgree.as("bb"), fullAgree.as("full"))
      .as[(Long, Int, Int)].collect()
    rows.foreach { case (i, bb, full) =>
      assert(bb >= full, s"sig pair $i: nibble agreement $bb < full agreement $full")
    }
    // the planted construction actually exercises partial agreement
    assert(rows.exists { case (_, _, full) => full > 0 && full < 32 })
  }
}
