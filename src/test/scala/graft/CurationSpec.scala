package graft

import graft.operators.{Curation, TextDedup}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // A corpus the quality gate keeps: mid-length sentences of mixed
  // 3-7 char words, each doc distinct. Near-dup pairs planted by
  // appending one token to every 5th doc (Jaccard well above 0.5);
  // exact dups planted by copying every 7th doc verbatim.
  private def corpus(): DataFrame = {
    // per-doc-unique vocabulary: cross-doc Jaccard is 0 except for the
    // planted pairs, which sit far above the 0.5 operating point — so
    // banding recall is total and deterministic, not marginal
    val base = (0 until 60).map { i =>
      val words = (0 until 40).map(j => s"w${i}x${j}ab")
      (i.toLong, words.mkString(" "))
    }
    val nearDups = base.collect { case (id, t) if id % 5 == 0 =>
      (id + 1000L, t + " extratok")
    }
    val exactDups = base.collect { case (id, t) if id % 7 == 0 =>
      (id + 2000L, t)
    }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("the default strategy is the banded corpus-scale path") {
    assert(Curation.defaultStrategy == Curation.BandedMinhash())
    assert(Curation.defaultStrategy.isInstanceOf[Curation.BandedMinhash])
  }

  test("banded pairs are a verified subset of the lossless truth set") {
    val docs = corpus()
    val lossless = Curation
      .nearDupPairs(docs, "doc_id", "text", Curation.LosslessPrefix())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Curation
      .nearDupPairs(docs, "doc_id", "text") // DEFAULT routes banded
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness is unconditional (exact verify on every emission);
    // recall is total on this fixture (planted pairs are far above
    // the 0.5 S-curve operating point)
    assert(banded.subsetOf(lossless))
    assert(banded == lossless)
    assert(lossless.nonEmpty)
  }

  test("curate() routes by strategy and the two strategies agree end-to-end") {
    val docs = corpus()
    def survivorIds(c: Curation.Curated): Set[Long] =
      c.survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    val byDefault = Curation.curate(docs, "doc_id", "text")
    val byLossless = Curation.curate(docs, "doc_id", "text", Curation.LosslessPrefix())
    try {
      // exact stage: every planted verbatim copy (id+2000) loses to
      // its min-id original
      val exactIds = byDefault.exactKept.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(exactIds.forall(_ < 2000L))
      // near-dup stage: every planted tail variant (id+1000) loses;
      // both strategies keep the identical survivor set
      val sDefault = survivorIds(byDefault)
      assert(sDefault.forall(_ < 1000L))
      assert(sDefault == survivorIds(byLossless))
      assert(sDefault.size < exactIds.size) // near-dup stage did work
    } finally {
      Seq(byDefault, byLossless).foreach { c =>
        c.quality.unpersist(); c.exactKept.unpersist(); c.nearDupPairs.unpersist()
      }
    }
  }

  test("the portable-md5 scheme replays the default chain with identical pairs") {
    val docs = corpus()
    def pairs(scheme: TextDedup.MinhashScheme): Set[(Long, Long)] =
      Curation.nearDupPairs(docs, "doc_id", "text", Curation.BandedMinhash(scheme = scheme))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the two hash families band differently, but on this fixture both
    // recover the full planted set after the exact verify — the gate's
    // md5 pin changes the oracle seam, not the result
    assert(pairs(TextDedup.PortableMd5Scheme) == pairs(TextDedup.XxHash64Scheme))
  }

  test("dropNearDups keeps the component minimum and drops the rest") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "d")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Curation.dropNearDups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }
}
