package graft

import graft.operators.RankFusion

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Long)*) = rows.toDF("id", "rank")

  test("exact quantized scores: both-list doc beats single-list docs") {
    val sparse = ranking(10L -> 1L, 11L -> 2L, 12L -> 3L)
    val dense = ranking(12L -> 1L, 13L -> 2L)
    val out = RankFusion.rrf(Seq(sparse, dense), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // id 12: floor(1e6/63) + floor(1e6/61) = 15873 + 16393 = 32266
    assert(out.head == ((12L, 2L, 0.0323)))
    // 11 and 13 both rank 2 in their lists (floor(1e6/62) each) ->
    // equal fused scores, ascending-id tie-break
    assert(out.map(_._1).toSeq == Seq(12L, 10L, 11L, 13L))
    // id 10: floor(1e6/61) = 16393 -> 0.0164
    assert(out(1)._3 == 0.0164)
  }

  test("ties break by ascending id") {
    val a = ranking(5L -> 1L, 9L -> 2L)
    val b = ranking(9L -> 1L, 5L -> 2L)
    val out = RankFusion.rrf(Seq(a, b), k = 10).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(5L, 9L), "equal fused scores order by id")
  }

  test("k truncates after fusion, not per list") {
    val a = ranking((1L to 8L).map(i => i -> i): _*)
    val out = RankFusion.rrf(Seq(a), k = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }
}
