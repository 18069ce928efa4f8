package graft

import graft.operators.{IvfAnn, SimilaritySearch}

import org.apache.spark.sql.functions._

/** [[SimilaritySearch.mutualKnnGraphAnn]] at the sf1-rehearsal scale:
  * 5,000 nodes in 500 planted clusters (10 float-shifted variants per
  * [[graft.ScaleFixture]] base vector) — an order of magnitude past
  * the gated query's 300 — through a 64-list IVF at nprobe=2. The
  * brute-force twin would score 25M pairs against a broadcast node
  * set; the ANN composition touches ~nprobe/nlist of that, and this
  * spec gates that the cheap path still recovers the planted cluster
  * structure: edges stay intra-cluster and nearly every cluster
  * surfaces.
  */
class ScaleKnnGraphAnnSpec extends SparkSpec {

  test("5k-node planted-cluster graph via IVF candidates: intra-cluster and covering") {
    val dir = tmpDir("scale-knn-ann")
    ScaleFixture.write(spark, dir, nDocs = 10, nVecs = 500)
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    val nodes = base
      .select(col("vec_id").as("__b"),
        explode(sequence(lit(0L), lit(9L))).as("__i"), col("embedding"))
      .select((col("__b") * 10 + col("__i")).as("vec_id"),
        transform(col("embedding"),
          x => x + col("__i").cast("float") * lit(0.0005f)).as("embedding"))

    val index = IvfAnn.build(nodes, "vec_id", "embedding", nlist = 64, iters = 2)
    try {
      val edges = SimilaritySearch.mutualKnnGraphAnn(index, k = 3, nprobe = 2)
        .select(col("id_a"), col("id_b"))
        .persist()
      val total = edges.count()
      assert(total > 0, "no edges at scale")
      val intra = edges.filter(expr("id_a div 10") === expr("id_b div 10")).count()
      assert(intra * 100 >= total * 95,
        s"only $intra/$total edges intra-cluster")
      val clustersCovered = edges
        .select(expr("id_a div 10").as("c")).distinct().count()
      assert(clustersCovered >= 450,
        s"only $clustersCovered/500 planted clusters surfaced an edge")
      edges.unpersist()
    } finally index.assigned.unpersist()
  }
}
