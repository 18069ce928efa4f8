package graft

import graft.operators.Graphs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-scale rehearsal for the DISTRIBUTED coreness peel
  * (Graphs.coreness above `driverMaxEdges`): a deterministic
  * hash-random graph big enough (> 2^21 canonical edges) that the
  * bounded-collect Batagelj-Zaversnik fast path is out of contract,
  * plus a planted 100-clique so the min-degree JUMP ladder is
  * exercised through a deep core. The drill times the distributed
  * path, counts its peel phases, and asserts EXACT agreement with the
  * driver algorithm on the same graph (the differential the unit spec
  * runs at toy size, here at 2^21+).
  *
  * Run: `sbt "runMain graft.CorenessDrill [nNodes] [nEdgeDraws]"`
  * (defaults 400000 / 2400000). Prints one JSON line for
  * BENCH_SELF_sf1.json.
  */
object CorenessDrill {
  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toLong).getOrElse(400000L)
    val nDraws = args.drop(1).headOption.map(_.toLong).getOrElse(2400000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hash-random multigraph draws -> canonical simple edges; plus a
    // planted 100-clique on ids [nNodes, nNodes+100) for a deep core
    val random = spark.range(nDraws).select(
      pmod(xxhash64(col("id"), lit("a")), lit(nNodes)).as("a"),
      pmod(xxhash64(col("id"), lit("b")), lit(nNodes)).as("b"))
      .filter(col("a") =!= col("b"))
    val cliqueIds = (0 until 100).map(i => nNodes + i)
    val clique = spark.createDataFrame(
      for { i <- cliqueIds; j <- cliqueIds if i < j } yield (i, j)).toDF("a", "b")
    val edges = random.unionByName(clique.select(col("a").cast("long"), col("b").cast("long")))
      .persist()
    val nEdges = edges.select(
      least(col("a"), col("b")).as("x"), greatest(col("a"), col("b")).as("y"))
      .distinct().count()
    require(nEdges > (1L << 21), s"fixture too small: $nEdges canonical edges")

    // distributed path, forced (driverMaxEdges = 0)
    val t0 = System.nanoTime()
    val dist = Graphs.coreness(edges, "a", "b", driverMaxEdges = 0L).persist()
    val nOut = dist.count()
    val wallDist = (System.nanoTime() - t0) / 1e9
    val peelPhases = Graphs.lastPeelPhases.get()
    val peelRounds = Graphs.lastPeelRounds.get()
    val maxCore = dist.agg(max(col("coreness"))).head().getLong(0)

    // driver Batagelj-Zaversnik on the same graph (2^21 edges is ~35 MB
    // on the driver — fine for the differential, out of contract for
    // the default threshold)
    val t1 = System.nanoTime()
    val bz = Graphs.coreness(edges, "a", "b", driverMaxEdges = Long.MaxValue).persist()
    val wallBz = (System.nanoTime() - t1) / 1e9
    val diff = dist.withColumnRenamed("coreness", "c1")
      .join(bz.withColumnRenamed("coreness", "c2"), Seq("id"), "full_outer")
      .filter(col("c1").isNull || col("c2").isNull || col("c1") =!= col("c2"))
      .count()

    println(
      s"""{"drill":"coreness_distributed","n_nodes":$nNodes,"canonical_edges":$nEdges,""" +
        s""""out_rows":$nOut,"max_coreness":$maxCore,"peel_phases":$peelPhases,""" +
        s""""degree_rounds":$peelRounds,"wall_distributed_s":${f"$wallDist%.2f"},""" +
        s""""wall_driver_bz_s":${f"$wallBz%.2f"},"mismatches_vs_driver":$diff}""")
    require(diff == 0, s"distributed peel diverged from driver BZ on $diff nodes")
    spark.stop()
  }
}
