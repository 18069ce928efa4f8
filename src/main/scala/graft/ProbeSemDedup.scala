package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall/CPU breakdown of the semantic_dedup
  * pipeline at a rehearsal fixture — which stage carries the
  * superlinear term (train scans? assignment? in-cluster pair count?
  * prefilter cosines?). Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf4 runMain graft.ProbeSemDedup
  */
object ProbeSemDedup {
  private val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  private def stage[A](name: String)(body: => A): A = {
    val w0 = System.nanoTime(); val c0 = os.getProcessCpuTime
    val r = body
    val w = (System.nanoTime() - w0) / 1e9; val c = (os.getProcessCpuTime - c0) / 1e9
    println(f"[semdedup] $name%-28s wall=$w%8.2f cpu=$c%8.2f")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_BCAST", "10485760"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{KMeansTrain, SemanticDedup, TopicAssign}
    import graft.functions.{VectorFunctions => VF}

    val emb = graft.sources.Tables(spark, dir, "embeddings")
    val perturbed = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.0005f)).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(perturbed)
    val n = stage("count")(corpus.count())
    val k = SemanticDedup.sizedK(n)
    println(s"[semdedup] n=$n k=$k")
    val quantized = corpus
      .select(col("vec_id"), TopicAssign.quantize(col("embedding")).as("q")).persist()
    stage("quantize+persist")(quantized.count())
    var cents = stage("seed")(KMeansTrain.seedCentroids(corpus, "vec_id", "embedding", k))
    cents = stage("lloyd1")(KMeansTrain.lloydStep(quantized, cents))
    cents = stage("lloyd2")(KMeansTrain.lloydStep(quantized, cents))
    val sorted = cents.sortBy(_._1)
    val assigned = corpus.repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        KMeansTrain.assignedQ(TopicAssign.quantize(col("embedding")), sorted).as("cluster"))
      .persist()
    stage("assign+persist")(assigned.count())
    val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("__n")).persist()
    val top = stage("sizes")(
      sizes.orderBy(col("__n").desc).limit(5).collect().map(r => r.getLong(1)).toSeq)
    val sumSq = sizes.agg(sum(col("__n") * col("__n"))).head().getLong(0)
    println(s"[semdedup] top cluster sizes=$top sum(m^2)=$sumSq -> pairs~${sumSq / 2}")
    val ids = assigned.select(col("cluster"), col("id"))
    val bounded = ids.join(
      sizes.filter(col("__n") <= 10000).drop("__n"), Seq("cluster"))
    val pairs = bounded.select(col("cluster"), col("id").as("id_a"))
      .join(bounded.select(col("cluster"), col("id").as("id_b")), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
    val nPairs = stage("pair count (id-only)")(pairs.count())
    println(s"[semdedup] in-cluster pairs=$nPairs")
    val carried = pairs
      .join(assigned.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(assigned.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
    val nPre = stage("joinback+prefilter")(
      carried.filter(VF.cosine(col("vec_a"), col("vec_b")) >= lit(0.9794)).count())
    println(s"[semdedup] prefilter survivors=$nPre")
    val nScored = stage("decimal cosine + gate")(
      carried.filter(VF.cosine(col("vec_a"), col("vec_b")) >= lit(0.9794))
        .filter(round(VF.cosineDecimal(col("vec_a"), col("vec_b")), 3) >= 0.98).count())
    println(s"[semdedup] final pairs=$nScored")
    spark.stop()
  }
}
