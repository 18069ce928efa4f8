package graft

import graft.functions.TextFunctions
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing/counting for the PPJoin prefix-filter chain on
  * the adversarial low-diversity fixture (not part of the driver
  * contract). Run: `sbt "runMain graft.ProbePp [sfDir]"`.
  */
object ProbePp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // replicate curationStages' inputs: planted corpus -> quality -> exact dedup
    val d = Tables(spark, sfDir, "documents").select("doc_id", "text", "lang", "source", "n_chars")
    val mutated = d.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val base = d.unionByName(mutated).select(col("doc_id"), col("text"))
    val withExact = base.unionByName(
      base.filter(col("doc_id") % 40 === 0 && col("doc_id") < 1000000L)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
    val quality = withExact
      .withColumn("__ws", TextFunctions.tokens(col("text")))
      .filter(TextFunctions.gopherKeep(col("__ws")))
      .persist()
    time("quality")(println("  quality rows: " + quality.count()))
    val exactWinners = quality
      .select(md5(col("text")).as("__h"), col("doc_id"))
      .groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val ek = quality.join(exactWinners, Seq("doc_id"), "left_semi").persist()
    time("exactKept")(println("  exactKept rows: " + ek.count()))

    // ---- prefixFilteredJaccardPairs stages, inlined with counters ----
    val idCol = "doc_id"; val textCol = "text"
    val shingleSize = 3; val minJaccardMicro = 500000L
    val toks = TextFunctions.tokens(col(textCol))
    val grams = ek.repartition(64)
      .select(col(idCol).as("id"),
        explode(array_distinct(TextFunctions.ngramsFromTokens(toks, shingleSize))).as("g"))
      .persist()
    time("grams")(println("  gram rows: " + grams.count() +
      "  distinct grams: " + grams.select("g").distinct().count()))
    val dft = grams.groupBy(col("g")).agg(count(lit(1)).as("__df"))
    val sets = grams.join(dft, Seq("g"))
      .groupBy(col("id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("__df").as("d"), col("g").as("g")))),
          e => e.getField("g")).as("gs"),
        count(lit(1)).as("n"))
      .withColumn("__p",
        (col("n") - expr(s"(n * $minJaccardMicro + 999999) div 1000000") + 1).cast("int"))
      .persist()
    time("sets")(println("  sets rows: " + sets.count()))
    val pref = sets.select(col("id"), col("n"),
      posexplode(slice(col("gs"), lit(1), col("__p"))).as(Seq("__pos0", "g")))
      .persist()
    time("pref")(println("  prefix postings: " + pref.count()))
    val rawJoin = pref.select(col("g"), col("id").as("id_a"), col("n").as("__na"), col("__pos0").as("__pa"))
      .join(pref.select(col("g"), col("id").as("id_b"), col("n").as("__nb"), col("__pos0").as("__pb")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
    time("raw candidate rows")(println("  raw: " + rawJoin.count()))
    val sizeFiltered = rawJoin.filter(
      greatest(col("__na"), col("__nb")) * lit(minJaccardMicro) <=
        least(col("__na"), col("__nb")) * lit(1000000L))
    time("size-filtered rows")(println("  sizeok: " + sizeFiltered.count()))
    val denom = 1000000L + minJaccardMicro
    val candOld = sizeFiltered.select(col("id_a"), col("id_b")).distinct().persist()
    time("distinct candidates (old)")(println("  candOld: " + candOld.count()))
    // group-level PPJoin bounds: c = shared prefix grams, (ia, ib) = 1-based
    // positions of the LAST (max canonical order) shared prefix gram
    val alpha = expr(s"((__na + __nb) * $minJaccardMicro + ${denom - 1}) div $denom")
    val ceilTmax = expr(s"(greatest(__na, __nb) * $minJaccardMicro + 999999) div 1000000")
    val candNew = sizeFiltered
      .groupBy(col("id_a"), col("id_b"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("__c"), (max(col("__pa")) + 1).as("__ia"), (max(col("__pb")) + 1).as("__ib"))
      .filter(col("__c") + least(col("__na") - col("__ia"), col("__nb") - col("__ib")) >= alpha &&
        col("__c") >= greatest(lit(1L), alpha - ceilTmax + 1))
      .select(col("id_a"), col("id_b"))
      .persist()
    time("group-filtered candidates (new)")(println("  candNew: " + candNew.count()))
    val out = candNew
      .join(sets.select(col("id").as("id_a"), col("gs").as("__ga"), col("n").as("sz_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("gs").as("__gb"), col("n").as("sz_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .withColumn("jaccard_micro", expr("inter * 1000000 div (sz_a + sz_b - inter)"))
      .filter(col("jaccard_micro") >= minJaccardMicro)
    time("verify (pos candidates)")(println("  pairs: " + out.count()))
    spark.stop()
  }
}
