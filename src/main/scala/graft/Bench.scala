package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3); the JSON
  * reports the per-query MEDIAN (noise-resistant — a single-shot bench
  * on a shared machine produced a phantom 5x regression in round 2),
  * plus the cold (first-run) time per query for cache-sensitive ops.
  *
  * The same JSON line (plus /proc/loadavg snapshots before and after
  * the run) is also written to BENCH_SELF.json in the working
  * directory (full sf0.1 runs at the 32-cpu comparator config) AND to
  * a run-unique BENCH_DETAIL_<sf>_c<cpus>.json (any full run): the
  * driver's log capture truncates long lines, a loaded machine
  * inflates wall times 2-17x between sessions, and the driver benches
  * the same round at two cpu counts — the unique detail record lets a
  * later reader recover each run's per-query map without re-running.
  *
  * Besides wall time, every query reports its PROCESS-CPU seconds
  * (`queries_cpu`, median of per-rep getProcessCpuTime deltas). In
  * local mode the executors share the JVM, so this captures all
  * compute the query caused while being invariant to noisy neighbors:
  * a loaded machine stretches wall clock (the scheduler slices this
  * process thinner) but barely moves the CPU a query burns. Rounds 2,
  * 5 and 6 each produced phantom wall-clock "regressions" (up to
  * 100x) that took a full session to disprove — compare `queries_cpu`
  * across rounds first, wall only on a calm machine.
  */
object Bench {
  private def loadavg(): String =
    try {
      scala.util.Using.resource(scala.io.Source.fromFile("/proc/loadavg"))(
        _.mkString.trim)
    } catch { case _: Throwable => "unavailable" }

  // com.sun.management is present on every JDK this project supports
  // (Java 17 HotSpot); fall back to -1 deltas if a different VM ever
  // returns an unexpected bean.
  private val osBean: Option[com.sun.management.OperatingSystemMXBean] =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
  private def processCpuNanos(): Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)

  // cumulative stop-the-world GC milliseconds across all collectors —
  // the per-query delta splits a slow query into "burning CPU in the
  // collector" (heap churn / pressure) vs "burning CPU recomputing"
  // (evicted blocks, lineage re-execution): the round-15 contention
  // trio (45-68x wall under host load) was unattributable without it
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadavg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm JIT/codegen/parquet-footer paths so the first timed query
    // doesn't absorb session startup. The warm table is whichever
    // exists: scale-rehearsal fixture dirs (ScaleFixture) carry only
    // documents/embeddings.
    Seq("lineitem", "documents")
      .map(t => new java.io.File(s"$sfDir/$t.parquet"))
      .find(_.exists())
      .foreach { f =>
        val warm = spark.read.parquet(f.getPath)
        warm.groupBy(warm.columns.head).count().count()
        warm.limit(10).count()
      }
    // dev-loop filter: comma-separated name substrings; unset = all.
    // SPARK_GRAFT_BENCH_EXACT=1 switches to exact-name matching (the
    // scale suite needs "corpus_curation_pipeline" WITHOUT its
    // _lossless sibling — substring selection cannot express that)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    val exactNames = sys.env.get("SPARK_GRAFT_BENCH_EXACT").contains("1")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        only.forall(os => if (exactNames) os.contains(n) else os.exists(n.contains)) }
    val results = selected.map { case (name, fn) =>
      var failed = false
      val samples = (1 to reps).map { _ =>
        val m0 = graft.util.SessionScopedCache.totalMisses
        val g0 = gcMillis()
        val c0 = processCpuNanos()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable => failed = true; System.err.println(s"[bench] $name failed: $e") }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else (processCpuNanos() - c0) / 1e9
        val gc = (gcMillis() - g0) / 1e3
        (wall, cpu, graft.util.SessionScopedCache.totalMisses > m0, gc)
      }
      val times = samples.map(_._1)
      val cpus = samples.map(_._2)
      val gcs = samples.map(_._4)
      // measurement-scope label: the cold rep built session-staged
      // state the warm reps then answer from — this query's median/min
      // measure the SERVE path; compare across rounds via cold. Only
      // meaningful with WARM reps present: at reps == 1 the tail
      // forall is vacuous and min == cold anyway, so the label would
      // mislead comparators pairing stage_cached with queries_cold
      val staged = samples.size > 1 && samples.head._3 && samples.tail.forall(!_._3)
      // a failed query must not report a normal-looking time: emit the
      // -1 sentinel so downstream comparisons can't read a fast failure
      // as a perf win
      val median = if (failed) -1.0 else times.sorted.apply(times.size / 2)
      val medianCpu = if (failed) -1.0 else cpus.sorted.apply(cpus.size / 2)
      val medianGc = if (failed) -1.0 else gcs.sorted.apply(gcs.size / 2)
      System.err.println(
        f"[bench] $name%-28s median $median%8.2f s  (cpu $medianCpu%.2f, gc $medianGc%.2f, cold ${times.head}%.2f, min ${times.min}%.2f${if (staged) ", staged" else ""})")
      (name, median, times.head, times.min, failed, medianCpu, staged, medianGc)
    }
    def js(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = js(results.map(r => (r._1, r._2)))
    val cold = js(results.map(r => (r._1, r._3)))
    val mins = js(results.map(r => (r._1, r._4)))
    val cpuJs = js(results.map(r => (r._1, r._6)))
    val gcJs = js(results.map(r => (r._1, r._8)))
    val failedList = results.filter(_._5).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // queries whose warm reps serve from session stage caches built in
    // the cold rep: their median/min measure the serve path only —
    // cross-round and cross-framework comparisons must pair these with
    // queries_cold (the full-build time)
    val stagedList = results.filter(_._7).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filter(!_._5).map(_._2).sum
    val totalCpu = results.filter(!_._5).map(_._6).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"total_cpu":$totalCpu,"failed":$failedList,"queries":$qs,"queries_cpu":$cpuJs,"queries_gc":$gcJs,"queries_cold":$cold,"queries_min":$mins,"stage_cached":$stagedList,"sf":"$sfDir"}"""
    println(line)
    val record =
      s"""{"loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}","bench":$line}"""
    // only FULL runs AT THE COMPARATOR SF update the durable record —
    // a filtered dev-loop run, an sf0.001 smoke, or a scale-suite
    // rehearsal (sf1/sf4 fixtures) must not clobber the committed
    // whole-suite sf0.1 numbers (a smoke did exactly that in round 15
    // and poisoned the scale suite's sf01_min join fields). The SF
    // check is on the NORMALIZED basename (a trailing slash or a
    // sibling name that merely ends in "sf0.1" must not flip it);
    // SPARK_GRAFT_BENCH_RECORD=0 suppresses the write entirely — it
    // wins even over an explicit SPARK_GRAFT_BENCH_OUT (r16 ADVICE:
    // the OUT short-circuit used to make "suppresses entirely" a lie);
    // otherwise SPARK_GRAFT_BENCH_OUT redirects the record to an
    // explicit path (smoke/rehearsal runs can keep their own capture
    // without ever touching the durable one).
    val sfBase =
      java.nio.file.Paths.get(sfDir).normalize() match {
        case p if p.getFileName != null => p.getFileName.toString
        case _ => ""
      }
    val recordPath =
      if (sys.env.get("SPARK_GRAFT_BENCH_RECORD").contains("0")) None
      else sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse {
        // the durable comparator record is the COMPARATOR CONFIG only:
        // full suite, sf0.1, 32 cpus. The driver also re-runs the full
        // suite at 8 cpus minutes later — before the cpu guard that run
        // clobbered the committed 32-cpu record (r18 VERDICT: the
        // round's per-query detail became unrecoverable).
        if (only.isEmpty && sfBase == "sf0.1" && cpus == "32") Some("BENCH_SELF.json")
        else None
      }
    // RUN-UNIQUE detail record (r18 VERDICT item 2): every full run —
    // any SF, any cpu count — writes its complete per-query record to a
    // path keyed by (sf, cpus), so no later run at a different
    // configuration can overwrite it. The compact trailer below points
    // here; a consumer that needs the per-query map follows the pointer
    // instead of parsing the (over-long) first stdout line.
    val detailPath =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_BENCH_RECORD").contains("0")) None
      else Some(s"BENCH_DETAIL_${sfBase}_c$cpus.json")
    (recordPath.toSeq ++ detailPath.toSeq).distinct.foreach { path =>
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path), (record + "\n").getBytes("UTF-8"))
      } catch {
        case e: Throwable => System.err.println(s"[bench] $path write failed: $e")
      }
    }
    // compact trailer for the driver's tail capture: the full line
    // above overflows its buffer at 238 queries (BENCH_r14/r15 parsed
    // null) — this short line carries the headline numbers and is
    // printed LAST so a tail parse always sees it intact. Three rounds
    // of `parsed: null` later (r16: the trailer WAS in the tail but
    // wore sbt's `[info] ` prefix), the line is belt-and-braced:
    // build.sbt forces StdoutOutput for forked runs (bare stdout, no
    // log-prefix rewrite) AND the trailer is mirrored to
    // BENCH_TRAILER.json so any consumer can read it as a bare file.
    // `detail` points at the RUN-UNIQUE per-query record written above
    // (r18 VERDICT: a mutable pointer — BENCH_SELF.json — lost the
    // round's 32-cpu detail to the driver's later 8-cpu run), falling
    // back to the durable/explicit record path for filtered runs.
    val trailer =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"n_failed":${results.count(_._5)},"total_cpu":$totalCpu,"reps":$reps,"sf":"$sfDir","cpus":"$cpus","detail":"${detailPath.orElse(recordPath).getOrElse("unrecorded")}"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_TRAILER.json"),
        (trailer + "\n").getBytes("UTF-8"))
    } catch {
      case e: Throwable => System.err.println(s"[bench] trailer write failed: $e")
    }
    println(trailer)
    spark.stop()
  }
}
