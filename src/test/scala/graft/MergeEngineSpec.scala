package graft

import graft.config.TableConfig
import graft.operators.{CdcDedup, MergeEngine}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeEngineSpec extends SparkSpec {
  import spark.implicits._

  private def changelog(rows: (Int, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("id", "name", "__deleted", "__log_sequence_number")

  test("resolveUpsert: insert + newer-version update + stale replay ignored") {
    val target = changelog((1, "a", "false", 10L), (2, "b", "false", 20L))
    val source = changelog(
      (2, "b2", "false", 25L), // newer -> wins
      (1, "a0", "false", 5L), // stale replay -> ignored
      (3, "c", "false", 30L)) // new key -> insert
    val out = MergeEngine
      .resolveUpsert(target, source, Seq("id"), "__log_sequence_number")
      .select("id", "name").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a", 2 -> "b2", 3 -> "c"))
  }

  test("resolveUpsert: version tie keeps the target row (strict < guard)") {
    val target = changelog((1, "target", "false", 10L))
    val source = changelog((1, "source", "false", 10L))
    val out = MergeEngine
      .resolveUpsert(target, source, Seq("id"), "__log_sequence_number")
      .select("name").as[String].collect()
    assert(out.toSeq == Seq("target"))
  }

  test("resolveDelete: pk-only, no version guard") {
    val target = changelog((1, "a", "false", 100L), (2, "b", "false", 20L))
    // delete arrives with an OLDER lsn — still deletes (J2 semantics)
    val deletes = changelog((1, null, "true", 1L))
    val out = MergeEngine.resolveDelete(target, deletes, Seq("id"))
      .select("id").as[Int].collect()
    assert(out.toSeq == Seq(2))
  }

  test("schema evolution: source adds a column; dropped column persists as null") {
    val target = Seq((1, "a", 10L)).toDF("id", "name", "lsn")
    val source = Seq((2, "b@x", 20L)).toDF("id", "email", "lsn") // name gone, email new
    val out = MergeEngine.resolveUpsert(target, source, Seq("id"), "lsn")
      .orderBy("id").collect()
    val schema = MergeEngine.resolveUpsert(target, source, Seq("id"), "lsn").schema
    assert(schema.fieldNames.toSet == Set("id", "name", "lsn", "email"))
    val row1 = out(0) // id=1: has name, null email
    val row2 = out(1) // id=2: null name, has email
    assert(row1.getAs[String]("name") == "a" && row1.getAs[String]("email") == null)
    assert(row2.getAs[String]("name") == null && row2.getAs[String]("email") == "b@x")
  }

  test("cached read schema survives evolution and external rewrites are recoverable") {
    val path = tmpDir("merge-schemacache")
    val cfg = TableConfig("graft_test", "sc_tbl", s"$path/t")
    MergeEngine.upsert(spark, cfg, Seq((1, "a", 10L)).toDF("id", "name", "lsn"), Seq("id"), "lsn")
    // evolution through the merge path: the cached schema must pick up
    // the union, and pre-evolution rows read as null in the new column
    MergeEngine.upsert(spark, cfg, Seq((2, "b@x", 20L)).toDF("id", "email", "lsn"), Seq("id"), "lsn")
    val t = MergeEngine.readTable(spark, cfg.path).get.orderBy("id").collect()
    assert(t.map(_.getAs[Any]("email")).toSeq == Seq(null, "b@x"))
    assert(t.map(_.getAs[Any]("name")).toSeq == Seq("a", null))
    // an EXTERNAL writer changes the table outside the merge protocol;
    // invalidateSchema makes the next read re-sweep the footers
    Seq((9, "ext", 99L, true)).toDF("id", "name", "lsn", "flag")
      .write.mode("overwrite").parquet(cfg.path)
    MergeEngine.invalidateSchema(spark, cfg.path)
    val ext = MergeEngine.readTable(spark, cfg.path).get
    assert(ext.columns.contains("flag"))
    assert(ext.count() == 1L)
  }

  test("table-backed upsert/delete on a partitioned table, incl. partition cleanup") {
    val path = tmpDir("merge-part")
    val cfg = TableConfig("graft_test", "part_tbl", s"$path/t", partitionCols = Seq("year"))

    val b1 = Seq(
      (1, "a", 2023, 10L), (2, "b", 2023, 11L), (3, "c", 2024, 12L))
      .toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")
    assert(MergeEngine.readTable(spark, cfg.path).get.count() == 3)

    // second batch touches ONLY 2024; 2023 partition files must be untouched
    val files2023 = listFiles(s"$path/t/year=2023")
    val b2 = Seq((3, "c2", 2024, 20L), (4, "d", 2024, 21L)).toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn")
    val t2 = MergeEngine.readTable(spark, cfg.path).get
    assert(t2.count() == 4)
    assert(t2.filter(col("id") === 3).select("name").as[String].collect().head == "c2")
    assert(listFiles(s"$path/t/year=2023") == files2023, "untouched partition was rewritten")

    // delete the only 2023 rows -> partition dir removed
    val dels = Seq((1, 0L), (2, 0L)).toDF("id", "lsn")
    MergeEngine.delete(spark, cfg, dels, Seq("id"))
    val t3 = MergeEngine.readTable(spark, cfg.path).get
    assert(t3.select("id").as[Int].collect().sorted.toSeq == Seq(3, 4))
    assert(!new java.io.File(s"$path/t/year=2023").exists(), "emptied partition not cleaned up")
  }

  test("catalog partition registration is memoized per session") {
    val path = tmpDir("merge-cat-memo")
    val cfg = TableConfig("graft_test", "cat_memo_tbl", s"$path/t",
      partitionCols = Seq("year"))
    val schema = Seq((0, "x", 2023, 0L)).toDF("id", "name", "year", "lsn").schema
    MergeEngine.createTableIfNotExists(spark, schema, cfg)
    MergeEngine.upsert(spark, cfg,
      Seq((1, "a", 2023, 10L)).toDF("id", "name", "year", "lsn"), Seq("id"), "lsn")
    def parts() = spark.sql(s"SHOW PARTITIONS ${cfg.qualifiedName}")
      .collect().map(_.getString(0)).toSet
    assert(parts() == Set("year=2023"))
    // simulate an external drop: the session memo must SKIP the re-add
    // for an already-seen partition (that skip is the saved round trip)
    spark.sql(s"ALTER TABLE ${cfg.qualifiedName} DROP PARTITION (year=2023)")
    MergeEngine.upsert(spark, cfg,
      Seq((2, "b", 2023, 11L)).toDF("id", "name", "year", "lsn"), Seq("id"), "lsn")
    assert(!parts().contains("year=2023"), "memoized partition was re-added")
    // a genuinely new partition still registers
    MergeEngine.upsert(spark, cfg,
      Seq((3, "c", 2024, 12L)).toDF("id", "name", "year", "lsn"), Seq("id"), "lsn")
    assert(parts().contains("year=2024"))
    // the path table itself has every row regardless of catalog state
    assert(MergeEngine.readTable(spark, cfg.path).get.count() == 3L)
  }

  test("memo evicted when the engine removes a partition: a re-add re-registers") {
    val path = tmpDir("merge-cat-evict")
    val cfg = TableConfig("graft_test", "cat_evict_tbl", s"$path/t",
      partitionCols = Seq("year"))
    val schema = Seq((0, "x", 2023, 0L)).toDF("id", "name", "year", "lsn").schema
    MergeEngine.createTableIfNotExists(spark, schema, cfg)
    MergeEngine.upsert(spark, cfg,
      Seq((1, "a", 2023, 10L), (2, "b", 2024, 11L)).toDF("id", "name", "year", "lsn"),
      Seq("id"), "lsn")
    def parts() = spark.sql(s"SHOW PARTITIONS ${cfg.qualifiedName}")
      .collect().map(_.getString(0)).toSet
    assert(parts() == Set("year=2023", "year=2024"))
    // the ENGINE's delete empties 2023: dir removed and memo entry evicted
    MergeEngine.delete(spark, cfg, Seq((1, 0L)).toDF("id", "lsn"), Seq("id"))
    assert(!new java.io.File(s"$path/t/year=2023").exists())
    spark.sql(s"ALTER TABLE ${cfg.qualifiedName} DROP PARTITION (year=2023)")
    assert(!parts().contains("year=2023"))
    // re-adding the SAME partition value must go through the ALTER again
    // (a stale memo would skip it and the catalog would miss the data)
    MergeEngine.upsert(spark, cfg,
      Seq((5, "e", 2023, 30L)).toDF("id", "name", "year", "lsn"), Seq("id"), "lsn")
    assert(parts().contains("year=2023"),
      "re-added partition missing from catalog (stale registration memo)")
  }

  test("pre-collected touched partitions skip the discovery job, same end state") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val seed = Seq((1, "a", 2023, 10L), (2, "b", 2024, 11L)).toDF("id", "name", "year", "lsn")
    val src = Seq((1, "a2", 2023, 20L), (3, "c", 2025, 21L)).toDF("id", "name", "year", "lsn")
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { counter.incrementAndGet(); () }
    }
    // count Spark jobs for f: listener events are async, so poll until
    // the count has been stable for a while before reading it
    def jobs(f: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      counter.set(0)
      try {
        f
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val now = counter.get
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get
    }
    def run(name: String, touched: Option[Array[org.apache.spark.sql.Row]]): (Int, Seq[(Int, String)]) = {
      val path = tmpDir(s"merge-touched-$name")
      val cfg = TableConfig("graft_test", s"touched_$name", s"$path/t",
        partitionCols = Seq("year"))
      MergeEngine.upsert(spark, cfg, seed, Seq("id"), "lsn")
      val n = jobs(MergeEngine.upsert(spark, cfg, src, Seq("id"), "lsn",
        knownNonEmpty = true, touchedUpsert = touched))
      val state = MergeEngine.readTable(spark, cfg.path).get
        .select("id", "name").as[(Int, String)].collect().sortBy(_._1).toSeq
      (n, state)
    }
    val (jobsCollecting, stateA) = run("collect", None)
    val (jobsProvided, stateB) =
      run("given", Some(Array(
        org.apache.spark.sql.Row(2023), org.apache.spark.sql.Row(2025))))
    assert(stateA == stateB, "end states diverged")
    assert(stateA.map(_._1) == Seq(1, 2, 3))
    // the caller-provided partition list drops the discovery
    // distinct+collect entirely (>= 1 job; 2 under AQE's staged
    // shuffle) — the micro-batch loop folds it into its routing
    // aggregation, so routing + discovery is ONE driver job per pair
    assert(jobsProvided < jobsCollecting,
      s"expected fewer jobs, got $jobsProvided vs $jobsCollecting")
  }

  test("fused mixed-batch merge on a partitioned table: one transaction, same end state") {
    val path = tmpDir("merge-fused-part")
    val cfg = TableConfig("graft_test", "fused_tbl", s"$path/t", partitionCols = Seq("year"))
    val b1 = Seq(
      (1, "a", 2023, 10L), (2, "b", 2023, 11L), (3, "c", 2024, 12L))
      .toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")

    // mixed batch: update id=3 (2024), insert id=4 (2025), delete BOTH
    // 2023 rows (partition must vanish), stale replay for id=3 ignored
    val ups = Seq((3, "c2", 2024, 20L), (4, "d", 2025, 21L), (3, "stale", 2024, 1L))
      .toDF("id", "name", "year", "lsn")
    val upserts = graft.operators.CdcDedup.latestPerKey(ups, Seq("id"), "lsn")
    val deletes = Seq((1, 99L), (2, 99L)).toDF("id", "lsn")
    MergeEngine.merge(spark, cfg, upserts, deletes, Seq("id"), "lsn")

    val t = MergeEngine.readTable(spark, cfg.path).get
    assert(t.select("id").as[Int].collect().sorted.toSeq == Seq(3, 4))
    assert(t.filter(col("id") === 3).select("name").as[String].collect().head == "c2")
    assert(!new java.io.File(s"$path/t/year=2023").exists(), "emptied partition not cleaned up")
    assert(new java.io.File(s"$path/t/year=2025").exists(), "new partition missing")

    // key inserted and deleted by the SAME mixed batch never lands
    val ups2 = Seq((9, "ghost", 2026, 30L)).toDF("id", "name", "year", "lsn")
    val dels2 = Seq((9, 31L)).toDF("id", "lsn")
    MergeEngine.merge(spark, cfg, ups2, dels2, Seq("id"), "lsn")
    val t2 = MergeEngine.readTable(spark, cfg.path).get
    assert(t2.filter(col("id") === 9).count() == 0L)
    assert(!new java.io.File(s"$path/t/year=2026").exists(), "ghost partition left behind")
  }

  test("upsert is idempotent under batch replay (same batch twice)") {
    val path = tmpDir("merge-replay")
    val cfg = TableConfig("graft_test", "replay_tbl", s"$path/t")
    val b = Seq((1, "a", 10L), (2, "b", 11L)).toDF("id", "name", "lsn")
    MergeEngine.upsert(spark, cfg, b, Seq("id"), "lsn")
    MergeEngine.upsert(spark, cfg, b, Seq("id"), "lsn") // replay
    val t = MergeEngine.readTable(spark, cfg.path).get
    assert(t.count() == 2)
  }

  test("W1 dedup collapses in-batch churn before merge") {
    val batch = changelog(
      (1, "v1", "false", 1L), (1, "v2", "false", 2L), (1, "v3", "false", 3L),
      (2, "x1", "false", 1L))
    val deduped = CdcDedup.latestPerKey(batch, Seq("id"), "__log_sequence_number")
    assert(deduped.count() == 2)
    assert(deduped.filter(col("id") === 1).select("name").as[String].collect().head == "v3")
  }

  test("compact: oversized partitions rewritten to few files, data unchanged") {
    val path = tmpDir("merge-compact")
    val cfg = TableConfig("graft_test", "compact_tbl", s"$path/t", partitionCols = Seq("year"))
    // simulate accumulated small files (raw appends into the layout;
    // the merge itself is copy-on-write per partition, so it doesn't
    // accumulate files — appenders and high shuffle-partition writes do)
    (1 to 6).foreach { b =>
      (1 to 50).map(i => (b * 1000 + i, s"n$b-$i", 2024, (b * 1000 + i).toLong))
        .toDF("id", "name", "year", "lsn")
        .coalesce(1)
        .write.mode("append").partitionBy("year").parquet(cfg.path)
    }
    val before = MergeEngine.readTable(spark, cfg.path).get.orderBy("id").collect()
    val filesBefore = new java.io.File(s"$path/t/year=2024").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore > 4, s"expected many small files, got $filesBefore")

    val compacted = MergeEngine.compact(spark, cfg, targetFileBytes = 1L << 30, maxFilesPerPartition = 4)
    assert(compacted == 1)
    val filesAfter = new java.io.File(s"$path/t/year=2024").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter <= 2, s"still $filesAfter files after compaction")
    val after = MergeEngine.readTable(spark, cfg.path).get.orderBy("id").collect()
    assert(after.toSeq == before.toSeq, "compaction changed the data")
  }

  test("null partition values: merge, update, delete and dir cleanup") {
    val path = tmpDir("merge-nullpart")
    val cfg = TableConfig("graft_test", "nullpart_tbl", s"$path/t", partitionCols = Seq("year"))
    val b1 = Seq(
      (1, "a", Some(2024), 10L), (2, "b", None, 11L), (3, "c", None, 12L))
      .toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")
    assert(MergeEngine.readTable(spark, cfg.path).get.count() == 3)

    // update a row in the null partition
    val b2 = Seq((2, "b2", Option.empty[Int], 20L)).toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn")
    val t2 = MergeEngine.readTable(spark, cfg.path).get
    assert(t2.filter(col("id") === 2).select("name").as[String].collect().head == "b2")
    assert(t2.count() == 3)

    // delete both null-partition rows -> default partition dir removed
    MergeEngine.delete(spark, cfg, Seq((2, 0L), (3, 0L)).toDF("id", "lsn"), Seq("id"))
    val t3 = MergeEngine.readTable(spark, cfg.path).get
    assert(t3.select("id").as[Int].collect().toSeq == Seq(1))
    assert(!new java.io.File(s"$path/t/year=__HIVE_DEFAULT_PARTITION__").exists())
  }

  test("sortCols: writes are clustered within files for row-group skipping") {
    val path = tmpDir("merge-sort")
    val cfg = TableConfig("graft_test", "sorted_tbl", s"$path/t", sortCols = Seq("id"))
    val df = new scala.util.Random(7).shuffle((1 to 2000).toList)
      .map(i => (i, s"n$i", i.toLong)).toDF("id", "name", "lsn")
    MergeEngine.upsert(spark, cfg, df, Seq("id"), "lsn")
    // per physical file, ids must be non-decreasing
    val perFile = MergeEngine.readTable(spark, cfg.path).get
      .select(input_file_name().as("f"), col("id"))
      .as[(String, Int)].collect().groupBy(_._1).values
    assert(perFile.nonEmpty)
    perFile.foreach { rows =>
      val ids = rows.map(_._2).toSeq
      assert(ids == ids.sorted, "file not clustered by sort column")
    }
  }

  // ---------------------------------------------------------------------
  // Crash atomicity: kill the writer at each protocol point, then read —
  // recoverTable (invoked from readTable) must hand back the intact
  // pre-merge table, and a replay must land the merge.
  // ---------------------------------------------------------------------

  private class InjectedCrash extends RuntimeException("injected crash")

  private def crashingAt(point: String)(body: => Unit): Unit = {
    MergeEngine.Failpoints.hook = p => if (p == point) throw new InjectedCrash
    try {
      intercept[InjectedCrash](body)
      ()
    } finally MergeEngine.Failpoints.hook = _ => ()
  }

  private def crashPoints = Seq("manifest", "backed-up", "mid-swap", "pre-commit")

  test("crash between stage and swap: partitioned table rolls back bit-for-bit") {
    crashPoints.foreach { point =>
      val path = tmpDir(s"merge-crash-$point")
      val cfg = TableConfig("graft_test", "crash_tbl", s"$path/t", partitionCols = Seq("year"))
      val b1 = Seq((1, "a", 2023, 10L), (2, "b", 2024, 11L)).toDF("id", "name", "year", "lsn")
      MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")
      val before = filesUnder(s"$path/t")

      val b2 = Seq((2, "B2", 2024, 20L), (3, "c", 2025, 21L)).toDF("id", "name", "year", "lsn")
      crashingAt(point)(MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn"))

      // first read rolls back; table is its exact pre-merge version
      val t = MergeEngine.readTable(spark, cfg.path).get
      assert(t.select("id", "name").as[(Int, String)].collect().toMap
        == Map(1 -> "a", 2 -> "b"), s"[$point] rollback lost/changed rows")
      assert(filesUnder(s"$path/t") == before, s"[$point] rollback not bit-for-bit")
      assert(!new java.io.File(s"$path/t/year=2025").exists(), s"[$point] new partition survived rollback")

      // the replayed batch applies cleanly after recovery
      MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn")
      val t2 = MergeEngine.readTable(spark, cfg.path).get
      assert(t2.select("id", "name").as[(Int, String)].collect().toMap
        == Map(1 -> "a", 2 -> "B2", 3 -> "c"), s"[$point] replay after recovery failed")
    }
  }

  test("crash during compaction rolls back; data and files intact") {
    val path = tmpDir("merge-compact-crash")
    val cfg = TableConfig("graft_test", "cc_tbl", s"$path/t", partitionCols = Seq("year"))
    // seed a partition with a guaranteed-multi-file layout (explicit
    // repartition count defeats AQE coalescing)
    Seq((0, "n0", 2024, 0L), (1, "n1", 2024, 1L), (2, "n2", 2024, 2L))
      .toDF("id", "name", "year", "lsn")
      .repartition(3)
      .write.partitionBy("year").mode("append").parquet(cfg.path)
    val before = filesUnder(s"$path/t")
    crashingAt("mid-swap")(
      { MergeEngine.compact(spark, cfg, targetFileBytes = 1L << 30, maxFilesPerPartition = 1); () })
    val t = MergeEngine.readTable(spark, cfg.path).get // triggers rollback
    assert(t.select("id").as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
    assert(filesUnder(s"$path/t") == before, "aborted compaction changed the file set")
    // retry compacts cleanly
    assert(MergeEngine.compact(spark, cfg, targetFileBytes = 1L << 30, maxFilesPerPartition = 1) == 1)
    assert(MergeEngine.readTable(spark, cfg.path).get
      .select("id").as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
  }

  test("a reader arriving mid-swap must NOT roll back the live transaction") {
    val path = tmpDir("merge-live")
    val cfg = TableConfig("graft_test", "live_tbl", s"$path/t", partitionCols = Seq("year"))
    val b1 = Seq((1, "a", 2023, 10L)).toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")

    // simulate a concurrent reader hitting recovery at every in-flight
    // point: with the writer registered, recoverTable must be a no-op
    val observed = scala.collection.mutable.Map[String, Boolean]()
    MergeEngine.Failpoints.hook = p => observed(p) = MergeEngine.recoverTable(spark, cfg.path)
    val b2 = Seq((1, "A2", 2023, 20L), (2, "b", 2024, 21L)).toDF("id", "name", "year", "lsn")
    try MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn")
    finally MergeEngine.Failpoints.hook = _ => ()

    assert(observed.values.forall(_ == false),
      s"reader rolled back a live transaction at: ${observed.filter(_._2).keys}")
    // the swap committed despite the concurrent recovery attempts
    val t = MergeEngine.readTable(spark, cfg.path).get
    assert(t.select("id", "name").as[(Int, String)].collect().toMap
      == Map(1 -> "A2", 2 -> "b"))
    assert(!new java.io.File(s"$path/t/${"_graft_txn.json"}").exists())
  }

  test("crash between stage and swap: unpartitioned table rolls back bit-for-bit") {
    crashPoints.foreach { point =>
      val path = tmpDir(s"merge-crash-flat-$point")
      val cfg = TableConfig("graft_test", "crash_flat_tbl", s"$path/t")
      val b1 = Seq((1, "a", 10L), (2, "b", 11L)).toDF("id", "name", "lsn")
      MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")
      val before = filesUnder(s"$path/t")

      val b2 = Seq((2, "B2", 20L)).toDF("id", "name", "lsn")
      crashingAt(point)(MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn"))

      val t = MergeEngine.readTable(spark, cfg.path).get
      assert(t.select("id", "name").as[(Int, String)].collect().toMap
        == Map(1 -> "a", 2 -> "b"), s"[$point] rollback lost/changed rows")
      assert(filesUnder(s"$path/t") == before, s"[$point] rollback not bit-for-bit")

      MergeEngine.upsert(spark, cfg, b2, Seq("id"), "lsn")
      assert(MergeEngine.readTable(spark, cfg.path).get
        .filter(col("id") === 2).select("name").as[String].head() == "B2")
    }
  }

  test("crash during a partition-dropping delete rolls back the removed partition") {
    val path = tmpDir("merge-crash-del")
    val cfg = TableConfig("graft_test", "crash_del_tbl", s"$path/t", partitionCols = Seq("year"))
    val b1 = Seq((1, "a", 2023, 10L), (2, "b", 2024, 11L)).toDF("id", "name", "year", "lsn")
    MergeEngine.upsert(spark, cfg, b1, Seq("id"), "lsn")
    val before = filesUnder(s"$path/t")

    // deleting id=1 empties year=2023 entirely; crash after its backup rename
    crashingAt("backed-up")(
      MergeEngine.delete(spark, cfg, Seq((1, 0L)).toDF("id", "lsn"), Seq("id")))
    assert(filesUnder(s"$path/t") != before, "crash point did not interrupt the swap")

    val t = MergeEngine.readTable(spark, cfg.path).get
    assert(t.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(filesUnder(s"$path/t") == before)

    // replay completes the delete, removing the emptied partition atomically
    MergeEngine.delete(spark, cfg, Seq((1, 0L)).toDF("id", "lsn"), Seq("id"))
    assert(MergeEngine.readTable(spark, cfg.path).get.select("id").as[Int].collect().toSeq == Seq(2))
    assert(!new java.io.File(s"$path/t/year=2023").exists())
  }

  test("recovery is idempotent and leaves no transaction debris") {
    val path = tmpDir("merge-crash-idem")
    val cfg = TableConfig("graft_test", "crash_idem_tbl", s"$path/t", partitionCols = Seq("year"))
    MergeEngine.upsert(spark, cfg,
      Seq((1, "a", 2023, 10L)).toDF("id", "name", "year", "lsn"), Seq("id"), "lsn")
    crashingAt("mid-swap")(MergeEngine.upsert(spark, cfg,
      Seq((1, "a2", 2023, 20L), (2, "b", 2024, 21L)).toDF("id", "name", "year", "lsn"),
      Seq("id"), "lsn"))
    assert(MergeEngine.recoverTable(spark, cfg.path), "first recover must roll back")
    assert(!MergeEngine.recoverTable(spark, cfg.path), "second recover must be a no-op")
    val parent = new java.io.File(path)
    val debris = parent.listFiles().map(_.getName)
      .filter(n => n.contains("__staging_") || n.contains("__backup_"))
    assert(debris.isEmpty, s"leftover transaction dirs: ${debris.mkString(",")}")
    assert(!new java.io.File(s"$path/t/_graft_txn.json").exists())
  }

  test("delete probe pushes a pk min/max range filter when files are pk-clustered") {
    val pred = MergeEngine.pkRangeFilter(
      Seq((5, 0L), (9, 0L)).toDF("id", "lsn"), Seq("id"), Seq("id"))
    assert(pred.isDefined)
    assert(pred.get.toString.contains("5") && pred.get.toString.contains("9"))
    // not applicable: composite pk or no pk clustering
    assert(MergeEngine.pkRangeFilter(
      Seq((5, 0L)).toDF("id", "lsn"), Seq("id", "lsn"), Seq("id")).isEmpty)
    assert(MergeEngine.pkRangeFilter(
      Seq((5, 0L)).toDF("id", "lsn"), Seq("id"), Seq.empty).isEmpty)

    // end-to-end: pk-clustered partitioned table, the probe's scan carries
    // the pushed range so parquet row-group stats can skip files
    val path = tmpDir("merge-prune-del")
    val cfg = TableConfig("graft_test", "prune_del_tbl", s"$path/t",
      partitionCols = Seq("year"), sortCols = Seq("id"))
    val rows = (1 to 1000).map(i => (i, s"n$i", 2020 + i % 4, i.toLong))
    MergeEngine.upsert(spark, cfg, rows.toDF("id", "name", "year", "lsn"), Seq("id"), "lsn")
    val target = MergeEngine.readTable(spark, cfg.path).get
    val probePlan = target.filter(MergeEngine.pkRangeFilter(
      Seq((42, 0L), (44, 0L)).toDF("id", "lsn"), Seq("id"), cfg.sortCols).get)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("GreaterThanOrEqual(id,42)") && probePlan.contains("LessThanOrEqual(id,44)"),
      s"range not pushed to scan:\n$probePlan")
    MergeEngine.delete(spark, cfg, Seq((42, 0L), (44, 0L)).toDF("id", "lsn"), Seq("id"))
    val t = MergeEngine.readTable(spark, cfg.path).get
    assert(t.count() == 998)
    assert(t.filter(col("id").isin(42, 44)).count() == 0)
  }

  private def filesUnder(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (!f.exists()) Seq.empty
      else if (f.isFile) Seq(f)
      else f.listFiles().toSeq.flatMap(walk)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(dir) + ":" + f.length())
      .toSet
  }

  private def listFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName + ":" + f.length()).toSet
  }
}
