package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingestion (reference run_pipeline, SURVEY §3.2) as partitioned
  * lake maintenance: month-partitioned writes, idempotent MERGE-style
  * upsert, next-missing-month selection.
  *
  * Scale notes: `partitionBy(year, month)` keeps every downstream
  * month-scoped read partition-pruned; the upsert is left-anti + union +
  * dynamic partition overwrite — only touched partitions rewrite, which is
  * the Spark-native equivalent of the reference's per-row
  * insert-or-reuse (pipeline.py:181-198) without a transactional store.
  */
object Ingest {

  /** q181: the incremental-rebuild epilogue as ONE hash-checked
    * accounting frame — the batch-equivalent of `incrementalLakeIngest`
    * + fp-index update, mirroring the reference's per-month
    * process-only-the-new-month loop (pipeline.py:219-226): the lake is
    * the already-ingested 80% of doc_id (q92's high-watermark
    * convention), the increment is the new band, and the output is the
    * per-source ingest report the reference logs — raw rows seen,
    * rows ingested after dedup against the lake's fingerprint index
    * AND within the batch (first-occurrence keeper), rows dropped, plus
    * the index size before/after the update.
    *
    * Scale: fingerprints are scan-stage expressions; the lake index and
    * batch dedup are ONE distinct + ONE left-anti + ONE min(struct)
    * aggregate (all map-side combinable, no windows — q89's hot-fp
    * rule); the accounting itself operates on |sources|-sized
    * aggregates; index sizes are two scalar aggs broadcast back. All
    * integer arithmetic — no cross-engine float surface.
    *
    * Both reused frames are EAGERLY materialized (round-9 cache-
    * lifetime discipline): the fp index is read twice (anti-join +
    * size) and the batch twice (dedup + raw counts) — without the
    * checkpoint each read re-scans the documents table and re-hashes
    * full text, which at 100 TB means re-reading the corpus to save a
    * ~fp-index-sized materialization (in production the lake index is
    * a persisted table, exactly what the checkpoint stands in for).
    */
  def q181MonthRebuild(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val cut = docs.agg(floor(max("doc_id") * 0.8).cast("long").as("cut"))
    val fped = docs.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("source"), col("cut"),
        graft.dedup.Dedup.canonicalFingerprint(col("text")).as("fp"))
    val lakeFps = fped.filter(col("doc_id") <= col("cut")).select("fp").distinct()
      .localCheckpoint(true)
    val batch = fped.filter(col("doc_id") > col("cut"))
      .select("doc_id", "source", "fp")
      .localCheckpoint(true)
    val fresh = batch.join(lakeFps, Seq("fp"), "left_anti")
    // keeper per new fingerprint = min doc_id; its source rides along in
    // the struct (doc_id is unique, so min(struct) is the min-id row)
    val kept = fresh.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("source"))).as("w"))
      .select(col("w.source").as("source"))
    val rawBySrc = batch.groupBy("source").agg(count(lit(1)).as("n_raw"))
    val ingBySrc = kept.groupBy("source").agg(count(lit(1)).as("n_ingested"))
    val idxBefore = lakeFps.agg(count(lit(1)).as("idx_before"))
    val nNew = kept.agg(count(lit(1)).as("n_new"))
    rawBySrc.join(ingBySrc, Seq("source"), "left_outer")
      .na.fill(0L, Seq("n_ingested"))
      .crossJoin(broadcast(idxBefore))
      .crossJoin(broadcast(nNew))
      .select(col("source"), col("n_raw"), col("n_ingested"),
        (col("n_raw") - col("n_ingested")).as("n_dropped"),
        col("idx_before"), (col("idx_before") + col("n_new")).as("idx_after"))
      .orderBy("source")
  }

  /** Write a month-partitioned corpus (dual-write shape of
    * pipeline.py:66-93 collapses to ONE partitioned dataset; the
    * per-article view is a filter, not a second copy).
    */
  def writePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("year", date_format(col(tsCol), "yyyy"))
      .withColumn("month", date_format(col(tsCol), "MM"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year", "month")
      .parquet(path)

  /** Write with in-flight metrics via `Dataset.observe` — the running
    * pipeline-stats shape (stats_tracker.py's counters, q1's batch
    * form) collected DURING the write itself: the observe node
    * accumulates row count / token sum / null count as partitions
    * stream through the writer, so the stats cost ZERO extra scans —
    * the naive form (write, then re-read to count) reads the data
    * twice, which at 100 TB is the difference between metrics being
    * free and metrics being a second job. Returns (rows, tokenSum,
    * nullTexts) from the completed write.
    */
  def observedWrite(df: DataFrame, textCol: String, path: String): (Long, Long, Long) = {
    // Observation (a QueryExecutionListener under the hood), not
    // df.observe(name,...) + queryExecution.observedMetrics: the write
    // command runs as its OWN execution, so the original frame's
    // queryExecution never executes and its metrics map stays empty
    val obs = org.apache.spark.sql.Observation("ingest_stats")
    df.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(graft.text.TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val m = obs.get
    (m("n_rows").asInstanceOf[Long], m("n_tokens").asInstanceOf[Long],
      m("n_null").asInstanceOf[Long])
  }

  /** Idempotent upsert keyed by `keyCol`: existing rows win (the
    * reference short-circuits on existing pmid, pipeline.py:135,158).
    * Dynamic partition overwrite rewrites only the partitions the new
    * batch touches.
    */
  def upsertByKey(spark: SparkSession, newRows: DataFrame, path: String,
                  keyCol: String, tsCol: String): Unit = {
    val existing =
      try spark.read.parquet(path).drop("year", "month")
      catch { case _: Throwable => null }
    val fresh =
      if (existing == null) newRows
      else newRows.join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")
    val all = if (existing == null) fresh else {
      // restrict the union to partitions the fresh rows touch; dynamic
      // overwrite leaves every other partition untouched
      val touched = fresh.select(date_format(col(tsCol), "yyyy-MM").as("p")).distinct()
      val kept = existing.join(
        touched, date_format(existing(tsCol), "yyyy-MM") === touched("p"), "left_semi")
      fresh.unionByName(kept)
    }
    all.withColumn("year", date_format(col(tsCol), "yyyy"))
      .withColumn("month", date_format(col(tsCol), "MM"))
      .write.mode(SaveMode.Overwrite)
      // per-write option, NOT a session conf: the old
      // `spark.conf.set("...partitionOverwriteMode", "dynamic")` here
      // leaked the mode to every later overwrite on the caller's
      // session (the q143-class session-conf leak, write-path form)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month")
      .parquet(path)
  }

  /** Day-partitioned lake write + pruned single-day read-back: the
    * executed-plan proof of the §1.3/§2.11 partition story (reference
    * pipeline.py:75, fetch_clean.py:35-53). The fixture's events span one
    * month, so day granularity gives a ~30-directory lake; the read back
    * filters on literal partition values, which must reach the scan as
    * PartitionFilters — only that day's files are listed or read
    * (PlanShapeSpec asserts `inputFiles` ⊆ the one partition directory).
    * At 100 TB this is the difference between scanning 3 TB and 100 TB.
    *
    * The write runs on every call (the lake is rebuilt from the current
    * fixture, never trusted stale), so the registered query times
    * sink + pruned source together — an honest ingest-then-read cost.
    */
  def q71PartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val lake = s"/tmp/graft_lake/${new java.io.File(dir).getName}/events_daily"
    val ev = graft.Tables.events(spark, dir)
    ev.withColumn("year", date_format(col("ts"), "yyyy").cast("int"))
      .withColumn("month", date_format(col("ts"), "MM").cast("int"))
      .withColumn("day", date_format(col("ts"), "dd").cast("int"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("year", "month", "day")
      .parquet(lake)
    // target day = earliest event date; collect the SCALAR (not data) as a
    // string so no java.sql.Date default-timezone conversion can shift it
    val Array(y, m, d) = ev.agg(date_format(min(to_date(col("ts"))), "yyyy-M-d"))
      .head().getString(0).split("-").map(_.toInt)
    prunedDayRead(spark, lake, y, m, d)
  }

  /** The pruned read-back half of q71 (separate so the plan test can point
    * at exactly this frame).
    */
  def prunedDayRead(spark: SparkSession, lake: String,
                    y: Int, m: Int, d: Int): DataFrame =
    spark.read.parquet(lake)
      .filter(col("year") === y && col("month") === m && col("day") === d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")

  /** Per-chunk JSON small-file sink (text_cleaner.py:171-205): the
    * reference's `process_jsonl` loop writes ONE JSON file per chunk
    * (`{id: "<pmid>_<i>", title, chunks: [chunk]}`). Spark-first this is
    * a distributed `df.write.json` with `maxRecordsPerFile` as the
    * governed small-file knob — one record per file reproduces the
    * reference shape exactly, with no driver-side loop; at 100 TB you
    * raise `maxRecordsPerFile` (e.g. 10k) and the SAME writer produces
    * sanely-sized files, which the reference's per-record `open()` never
    * can. Executors write files in parallel; the filesystem, not the
    * driver, is the only fan-in.
    */
  def chunkJsonSink(records: DataFrame, out: String,
                    maxRecordsPerFile: Int = 1): Unit =
    records.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .json(out)

  /** The chunk records the reference sink writes, derived from the
    * documents table (source stands in for title; 100-word chunks as in
    * q19). Separate from the writer so the test and the registered query
    * share one definition.
    */
  def chunkRecords(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(graft.text.Chunker.wordChunks(col("text"), 100)))
      .select(concat(col("doc_id"), lit("_"), col("pos")).as("id"),
        col("source").as("title"),
        array(col("col")).as("chunks"))

  /** Registered round-trip: write the per-chunk JSON files, read them
    * back, flatten — must hash-match the same records computed directly
    * in SQL, proving the sink preserves content exactly, not just that
    * files appeared.
    *
    * The registered run uses `maxRecordsPerFile = 1000` — the governed
    * bucketed form you would actually deploy (measured: the literal
    * one-file-per-record shape costs ~8 ms/file ≈ 40 s for sf0.1's 5k
    * chunks, pure filesystem churn). The reference's exact one-record-
    * per-file shape is the SAME writer with cap 1 and is pinned on disk
    * by PipelineSpec at test scale. (Local-mode scratch path: a cluster
    * deployment points `out` at shared storage, as executors write.)
    */
  def q72ChunkJsonFiles(spark: SparkSession, dir: String): DataFrame = {
    // session-stable scratch (cleared per invocation): repeated runs
    // reuse one directory instead of stacking a copy per call
    val tmp = graft.TempDirs.scratch("q72_chunk_json")
    val out = tmp.resolve("chunks").toString
    chunkJsonSink(chunkRecords(spark, dir), out, maxRecordsPerFile = 1000)
    spark.read.schema("id STRING, title STRING, chunks ARRAY<STRING>")
      .json(out)
      .select(col("id"), col("title"), col("chunks").getItem(0).as("chunk"))
      .orderBy("id")
  }

  /** Checkpointed incremental lake ingest: the true streaming form of
    * the reference's per-month incremental rebuild (pipeline.py's
    * "process only the new month" loop). A file-source stream over the
    * landing directory writes day-partitioned parquet with a checkpoint;
    * `Trigger.AvailableNow` drains whatever is new and stops. Because
    * the checkpoint records which source files are done, a re-run after
    * new files land reads ONLY the new files — no bookkeeping table, no
    * full-rebuild, and the lake stays partition-pruned for readers
    * (q71's story). PipelineSpec proves the increment: the second run's
    * input rows equal the new file's rows, not the total.
    */
  def incrementalLakeIngest(spark: SparkSession, srcDir: String,
                            lake: String, ckpt: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = graft.Tables.rewrapNanos(spark.read.parquet(srcDir).schema)
    graft.Tables.tsToMicros(spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir))
      .withColumn("year", date_format(col("ts"), "yyyy").cast("int"))
      .withColumn("month", date_format(col("ts"), "MM").cast("int"))
      .withColumn("day", date_format(col("ts"), "dd").cast("int"))
      .writeStream
      .partitionBy("year", "month", "day")
      .format("parquet").option("path", lake)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Partition columns of a Hive-layout parquet directory, in nesting
    * order, detected from the first `name=value` child chain (e.g.
    * `year=2024/month=3/day=1` → Seq("year","month","day")). Empty for
    * an unpartitioned directory.
    */
  def partitionColumnsOf(path: String): Seq[String] = {
    @annotation.tailrec
    def loop(d: java.io.File, acc: Vector[String]): Vector[String] =
      Option(d.listFiles).toSeq.flatten
        .find(f => f.isDirectory && f.getName.contains("=")) match {
        case Some(c) => loop(c, acc :+ c.getName.takeWhile(_ != '='))
        case None => acc
      }
    loop(new java.io.File(path), Vector.empty)
  }

  /** Small-file compaction for a parquet directory — the maintenance op
    * every long-lived lake needs (streaming ingest and per-chunk sinks
    * both accrete files; a 100 TB table with millions of KB-sized files
    * spends its scan time on open/footer overhead, not data).
    * Partition-aware: a Hive `year=/month=/day=` layout (what
    * `incrementalLakeIngest` writes) is detected from the directory
    * chain and preserved via `partitionBy` — flattening it would
    * silently destroy partition pruning (q71) and directory bookkeeping
    * (`nextMissingMonth`). Partitioned lakes compact to ONE file per
    * leaf partition (repartition on the partition columns hashes each
    * leaf's rows to a single task — the minimum file count that keeps
    * the layout; a leaf bigger than targetFileBytes would need a salt
    * column to split further, which small-file compaction by definition
    * doesn't face). Unpartitioned directories compact to
    * ceil(bytes / targetFileBytes) files. Both via `repartition` (an
    * exchange — upstream stays parallel, unlike `coalesce(1)` which
    * would collapse the read). Returns (filesBefore, filesAfter).
    * Writes to a temp sibling first, then promotes via the rename-aside
    * `swapInto` — a crash at ANY step leaves a complete copy on disk
    * (live, `.old`, or `.compact_tmp`), never a window with no data. A
    * true atomic swap needs a transactional table layer (the
    * manifest-pointer flip that Iceberg/Delta provide); plain parquet
    * directories cannot do better than recoverable-by-construction.
    */
  def compactLake(spark: SparkSession, path: String,
                  targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquets(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) parquets(f)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      }
    val dir = new java.io.File(path)
    val before = parquets(dir)
    val totalBytes = before.map(_.length).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val partCols = partitionColumnsOf(path)
    val tmp = path + ".compact_tmp"
    val compacted =
      if (partCols.isEmpty) df.repartition(nFiles)
      else df.repartition(partCols.map(col): _*)
    val writer = compacted.write.mode(SaveMode.Overwrite)
    (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
      .parquet(tmp)
    swapInto(path, tmp)
    (before.size, parquets(dir).size)
  }

  /** Promote `stagedPath` into `livePath` by rename-aside: live moves to
    * `live.old`, staging renames into place, the aside copy is deleted
    * last. A crash between any two steps leaves a COMPLETE copy on disk
    * (live, or live.old + staging) — unlike delete-then-rename, which
    * has a window where the only data is the staging dir. Renames are
    * same-filesystem by construction (siblings); a failed promote
    * restores the aside copy before throwing, so live keeps serving.
    */
  private def swapInto(livePath: String, stagedPath: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    val live = new java.io.File(livePath)
    val staged = new java.io.File(stagedPath)
    val aside = new java.io.File(livePath + ".old")
    rm(aside) // leftover aside from a previously crashed swap
    if (live.exists() && !live.renameTo(aside))
      throw new IllegalStateException(s"swap: cannot move $livePath aside")
    if (!staged.renameTo(live)) {
      aside.renameTo(live) // restore: live data keeps serving
      throw new IllegalStateException(s"swap: cannot promote $stagedPath into $livePath")
    }
    rm(aside)
  }

  /** Write–Audit–Publish: the lakehouse promotion gate. The dataset is
    * written to a STAGING path, the caller's audit runs against the
    * staged (post-write, post-encoding) data, and only a fully passing
    * audit promotes staging into the live path via the rename-aside
    * `swapInto` (a crash mid-publish leaves a complete recoverable
    * copy — see its doc; true atomicity needs a transactional table
    * layer). On ANY violation the live data is untouched and staging is
    * kept for inspection — failed audits must be debuggable, not
    * vanish. Returns the violating (table, check) rows (empty =
    * published).
    *
    * The audit contract: a function from the STAGED DataFrame to a
    * DataFrame with an `n_violations` column (e.g. built from
    * `Relational.contractChecks`) — auditing the staged copy catches
    * writer-side corruption that auditing the in-memory frame would
    * miss.
    */
  def writeAuditPublish(spark: SparkSession, df: DataFrame, path: String,
                        audit: DataFrame => DataFrame): Seq[(String, String, Long)] = {
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val violations = audit(spark.read.parquet(staging))
      .filter(col("n_violations") > 0)
      .select(col("table_name"), col("check_name"), col("n_violations"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    if (violations.isEmpty) swapInto(path, staging)
    violations
  }

  /** Next missing month in a range (fetch_clean.py:35-53's low-watermark
    * scan): first (year, month) with no partition directory.
    */
  def nextMissingMonth(spark: SparkSession, path: String,
                       months: Seq[(Int, Int)]): Option[(Int, Int)] = {
    val existing: Set[(Int, Int)] =
      try {
        spark.read.parquet(path)
          .select(col("year").cast("int"), col("month").cast("int"))
          .distinct().collect()
          .map(r => (r.getInt(0), r.getInt(1))).toSet
      } catch { case _: Throwable => Set.empty }
    months.find(m => !existing.contains(m))
  }
}
