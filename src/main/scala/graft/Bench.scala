package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at the driver-set scale
  * factor on local[32] and prints ONE JSON line with per-query seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-loop subset: SPARK_GRAFT_ONLY=q125_pagerank,... times just
    // those (mirrors Verify; the driver never sets it, so the official
    // bench is always the full catalog)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // JVM + Janino-codegen warmup: run every query once on the smallest
    // fixture so measured times reflect steady-state execution (generated
    // class compilation dominates first runs — 19 s vs 2.7 s observed on
    // the shingle-join query), not class loading
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache() // operator-internal caches must not pile up
    }
    // a crashed query must never be mistaken for a fast one: each entry
    // records {seconds, ok}, failures are listed by name in the JSON line
    // and echoed (with the exception) on stderr.
    // MEDIAN OF 3: this VM's run-to-run wall-time variance is 1.5-2x
    // (round 3's official single-run artifact "regressed" 22 queries
    // that an immediate re-run erased) — each query runs `reps` times
    // and the official per-query number is the median; raw runs stay in
    // the JSON so variance is visible, not discarded.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val results = selected.map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // clear operator-internal caches AFTER timing: a query pays for
        // its own caching, but 71 queries' dead cache entries must not
        // GC-thrash the queries that follow (measured: ~1.5x slowdown)
        spark.catalog.clearCache()
        (elapsed, ok)
      }
      // true median: average the two middle elements when reps is even
      // (sorted(reps/2) alone would silently pick the upper-middle)
      val sorted = runs.map(_._1).sorted
      val median =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      (name, median, runs)
    }
    // the round-6 artifact lost half the catalog: the single stdout JSON
    // line (medians + raw runs for 152 queries) exceeded the driver's
    // tail capture, so BENCH_r06.json recorded "parsed": null and only
    // q70-q99 survived in the tail. Two changes keep every query:
    //  - stdout gets ONE compact medians-only line (3-decimal seconds,
    //    ~3.5 KB for the full catalog) so the tail capture holds it all;
    //  - the full artifact (raw per-rep runs included) is written to
    //    bench.json in the working directory for round-over-round diffs.
    def fmt(d: Double): String = f"$d%.3f"
    // STDOUT BYTE BUDGET (round-10 fix): the driver's artifact keeps the
    // last ~2.1 KB of stdout INCLUDING sbt's trailing "[success] ..."
    // line (~75 B). Round 9's compact line ("qNN" keys, 3-decimal
    // values) was ~2.18 KB at 165 queries, so its first ~14 entries fell
    // off the front and BENCH_r09.json recorded "parsed": null. The
    // stdout map now uses the bare query NUMBER as key ("104") and
    // 2-decimal trailing-zero-stripped seconds ("0.46", "2.4"), with the
    // sf shortened to its basename — 1.77 KB at 165 queries, ~1.92 KB
    // projected at 180, inside the window with margin. bench.json
    // (written below) keeps full names, 3-decimal medians, and raw
    // per-rep runs; BENCH_rN.json must parse standalone without it.
    def fmtShort(d: Double): String = {
      val s = f"$d%.2f".reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      if (s.isEmpty) "0" else s
    }
    val shortName: Map[String, String] = {
      val pref = results.map { case (k, _, _) =>
        k -> k.split("_")(0).stripPrefix("q")
      }.toMap
      val collide = pref.values.groupBy(identity).collect {
        case (p, occ) if occ.size > 1 => p
      }.toSet
      pref.map { case (k, p) => k -> (if (collide(p)) k else p) }
    }
    val raw = results.map { case (k, _, runs) =>
      "\"" + k + "\":[" + runs.map(r => fmt(r._1)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // a query that failed on ANY rep is reported failed
    val failedNames = results.collect { case (k, _, runs) if runs.exists(!_._2) => k }
    val failed = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val nFailed = failedNames.size
    if (nFailed > 0)
      System.err.println(s"[bench] $nFailed quer${if (nFailed == 1) "y" else "ies"} FAILED")
    val total = results.map(_._2).sum
    val qsFull = results.map { case (k, m, _) => "\"" + k + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    val sfShort = sfDir.stripSuffix("/").split("/").last
    // SELF-GUARDING byte budget (round-11 item: BENCH_r11 "parsed" was
    // null because the 180-query compact line overran the 2000-byte
    // window by the width of sbt's [success] line — now suppressed via
    // showSuccess := false, but the guard must not depend on that):
    // build the compact line at 2-decimal precision; if the catalog has
    // grown it past the budget, degrade ≥1 s values to 1 decimal (their
    // precision lives in bench.json anyway), and as a last resort every
    // value to 1 decimal. Loudly impossible to overrun silently.
    def fmtCoarse(d: Double): String =
      if (d >= 1.0) fmtShort(math.rint(d * 10) / 10) else fmtShort(d)
    def fmt1(d: Double): String = fmtShort(math.rint(d * 10) / 10)
    def compactLine(fv: Double => String): String = {
      val qs = results.map { case (k, m, _) => "\"" + shortName(k) + "\":" + fv(m) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmtShort(total)},"unit":"sec","queries":$qs,"reps":$reps,"failed":$failed,"sf":"$sfShort"}"""
    }
    val budget = 1900
    val compact = Seq(fmtShort _, fmtCoarse _, fmt1 _).map(compactLine)
      .find(_.length <= budget)
      .getOrElse {
        System.err.println("[bench] compact line exceeds the stdout tail " +
          "budget even at 1-decimal precision — driver parse WILL truncate")
        compactLine(fmt1)
      }
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsFull,"runs":$raw,"reps":$reps,"failed":$failed,"n_failed":$nFailed,"sf":"$sfDir"}"""
    println(compact)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
