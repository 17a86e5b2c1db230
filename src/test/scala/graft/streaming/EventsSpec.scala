package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, explode, lower, split, trim}

/** The streaming twins must reproduce their batch (oracle-checked) forms. */
class EventsSpec extends SparkSpec {

  test("streaming tumbling windows equal the batch q33 result") {
    val q = Events.streamingTumbling(spark, sfDir, "stream_tumbling")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_tumbling")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = Events.q33Tumbling(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming readers adapt to a directory-layout (multi-file) table") {
    // Two physical layouts exist for the same logical table: the fixture
    // ships events.parquet as ONE file, while a Spark-written lake ships
    // a DIRECTORY of part files. The round-7 sf1 rehearsal caught a
    // file-only assumption here (the glob matched no files inside the
    // directory, so the stream was silently empty); Tables.streamTable
    // now probes the layout. Pin that a directory-layout copy streams to
    // exactly the single-file batch result.
    val tmp = graft.TempDirs.scratch("dir_layout").toString
    graft.Tables.eventsRaw(spark, sfDir).repartition(3)
      .write.parquet(s"$tmp/events.parquet")
    val q = Events.streamingTumbling(spark, tmp, "dir_layout_tumbling")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dir_layout_tumbling")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = Events.q33Tumbling(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sliding windows equal the batch q34 result") {
    val q = Events.streamingSliding(spark, sfDir, "stream_sliding")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_sliding")
      .orderBy("wstart", "event_type").collect().toSeq
    val batch = Events.q34Sliding(spark, sfDir).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sessions emit exactly the closed batch sessions") {
    val q = Events.streamingSessions(spark, sfDir, "stream_sessions")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_sessions")
      .select("user_id", "session_start_s", "session_end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Events.q35Sessions(spark, sfDir)
      .select("user_id", "session_start_s", "session_end_s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty)
    // every emitted session is a true batch session (the final open
    // session per user flushes only on timeout, so ⊆ not =)
    assert(streamed.subsetOf(batch), s"${streamed.diff(batch).take(3)} not in batch")
    // and all but at most one session per user were emitted
    val users = batch.map(_._1)
    assert(streamed.size >= batch.size - users.size)
  }

  test("stream-stream range join equals the batch range join") {
    import org.apache.spark.sql.functions._
    val q = Events.streamStreamRangeJoin(spark, sfDir, "stream_range_join")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_range_join")
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", unix_timestamp(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("tss").as("p_tss"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("tss").as("s_tss"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("s_tss") <= col("p_tss") &&
          col("s_tss") >= col("p_tss") - 7L * 24 * 3600)
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("left-outer stream-stream range join: matches equal batch, nulls emit at watermark proof") {
    import org.apache.spark.sql.functions._
    val q = Events.streamStreamRangeJoinLeftOuter(spark, sfDir, "lo_range")
    q.awaitTermination()
    val rows = spark.table("lo_range").collect()
      .map(r => (r.getAs[Long]("purchase_id"),
        Option(r.getAs[java.lang.Long]("signup_id")).map(_.toLong)))
    spark.catalog.dropTempView("lo_range")
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", unix_timestamp(col("ts")))
      .select("event_id", "user_id", "event_type", "tss").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("tss")))
    val signups = ev.filter(_._3 == "signup")
    val purchases = ev.filter(_._3 == "purchase")
    val matchedBatch = (for {
      p <- purchases
      s <- signups
      if s._2 == p._2 && s._4 <= p._4 && s._4 >= p._4 - 7L * 24 * 3600
    } yield (p._1, s._1)).toSet
    // matched rows equal the batch range join exactly
    assert(rows.collect { case (p, Some(s)) => (p, s) }.toSet == matchedBatch)
    // null rows: sound (truly unmatched in batch) ...
    val unmatchedBatch = purchases.map(_._1).toSet -- matchedBatch.map(_._1)
    val streamedNulls = rows.collect { case (p, None) => p }.toSet
    assert(streamedNulls.subsetOf(unmatchedBatch),
      "a null row for a purchase that HAS a signup in range would be wrong")
    // ... and complete for purchases provably closed before stream end:
    // the signup watermark ends at max(ts) - 1h; any unmatched purchase
    // a safety margin older than that must have emitted its null row
    val wm = ev.map(_._4).max - 3600
    val mustEmit = purchases.filter(p =>
      unmatchedBatch(p._1) && p._4 <= wm - 60).map(_._1).toSet
    assert(mustEmit.subsetOf(streamedNulls),
      s"${(mustEmit -- streamedNulls).size} provably-unmatched purchases never emitted")
    assert(streamedNulls.nonEmpty, "the fixture must contain unattributed purchases")
  }

  test("streaming as-of (q70) equals the custom batch as-of restricted to the 7-day window") {
    import org.apache.spark.sql.functions._
    val streamed = Events.q70StreamAsof(spark, sfDir)
      .select("purchase_id", "signup_id", "s_tss")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch reference: the oracle-checked custom as-of (q63), restricted
    // to matches whose signup falls inside the streaming join's 7-day
    // lookback (the inner-join twin has no row for out-of-range purchases)
    val batch = Events.q63AsofCustom(spark, sfDir)
      .filter(col("signup_id").isNotNull &&
        col("s_tss") >= col("p_tss") - 7L * 24 * 3600)
      .select("purchase_id", "signup_id", "s_tss")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // repeat invocation in the same session: the scratch dir is cleared
    // (incl. the checkpoint — a stale one would mark the sources done
    // and an AvailableNow re-run would emit NOTHING) and not re-created
    // under a fresh name, so repeated runs neither dwindle nor pile up
    val again = Events.q70StreamAsof(spark, sfDir)
      .select("purchase_id", "signup_id", "s_tss")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == batch, "second q70 invocation must reproduce the result")
  }

  test("streaming sketch profile equals the batch sketch bit-for-bit (HLL merge is order-free)") {
    import org.apache.spark.sql.functions._
    val q = Events.streamingSketchProfile(spark, sfDir, "stream_sketch")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_sketch")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("ndv_users"))
      .select(col("w.start"), col("n"), col("ndv_users"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "micro-batch-merged HLL must equal the batch HLL exactly")
    // and the sketch is honest: estimates within 5% of exact per window
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(countDistinct(col("user_id")).as("ndv"))
      .select(col("w.start"), col("ndv"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    streamed.foreach { case (w, _, est) =>
      val ex = exact(w)
      assert(math.abs(est - ex) <= math.max(2L, (ex * 0.05).toLong),
        s"window $w: estimate $est vs exact $ex")
    }
    spark.catalog.dropTempView("stream_sketch")
  }

  test("stream-static lake filter equals the batch anti-join; q92 = its first-keep subset") {
    import org.apache.spark.sql.functions._
    val streamed = Events.q100StreamLakeFilter(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val batchIncr = graft.operators.ScaleOps.q92IncrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(streamed.nonEmpty)
    // q92 additionally first-keeps within the batch, so it is a subset
    // with the same fp set
    assert(batchIncr.toSet.subsetOf(streamed.toSet))
    assert(streamed.map(_._2).toSet == batchIncr.map(_._2).toSet,
      "within-batch dedup must not change WHICH fps survive the lake filter")
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) keeps the batch key set") {
    val q = Events.streamingDedup(spark, sfDir, "stream_dedup")
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_dedup")
      .select("user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val batch = Events.q36DedupEvents(spark, sfDir)
      .select("user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(streamed.nonEmpty)
    // one survivor per key both ways; WHICH survivor is arrival-order-
    // dependent in the stream, so the contract is the key set
    assert(streamed.length == batch.length)
    assert(streamed.toSet == batch.toSet)
  }

  test("funnel enforces step order per user") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // u1 does view->click in order; u2 clicks BEFORE its first view (the
    // click must not count); u3 only views
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L),
      (2L, "click", 100L), (2L, "view", 200L),
      (3L, "view", 100L)
    ).toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Events.funnel(ev, Seq("view", "click")).head()
    assert(r.getLong(0) == 3, s"expected 3 viewers, got ${r.getLong(0)}")
    assert(r.getLong(1) == 1, s"expected 1 ordered clicker, got ${r.getLong(1)}")
  }

  test("batch dedup keeps exactly one row per key") {
    val deduped = Events.q36DedupEvents(spark, sfDir)
    val keys = deduped.select("user_id", "event_type", "value").distinct().count()
    assert(deduped.count() == keys)
  }

  test("gap fill: dense type x day grid, cells match brute force with zeros where absent") {
    import org.apache.spark.sql.functions.{col, to_date, date_format}
    val out = Events.q113GapFill(spark, sfDir).collect()
    val types = out.map(_.getAs[String]("event_type")).distinct
    val days = out.map(_.getAs[String]("day")).distinct.sorted
    assert(out.length == types.length * days.length, "the grid must be dense")
    // every calendar day in the span is present, even if the fixture
    // happens to have no gaps (sf0.001 is dense; the GRID is the point)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val (d0, d1) = (java.time.LocalDate.parse(days.head, fmt),
      java.time.LocalDate.parse(days.last, fmt))
    assert(days.length == java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1,
      "every day between min and max must appear")
    val truth = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        r.getAs[Long]("count")).toMap
    out.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[String]("day"))
      assert(r.getAs[Long]("n") == truth.getOrElse(key, 0L),
        s"cell $key must be the true count or a zero fill")
    }
  }

  test("interval join equals the brute-force containment scan") {
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", org.apache.spark.sql.functions.unix_timestamp(col("ts")))
      .select("event_id", "user_id", "tss", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("tss"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val windows = ev.filter(_._4 == "purchase")
      .sortBy(e => (-e._5, e._1)).take(5)
      .map(e => (e._1, e._3 - 1800L, e._3 + 1800L))
    val expected = windows.map { case (wid, s, epos) =>
      val in = ev.filter(e => e._3 >= s && e._3 < epos)
      (wid, s, epos, in.length.toLong, in.map(_._2).distinct.length.toLong,
        math.floor(in.map(_._5).sum * 100.0 + 0.5) / 100.0)
    }.sortBy(_._1).toSeq
    val got = Events.q119IntervalJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("window_id"), r.getAs[Long]("w_start"),
        r.getAs[Long]("w_end"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_users"),
        r.getAs[Double]("total_value"))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      expected.map(t => (t._1, t._2, t._3, t._4, t._5)),
      "bucketized join must equal the brute-force containment scan")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._6 - e._6) < 1e-9, s"window ${g._1} value sum drifted")
    }
    // each window contains at least its own anchor purchase
    assert(got.forall(_._4 >= 1))
  }

  test("changepoint: peak scaled CUSUM matches brute force; the statistic telescopes to zero") {
    import org.apache.spark.sql.functions.{col, to_date, date_format}
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"), r.getAs[Long]("count")))
    val expected = daily.groupBy(_._1).map { case (tpe, rows) =>
      val ordered = rows.sortBy(_._2)
      val d = ordered.length.toLong
      val t = ordered.map(_._3).sum
      var cum = 0L
      val s = ordered.zipWithIndex.map { case ((_, day, c), i) =>
        cum += c
        (day, d * cum - (i + 1) * t)
      }
      // telescoping: the last partial sum is D*T - D*T = 0 exactly
      assert(s.last._2 == 0L, s"type $tpe: S_D must telescope to zero")
      val peak = s.minBy { case (day, sv) => (-math.abs(sv), day) }
      (tpe, peak._1, math.abs(peak._2), d, t)
    }.toSeq.sorted
    val got = Events.q122Changepoint(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("cp_day"),
        r.getAs[Long]("peak_scaled_cusum"), r.getAs[Long]("n_days"),
        r.getAs[Long]("total"))).toSeq.sorted
    assert(got == expected)
    assert(got.forall(_._3 > 0), "a flat series would have no peak; the fixture is not flat")
  }

  test("scd2: versions dense, ranges chain, exactly one open current row per user") {
    val rows = Events.q123Scd2(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[Double]("value"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, hist) =>
      val ordered = hist.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1 to ordered.length),
        s"user $uid versions must be dense from 1")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4),
            s"user $uid v${a._2}: valid_to must equal the next valid_from")
          assert(!a._6, "only the last version may be current")
        case _ =>
      }
      val last = ordered.last
      assert(last._5.isEmpty && last._6,
        s"user $uid: the open row must have null valid_to and is_current")
    }
  }

  test("windowed aggregation state survives a checkpoint restart (exactly-once resume)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val tmp = graft.TempDirs.scratch("resume_test")
    val (srcDir, ckpt, sink) = (s"$tmp/src", s"$tmp/ckpt", s"$tmp/sink")
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    // split by TIME at an hh:30 point (not a window boundary, and never
    // behind run 1's final watermark — an event-id interleave would
    // deliver run-2 rows as late data and the watermark would correctly
    // drop them): the window containing tSplit gets rows from BOTH
    // runs, so its final count REQUIRES run 2 to restore run 1's state
    // choose the split hour from the data: an hour populated in BOTH
    // half-hours (a blind midpoint can land in a silent half-hour and
    // prove nothing), split at its hh:30
    val halves = ev.select((unix_timestamp(col("ts")) / 3600).cast("long").as("hr"),
        ((unix_timestamp(col("ts")) % 3600) < 1800).as("firstHalf"))
      .groupBy("hr").agg(
        sum(when(col("firstHalf"), 1).otherwise(0)).as("a"),
        sum(when(!col("firstHalf"), 1).otherwise(0)).as("b"))
      .filter(col("a") > 0 && col("b") > 0)
      .agg(min("hr")).head().getLong(0)
    val tSplit = halves * 3600 + 1800
    ev.filter(unix_timestamp(col("ts")) < tSplit).write.parquet(s"$srcDir/p1")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(s"$srcDir/*")
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("wstart"), col("n"))
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val afterRun1 = spark.read.parquet(sink).count()
    ev.filter(unix_timestamp(col("ts")) >= tSplit).write.parquet(s"$srcDir/p2")
    runOnce()
    val emitted = spark.read.parquet(sink).collect()
      .map(r => r.getAs[java.sql.Timestamp]("wstart") -> r.getAs[Long]("n"))
    // exactly-once: no window emitted twice across the two runs
    assert(emitted.map(_._1).distinct.length == emitted.length,
      "a window must be emitted exactly once across restarts")
    assert(emitted.length > afterRun1,
      "run 2 must close windows run 1 left open")
    // every emitted window's count covers BOTH halves of the split —
    // impossible unless run 2 resumed run 1's state from the checkpoint
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("n"))
      .collect().map(r => r.getAs[java.sql.Timestamp]("wstart") -> r.getAs[Long]("n"))
      .toMap
    assert(emitted.nonEmpty)
    emitted.foreach { case (w, n) =>
      assert(batch(w) == n,
        s"window $w: resumed count $n must equal the full-data batch count ${batch(w)}")
    }
    // the straddling window is the proof: both runs contributed to it,
    // and it can only be correct if run 2 restored run 1's state
    val straddle = new java.sql.Timestamp(tSplit / 3600 * 3600 * 1000L)
    val before = graft.Tables.events(spark, sfDir)
      .filter(unix_timestamp(col("ts")) >= tSplit - 1800 &&
        unix_timestamp(col("ts")) < tSplit).count()
    val after = graft.Tables.events(spark, sfDir)
      .filter(unix_timestamp(col("ts")) >= tSplit &&
        unix_timestamp(col("ts")) < tSplit + 1800).count()
    assert(before > 0 && after > 0,
      "the fixture must populate the straddling window on both sides of the split")
    assert(emitted.toMap.get(straddle).contains(batch(straddle)),
      s"straddling window $straddle must be emitted with the merged count")
  }

  test("snapshot diff classifies every user correctly vs brute force") {
    import org.apache.spark.sql.functions.{col, to_date, date_format}
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("day")))
    val days = ev.map(_._2).distinct.sorted
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val d0 = java.time.LocalDate.parse(days.head, fmt)
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      d0, java.time.LocalDate.parse(days.last, fmt))
    val aEnd = d0.plusDays(span * 4 / 5).format(fmt)
    val bStart = d0.plusDays(span / 5).format(fmt)
    def agg(rows: Array[(Long, String)]) = rows.groupBy(_._1)
      .map { case (u, es) => u -> (es.length.toLong, es.map(_._2).distinct.length.toLong) }
    val sa = agg(ev.filter(_._2 <= aEnd)); val sb = agg(ev.filter(_._2 >= bStart))
    val expected = (sa.keySet ++ sb.keySet).toSeq.sorted.map { u =>
      val status = (sa.get(u), sb.get(u)) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
      }
      (u, status, sa.get(u).map(_._1).getOrElse(0L), sb.get(u).map(_._1).getOrElse(0L))
    }
    val got = Events.q126SnapshotDiff(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("status"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toSeq
    assert(got == expected)
    assert(got.map(_._2).distinct.size >= 2,
      "overlapping windows on the fixture must yield more than one status")
  }

  test("event paths equal brute-force session trigram mining") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", unix_timestamp(col("ts")))
      .select("user_id", "event_id", "event_type", "tss").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("tss")))
    val paths = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      // split into sessions at >30 min gaps, mine trigrams per session
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, String, Long)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._4 - cur.head._4 <= 1800 => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse)
      sessions.foreach { s =>
        s.map(_._3).sliding(3).foreach {
          case Seq(a, b, c) =>
            val p = s"$a>$b>$c"; paths(p) = paths.getOrElse(p, 0L) + 1
          case _ =>
        }
      }
    }
    val expected = paths.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = Events.q131EventPaths(spark, sfDir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.head._2 >= got.last._2)
  }

  test("IQR outliers equal brute-force integer-rank quartile fences") {
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.events(spark, sfDir)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value")))
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.groupBy(_._1).toSeq.map { case (tpe, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length
      val q1 = sorted(math.ceil(n * 0.25).toInt - 1)
      val q3 = sorted(math.ceil(n * 0.75).toInt - 1)
      val (lo, hi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      (tpe, n.toLong, rnd4(q1), rnd4(q3),
        sorted.count(v => v < lo || v > hi).toLong)
    }.sortBy(_._1)
    val got = Events.q132IqrOutliers(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("q1"), r.getAs[Double]("q3"),
        r.getAs[Long]("n_outliers"))).toSeq
    assert(got == expected)
    assert(got.forall { case (_, n, q1, q3, out) => q1 <= q3 && out < n })
  }

  test("scd2 as-of snapshot returns exactly each user's version valid at t") {
    val hist = Events.q123Scd2(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong)))
    val got = Events.q135Scd2Asof(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[Long]("as_of")))
    assert(got.nonEmpty)
    val t = got.head._3
    assert(got.forall(_._3 == t), "one snapshot instant for the whole report")
    val expected = hist.filter { case (_, _, from, to) =>
      from <= t && to.forall(_ > t)
    }.map(h => (h._1, h._2)).sorted.toSeq
    assert(got.map(g => (g._1, g._2)).sorted.toSeq == expected)
    assert(got.map(_._1).distinct.length == got.length,
      "at most one valid version per user at any instant")
  }

  test("survival curve: starts at 10000 bp, non-increasing, matches brute-force tenure counting") {
    import org.apache.spark.sql.functions.{col, to_date, date_format}
    val users = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("d")))
      .groupBy(_._1).map { case (_, ds) =>
        val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
        val days = ds.map(x => java.time.LocalDate.parse(x._2, fmt))
        java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max).toInt
      }.toSeq
    val rows = Events.q137Survival(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("tenure_days"), r.getAs[Long]("n_surviving"),
        r.getAs[Long]("survival_bp")))
    assert(rows.head._3 == 10000L, "everyone survives to their first day")
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 <= a._2; case _ => true })
    rows.foreach { case (d, surv, _) =>
      assert(surv == users.count(_ >= d).toLong,
        s"day $d: survivors must be users with tenure >= $d")
    }
  }

  test("gap histogram: bucket counts match brute-force per-user gap binning") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", unix_timestamp(col("ts")))
      .select("user_id", "event_id", "event_type", "tss").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("tss")))
    val binned: Seq[(String, Int)] =
      ev.groupBy(e => (e._1, e._3)).toSeq.flatMap { case ((_, tpe), rows) =>
        rows.sortBy(r => (r._4, r._2)).map(_._4).toList.sliding(2).collect {
          case List(a, b) =>
            val gapMin = (b - a) / 60
            val bucket =
              if (gapMin <= 0) -1 else 63 - java.lang.Long.numberOfLeadingZeros(gapMin)
            (tpe, bucket)
        }.toList
      }
    val expected = binned.groupBy(x => x)
      .map { case ((tpe, b), v) => (tpe, b, v.size.toLong) }.toSeq.sorted
    val got = Events.q138GapHistogram(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("bucket"),
        r.getAs[Long]("n_gaps"))).toSeq.sorted
    assert(got == expected)
  }

  test("lateness audit matches a brute-force frontier walk") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", unix_timestamp(col("ts")))
      .select("event_id", "event_type", "tss").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("tss"))).sortBy(_._1)
    var frontier = Long.MinValue
    val lates = ev.map { case (_, tpe, tss) =>
      frontier = math.max(frontier, tss)
      (tpe, (frontier - tss) / 60)
    }
    val expected = lates.groupBy(_._1).toSeq.map { case (tpe, ls) =>
      val mins = ls.map(_._2)
      (tpe, mins.length.toLong, mins.count(_ > 0).toLong, mins.max,
        mins.count(_ <= 60).toLong * 10000L / mins.length)
    }.sortBy(_._1)
    val got = Events.q140LatenessAudit(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_late"), r.getAs[Long]("max_late_min"),
        r.getAs[Long]("admitted_1h_bp"))).toSeq
    assert(got == expected)
    // sf0.001 arrives perfectly ordered — zero lateness must read as
    // full admission, not vacuous success
    got.foreach { case (tpe, _, nLate, maxLate, bp) =>
      if (nLate == 0)
        assert(maxLate == 0 && bp == 10000L,
          s"$tpe: an in-order stream admits everything")
    }
  }

  test("ab funnel: arms partition users, steps monotone, arm sums equal the pooled funnel") {
    val rows = Events.q143AbFunnel(spark, sfDir).collect()
      .map(r => ((r.getAs[String]("step"), r.getAs[String]("arm")),
        (r.getAs[Long]("n_users"), r.getAs[Long]("arm_size"), r.getAs[Long]("cvr_bp"))))
      .toMap
    val total = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows(("view", "A"))._2 + rows(("view", "B"))._2 == total,
      "the two arms must partition the user population")
    for (arm <- Seq("A", "B")) {
      val Seq(v, c, p) = Seq("view", "click", "purchase").map(s => rows((s, arm))._1)
      assert(v >= c && c >= p, s"arm $arm: funnel must narrow monotonically")
      rows.filterKeys(_._2 == arm).values.foreach { case (n, sz, bp) =>
        assert(bp == n * 10000L / sz)
      }
    }
    val pooled = Events.q76Funnel(spark, sfDir).head()
    assert(rows(("view", "A"))._1 + rows(("view", "B"))._1 ==
      pooled.getAs[Long]("n_view_users"),
      "arm view counts must sum to the pooled funnel's")
  }

  test("attribution credits halve by recency and match a brute-force touch walk") {
    import org.apache.spark.sql.functions.{col, unix_timestamp, round}
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("tss", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("tss"),
        round(col("value"), 2).as("v")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("tss"), r.getAs[Double]("v")))
    def rnd4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val views = ev.filter(_._3 == "view")
    val expected = ev.filter(_._3 == "purchase").flatMap { p =>
      views.filter(v => v._2 == p._2 && v._4 < p._4 && v._4 >= p._4 - 3600)
        .sortBy(v => (-v._4, v._1)).zipWithIndex
        .map { case (v, i) => (p._1, v._1, i + 1, rnd4(p._5 / math.pow(2.0, i))) }
    }.sortBy(t => (t._1, t._3)).toSeq
    val got = Events.q144Attribution(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"),
        r.getAs[Int]("touch_rank"), r.getAs[Double]("credit"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // within a purchase, each credit is exactly half the previous one
    got.groupBy(_._1).values.filter(_.length > 1).foreach { touches =>
      touches.sortBy(_._3).sliding(2).foreach {
        case Seq(a, b) =>
          assert(math.abs(b._4 * 2 - a._4) <= 0.0002,
            s"purchase ${a._1}: rank ${b._3} credit must be half of rank ${a._3}'s")
        case _ =>
      }
    }
  }

  test("forward fill equals a per-user scan of the ordered history") {
    import org.apache.spark.sql.functions.{col, round}
    val rawValue = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), round(col("value"), 2).as("v")).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("v")).toMap
    val rows = Events.q114ForwardFill(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("tss"), r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("last_purchase_value")).map(_.toDouble)))
    rows.groupBy(_._2).foreach { case (_, evs) =>
      var carried: Option[Double] = None
      evs.sortBy(e => (e._3, e._1)).foreach { case (id, _, _, tpe, got) =>
        if (tpe == "purchase") carried = Some(rawValue(id))
        assert(got == carried, s"event $id: expected carry $carried, got $got")
      }
    }
    assert(rows.exists(_._5.isEmpty), "history before any purchase must stay null")
  }

  test("transition matrix: counts and row probabilities match a brute walk") {
    val rows = Events.q196TransitionMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // brute: per user, sort by (ts, event_id), count adjacent pairs
    val pairs: Seq[(String, String)] = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Timestamp](2).getTime, r.getString(3)))
      .groupBy(_._1).values.toSeq
      .flatMap { h =>
        val types = h.sortBy(e => (e._3, e._2)).map(_._4)
        types.zip(types.drop(1))
      }
    val brute = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.view.mapValues(_._1).toMap === brute)
    // row-conditional probabilities: integer bp of n over the from-total
    val fromTot = brute.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    rows.foreach { case ((f, t), (n, pBp)) =>
      assert(pBp === n * 10000 / fromTot(f), s"($f,$t)")
    }
    // every from-row's probabilities sum to ~10000 (floor rounding slack
    // bounded by the row's pair count)
    rows.groupBy(_._1._1).foreach { case (f, m) =>
      val s = m.values.map(_._2).sum
      assert(s <= 10000L && s > 10000L - m.size, s"row $f sums to $s")
    }
  }

  test("streaming CMS equals the batch sketch row-for-row") {
    val streamed = Events.q197CmsStream(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val batch = graft.operators.TextOps.countMinSketch(words, "w", 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
  }
}
