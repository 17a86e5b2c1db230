package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** binaryFile source + approximate sketches — the pieces with no exact
  * SQL oracle (binary ingestion, HLL, quantile sketch) pinned by
  * tolerance tests instead.
  */
class SourcesSpec extends SparkSpec {

  test("binaryFile source feeds the multimodal decoder") {
    val dir = Files.createTempDirectory("bin").toString
    Files.write(Paths.get(dir, "a.bin"), "alpha beta gamma".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "b.bin"), "delta epsilon".getBytes("UTF-8"))
    val bin = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
    assert(bin.count() == 2)
    // plumb binary payloads through the stub decoder
    val media = bin.select(
      monotonically_increasing_id().as("doc_id"),
      lit("image").as("media_type"),
      col("content").as("payload"))
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == 2)
    assert(decoded.forall(_.getAs[Int]("width") >= 64))
    val widths = decoded.map(r => r.getAs[Int]("n_bytes") -> r.getAs[Int]("width")).toMap
    assert(widths(16) == 64 + 16) // "alpha beta gamma" = 16 bytes
  }

  test("tsEpochSeconds floors pre-epoch timestamps in every layout") {
    import spark.implicits._
    // 1969-12-31T23:59:59.5Z must land in second -1 (floor), never 0
    // (truncation) — the semantics of unix_timestamp and DuckDB epoch()
    val asNanosLong = Seq(-500000000L, 1500000000L).toDF("ts")
    val gotLong = asNanosLong.select(Tables.tsEpochSeconds(asNanosLong).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(gotLong == Seq(-1L, 1L))
    val asTimestamp = Seq(-500000L, 1500000L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val gotTs = asTimestamp.select(Tables.tsEpochSeconds(asTimestamp).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(gotTs == Seq(-1L, 1L))
  }

  test("events reader rejects micros-magnitude values on a LONG ts layout") {
    import spark.implicits._
    // a LONG ts column is nanos by contract; 2020s micros (~1.7e15) are
    // below the 1e16 bound and must fail loudly, not read 1000x off
    val dir = Files.createTempDirectory("evmicros").toString
    Seq((1L, 1700000000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("micros-as-INT64"))
    // genuine nanos magnitudes pass the guard untouched
    val dir2 = Files.createTempDirectory("evnanos").toString
    Seq((1L, 1700000000000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    assert(Tables.events(spark, dir2).select("ts").head().getTimestamp(0).getTime
      == 1700000000000L)
  }

  test("ts normalization requires a UTC session for NTZ layouts") {
    import spark.implicits._
    val ntz = Seq(1700000000000000L).toDF("us")
      .select(expr("make_timestamp_ntz(2024, 1, 1, 0, 0, 0)").as("ts"))
    val tzConf = "spark.sql.session.timeZone"
    spark.conf.set(tzConf, "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](Tables.tsToMicros(ntz))
      assert(e.getMessage.contains("UTC"))
      val e2 = intercept[IllegalArgumentException](Tables.tsEpochSeconds(ntz))
      assert(e2.getMessage.contains("UTC"))
    } finally spark.conf.set(tzConf, "UTC")
    // back under UTC both paths work
    assert(Tables.tsToMicros(ntz).select("ts").head().getTimestamp(0) != null)
  }

  test("approx sketches land within tolerance of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct("l_partkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"HLL approx $approx vs exact $exact")

    val exactMedian = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val sketchMedian = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(sketchMedian - exactMedian) / exactMedian < 0.05)
  }
}
