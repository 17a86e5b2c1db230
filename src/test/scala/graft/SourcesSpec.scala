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
