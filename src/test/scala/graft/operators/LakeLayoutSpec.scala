package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LakeLayoutSpec extends SparkSpec {

  test("compaction plan conserves files and bytes and packs bins to the target") {
    import spark.implicits._
    // two sources with known file sizes: src_a has files of 100..1 bytes
    // (heavy head), src_b one oversized file + dust
    val docs = ((1 to 100).map(i => (i.toLong, "t", "en", "src_a", (101 - i).toLong)) ++
      Seq((200L, "t", "en", "src_b", 900L), (201L, "t", "en", "src_b", 5L),
        (202L, "t", "en", "src_b", 5L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // filesPerSource > max docs per source => every doc is its own file
    val plan = LakeLayout.compactionPlan(docs, targetBytes = 300L, filesPerSource = 1024)
      .collect()
    val bySource = plan.groupBy(_.getString(0))
    // conservation: bytes and file counts survive the grouping
    assert(bySource("src_a").map(_.getLong(3)).sum == (1 to 100).sum)
    assert(bySource("src_a").map(_.getLong(2)).sum == 100)
    assert(bySource("src_b").map(_.getLong(3)).sum == 910)
    // local reference: replay the size-desc running-sum binning
    def referenceBins(sizes: Seq[Long], target: Long): Map[Long, (Long, Long)] = {
      var cum = 0L
      sizes.sorted(Ordering[Long].reverse).map { s =>
        val bin = cum / target; cum += s; (bin, s)
      }.groupBy(_._1).map { case (b, xs) => b -> (xs.size.toLong, xs.map(_._2).sum) }
    }
    val expA = referenceBins((1L to 100L), 300L)
    val gotA = bySource("src_a").map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotA == expA)
    // the oversized src_b file fills bins 0..2 alone (bin ids can skip);
    // the dust lands in bin 3 = 900 div 300
    val gotB = bySource("src_b").map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotB == Map(0L -> (1L, 900L), 3L -> (2L, 10L)))
  }

  test("z-order files stay narrow on BOTH dimensions; row-major spans the full second axis") {
    val stats = LakeLayout.zorderStats(graft.Tables.events(spark, sfDir))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (znf, zx, zy) = stats("zorder")
    val (rnf, rx, ry) = stats("rowmajor")
    assert(znf > 0 && rnf > 0)
    // row-major is (near-)optimal on its sort axis but each of its files
    // spans ~the full y range; z-order trades a wider x for a y span
    // orders of magnitude tighter — the whole point of the layout
    assert(zy.toDouble / znf < ry.toDouble / rnf / 2,
      s"z-order mean y-span ${zy / znf} must be well under row-major's ${ry / rnf}")
    assert(rx <= zx)
  }

  test("zValue is the bit interleave of the two 8-bit coordinates") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (1L, 2L), (170L, 85L), (37L, 201L))
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), graft.pipeline.Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == cases.map { case (x, y) => (x, y) -> morton(x, y) }.toMap)
    // corners: (255,255) fills all 16 bits; interleave is a bijection on the grid
    assert(got((255L, 255L)) == 65535L)
    assert(got.values.toSet.size == cases.size)
  }

  test("zorderStats runs end-to-end on a hand fixture with known grid coordinates") {
    import spark.implicits._
    // user_id ≡ x (mod 256), epoch hour ≡ y (mod 256): one tight z-cluster
    // and one far corner — both layouts produce 2+ files, spans stay exact
    val ev = Seq((0L, 3L, 5L), (1L, 3L, 6L), (2L, 250L, 250L)).map {
      case (i, yy, xx) =>
        (i, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(yy * 3600)), xx)
    }.toDF("event_id", "ts", "user_id")
    val stats = LakeLayout.zorderStats(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // zorder: (5,3)->z=39,(6,3)->z=46 share file 0 (spans 2,1); (250,250)->file 62
    assert(stats("zorder") == (2L, (2L + 1L), (1L + 1L)))
    // rowmajor: files (5*256+3)/1024=1, (6*256+3)/1024=1, (250*256+250)/1024=62
    assert(stats("rowmajor") == (2L, (2L + 1L), (1L + 1L)))
  }

  test("zoneMapEffect: hand fixture — scattered zones read everything, clustered zones prune") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    // values 0..99 in two layouts: scattered = round-robin over 4 files
    // (every zone spans ~the full range → all read), clustered = value
    // quartiles (only the file holding [25,49] is read)
    val df = (0L to 99L).map(v => (v, v)).toDF("id", "v")
    val scattered = LakeLayout.zoneMapEffect(
      df, "scattered", expr("id % 4"), col("v"), 30L, 40L).head()
    assert(scattered.getAs[Long]("n_files") === 4L)
    assert(scattered.getAs[Long]("files_read") === 4L)
    assert(scattered.getAs[Long]("rows_scanned") === 100L)
    assert(scattered.getAs[Long]("rows_matched") === 11L)
    assert(scattered.getAs[Long]("prune_bp") === 0L)
    val clustered = LakeLayout.zoneMapEffect(
      df, "clustered", expr("v div 25"), col("v"), 30L, 40L).head()
    assert(clustered.getAs[Long]("files_read") === 1L)
    assert(clustered.getAs[Long]("rows_scanned") === 25L)
    assert(clustered.getAs[Long]("rows_matched") === 11L)
    assert(clustered.getAs[Long]("prune_bp") === 7500L)
    // amplification: 25 rows scanned for 11 matched = 227 (×100, floor)
    assert(clustered.getAs[Long]("amplification_x100") === 227L)
  }

  test("q199 on the fixture: clustered layout strictly dominates arrival") {
    val rows = LakeLayout.q199ZonemapPrune(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val (a, c) = (rows("arrival"), rows("clustered"))
    // same query, same truth: matched rows identical across layouts
    assert(a.getAs[Long]("rows_matched") === c.getAs[Long]("rows_matched"))
    assert(c.getAs[Long]("prune_bp") >= a.getAs[Long]("prune_bp"))
    assert(c.getAs[Long]("amplification_x100") <= a.getAs[Long]("amplification_x100"))
  }
}
