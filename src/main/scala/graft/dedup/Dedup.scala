package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact/canonical
  * fingerprint dedup, exact n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (100 TB): every variant avoids the quadratic all-pairs
  * comparison. Exact dedup is a hash group-by (one shuffle on the
  * fingerprint). Jaccard pairs go through an inverted shingle index
  * (explode + equi-join on shingle) so only documents sharing a shingle
  * ever meet. MinHash-LSH reduces that further to band-bucket collisions —
  * the standard near-dup pass (e.g. the C4/RefinedWeb recipe). SimHash
  * bands its 64-bit signature into (d+1) chunks so the pigeonhole
  * principle guarantees recall at hamming distance ≤ d without an
  * all-pairs scan.
  */
object Dedup {

  /** Distinct word n-gram shingles as an array column; empty when the
    * document has fewer than n words.
    *
    * Implemented as a once-per-document scalar UDF: the equivalent
    * `transform(sequence(...), i -> concat_ws(slice(...)))` chain is a
    * CodegenFallback higher-order function interpreted per ELEMENT —
    * measured 10.6 s vs <0.5 s for 260k shingles. A per-row UDF with a
    * tight JVM loop wins when the per-element native form can't codegen.
    */
  def wordShingles(c: Column, n: Int = 3): Column = udf(shingleFn(n)).apply(c)

  private def shingleFn(n: Int): String => Array[String] = { text =>
    if (text == null) Array.empty[String]
    else {
      val words = text.trim.split("\\s+")
      if (words.length < n) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i <= words.length - n) {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
          seen.add(sb.toString)
          i += 1
        }
        seen.toArray(Array.empty[String])
      }
    }
  }

  /** Canonical fingerprint: md5 over the sorted distinct word set — the
    * "same bag of words" identity (order/duplication-insensitive exact dedup).
    */
  def canonicalFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(trim(c), "\\s+")))).cast("binary"))

  /** Exact-duplicate groups under a fingerprint column: one row per group
    * with >1 member: (fp, n_docs, keeper = min id).
    */
  def exactDupGroups(docs: DataFrame, idCol: String, fpCol: Column): DataFrame =
    docs.select(col(idCol), fpCol.as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper"))
      .filter(col("n_docs") > 1)
      .orderBy("fp")

  /** Exact n-gram Jaccard pairs ≥ threshold via the inverted shingle
    * index: join on shingle → per-pair intersection counts → union by
    * |A|+|B|−|A∩B|. Threshold applies to the ROUNDED score (oracle parity).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // carry each doc's shingle count THROUGH the join — set sizes ride
    // along with the pairs, so |A| and |B| need no extra count-joins
    val sh = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), n).as("shs"))
      .select(col("id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      .cache() // materialize the inverted index once; both join sides reuse it
    sh.as("a").join(sh.as("b"), "sh")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard.
    *
    * numPerms permutations h_i(s) = xxhash64(i, s); signature banded into
    * (numPerms / rowsPerBand) bands; candidate pairs collide on any band;
    * candidates are verified with exact Jaccard so the output equals
    * `jaccardPairs` whenever LSH recall holds (≥ 1 − (1 − t^r)^b — for
    * t = 0.9, r = 4, b = 16 the miss probability is ~3e-8).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numPerms: Int = 64, rowsPerBand: Int = 4,
                      threshold: Double = 0.8): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val sh = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), n).as("shs"))
      .select(col("id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
      .cache()
    // 64-permutation signature: one hash-agg pass over the inverted index
    val minhashCols = (0 until numPerms).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    val sig = sh.groupBy("id").agg(minhashCols.head, minhashCols.tail: _*)
    // band signatures: hash of each band's row slice
    val bandCols = (0 until numBands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(rows: _*).as("sig"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "sig"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard through the inverted index;
    // per-doc set sizes ride along, no extra count-joins
    sh.as("a").join(candidates.hint("broadcast"),
        col("a.id") === col("doc_a"))
      .join(sh.as("b"), col("b.id") === col("doc_b") && col("a.sh") === col("b.sh"))
      .groupBy(col("doc_a"), col("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash signatures: term-frequency-weighted ± votes per bit of
    * xxhash64(word), sign → bit.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"s$i"))
    val sums = tf.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 64).map(i =>
      when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), simhash.as("simhash"))
  }

  /** SimHash near-dup pairs at hamming distance ≤ maxDist, via pigeonhole
    * banding: split the 64-bit signature into (maxDist + 1) chunks — any
    * pair within distance d must agree on at least one chunk, so the
    * equi-join on (chunk_idx, chunk_value) has guaranteed recall.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 7): DataFrame = {
    val nChunks = maxDist + 1
    val chunkBits = 64 / nChunks
    val mask = (1L << chunkBits) - 1
    val sig = simhashSignatures(docs, idCol, textCol).cache()
    val chunkCols = (0 until nChunks).map(ci =>
      struct(lit(ci).as("ci"),
        shiftright(col("simhash"), ci * chunkBits).bitwiseAND(mask).as("cv")))
    val chunked = sig.select(col("id"), col("simhash"),
        explode(array(chunkCols: _*)).as("c"))
      .select(col("id"), col("simhash"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    chunked.as("a").join(chunked.as("b"), Seq("ci", "cv"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }
}
