package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an sf1-equivalent fixture by scaling the driver's
  * sf0.1 tables 10x (or any factor), so the "survives 100 TB" argument can
  * be MEASURED one decade up instead of argued from plan shape.
  *
  * The point is to scale cardinalities without distorting the statistical
  * structure the operators key on:
  *
  *  - documents: replica 0 is the original; replica i>0 shifts doc_id,
  *    deterministically shuffles the WORD ORDER with a seed derived from
  *    the text itself (hash(text) ^ salt), then tags ~25% of word TYPES
  *    (keyed by word+salt) with a replica suffix. Identical texts get
  *    identical transforms, so the planted exact-duplicate rate survives
  *    in every replica; across replicas the shuffle destroys shingle
  *    sets AND the tagging destroys word-multiset equality — without the
  *    tagging, every ORDER-INVARIANT signature (the bag-of-tokens hash
  *    embedder, unigram simhash, the sorted-distinct-word canonical
  *    fingerprint) sees all `factor` replicas of a text as exact
  *    duplicates, growing near-dup pair mass QUADRATICALLY in the
  *    factor — a fixture artifact no real corpus has (new data is new
  *    text, not permutations of old text; measured: the v1 fixture sent
  *    sign-LSH dedup from 14 s to a 350 s failure at factor 100).
  *  - embeddings: vec_id shifts; replica i>0 applies a SIGNED COORDINATE
  *    PERMUTATION (a deterministic salt-keyed permutation plus sign
  *    flips). That is an exactly orthogonal transform: every
  *    within-replica pairwise cosine — planted near-dup pairs included —
  *    is preserved bit-for-bit, while cross-replica cosines drop to the
  *    ~1/√dim isotropic noise floor, so qualifying-pair mass grows
  *    linearly in the factor, the way a real corpus grows (the v1
  *    additive 5% perturbation instead made every vector a member of a
  *    factor-sized ~0.87-cosine clique).
  *  - events: event_id/user_id shift per replica, timestamps unchanged —
  *    10x the users with identical per-user history shapes, the way a
  *    bigger tenant population actually scales (the window/session/as-of
  *    state per key is constant; key count grows).
  *
  * All other tables copy through unchanged (the rehearsal's top-cost
  * queries read documents/embeddings/events only).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <destDir> [factor=10]
  */
object ScaleUp {
  private val IdShift = 100000000L // far above any fixture id

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mix64(z0: Long): Long = graft.functions.SplitMix.mix64(z0)
    // deterministic text-keyed transform: same text => same output, so
    // exact-dup structure is replica-invariant (see object doc for why
    // both the shuffle AND the word tagging are needed)
    val shuffleWords = udf { (text: String, salt: Long) =>
      if (salt == 0L || text == null) text
      else {
        val words = text.split(" ", -1)
        val seed = scala.util.hashing.MurmurHash3.stringHash(text).toLong ^ (salt * 0x9e3779b97f4a7c15L)
        val rnd = new scala.util.Random(seed)
        rnd.shuffle(words.toIndexedSeq)
          .map { w =>
            // tag ~25% of word TYPES per replica (word+salt keyed, so a
            // word is tagged consistently within the replica and the
            // within-replica repetition structure survives)
            if ((mix64(scala.util.hashing.MurmurHash3.stringHash(w).toLong
                ^ salt * 0x9e3779b97f4a7c15L) & 3L) == 0L) w + "~" + salt
            else w
          }.mkString(" ")
      }
    }
    // signed coordinate permutation per replica: a deterministic
    // orthogonal transform (permutation matrix with ±1 entries). The
    // permutation and sign vector depend only on the salt, so they are
    // built ONCE per replica on the driver and closed over by that
    // replica's UDF — rebuilding them per row paid a dim-element
    // Fisher-Yates per vector (review finding)
    val embDim = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    def signedPermUdf(salt: Long) = {
      val rnd = new scala.util.Random(mix64(salt * 0x100000001b3L))
      val perm = rnd.shuffle((0 until embDim).toIndexedSeq).toArray
      val signs = Array.fill(embDim)(if (rnd.nextBoolean()) 1f else -1f)
      udf { (vec: Seq[Float]) =>
        if (salt == 0L || vec == null) vec
        else {
          val v = vec.toArray
          // perm indexes [0, embDim), so a ragged (shorter) vector would
          // read past its end — and silently zero-pad positions past its
          // length, changing the norm. Fail loudly instead of either.
          require(v.length == embDim,
            s"signed-permutation replica expects uniform $embDim-d vectors, " +
              s"got one of length ${v.length}")
          val out = new Array[Float](embDim)
          var j = 0
          while (j < embDim) { out(j) = signs(j) * v(perm(j)); j += 1 }
          out.toSeq
        }
      }
    }

    def replicas(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionAll _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsUp = replicas(docs) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * IdShift))
        .withColumn("text", shuffleWords(col("text"), lit(i.toLong)))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    docsUp.repartition(32).write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embUp = replicas(emb) { (d, i) =>
      d.withColumn("embedding", signedPermUdf(i.toLong)(col("embedding")))
        .withColumn("vec_id", col("vec_id") + lit(i * IdShift))
    }
    embUp.repartition(8).write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    val events = spark.read.parquet(s"$src/events.parquet")
    val eventsUp = replicas(events) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * IdShift))
        .withColumn("user_id", col("user_id") + lit(i * IdShift))
    }
    eventsUp.repartition(32).write.mode("overwrite").parquet(s"$dest/events.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")) {
      val p = new java.io.File(s"$src/$t.parquet")
      if (p.exists)
        spark.read.parquet(p.getPath).write.mode("overwrite").parquet(s"$dest/$t.parquet")
    }
    println(s"[scaleup] wrote ${factor}x of $src to $dest: " +
      s"documents=${docsUp.count()} embeddings=${embUp.count()} events=${eventsUp.count()}")
    spark.stop()
  }
}
