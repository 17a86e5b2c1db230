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
  *  - documents: replica 0 is the original; replica i>0 shifts doc_id and
  *    deterministically shuffles the WORD ORDER with a seed derived from
  *    the text itself (xxhash64(text) ^ salt). Identical texts get
  *    identical shuffles, so the planted exact-duplicate rate survives in
  *    every replica; across replicas the shingle sets are destroyed, so a
  *    replica is NOT an artificial near-dup of its original (which would
  *    inflate pair counts quadratically in the factor — a fixture
  *    artifact, not a scaling signal). Word multisets are preserved, so
  *    quality/LM/token statistics keep their distribution.
  *  - embeddings: vec_id shifts; replica i>0 adds a deterministic
  *    pseudo-random perturbation (scaled to ~5% of the vector norm) and
  *    re-normalizes, keeping the space's cluster geometry while avoiding
  *    10 exact copies of every vector (which would tie-break ANN top-k
  *    pathologically).
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

    // deterministic text-keyed word shuffle: same text => same output, so
    // exact-dup structure is replica-invariant
    val shuffleWords = udf { (text: String, salt: Long) =>
      if (salt == 0L || text == null) text
      else {
        val words = text.split(" ", -1)
        val seed = scala.util.hashing.MurmurHash3.stringHash(text).toLong ^ (salt * 0x9e3779b97f4a7c15L)
        val rnd = new scala.util.Random(seed)
        rnd.shuffle(words.toIndexedSeq).mkString(" ")
      }
    }
    // deterministic vector perturbation: splitmix64 stream keyed by
    // (vec_id, salt, component) -> uniform in [-eps, eps], re-normalized
    val perturb = udf { (vec: Seq[Float], id: Long, salt: Long) =>
      if (salt == 0L || vec == null) vec
      else {
        val eps = 0.05f
        var x = id * 0x9e3779b97f4a7c15L + salt
        val out = vec.map { v =>
          x += 0x9e3779b97f4a7c15L
          var z = x
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          val u = (z >>> 11).toDouble / (1L << 53).toDouble // [0,1)
          v + eps * (2.0f * u.toFloat - 1.0f)
        }
        val n = math.sqrt(out.map(v => v.toDouble * v.toDouble).sum)
        if (n == 0.0) out else out.map(v => (v / n).toFloat)
      }
    }

    def replicas(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionAll _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsUp = replicas(docs) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * IdShift))
        .withColumn("text", shuffleWords(col("text"), lit(i.toLong)))
        .withColumn("n_chars", length(col("text")))
    }
    docsUp.repartition(32).write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embUp = replicas(emb) { (d, i) =>
      d.withColumn("embedding", perturb(col("embedding"), col("vec_id"), lit(i.toLong)))
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
