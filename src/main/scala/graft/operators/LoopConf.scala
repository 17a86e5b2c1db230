package graft.operators

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle sizing for ITERATIVE operator loops (round-15
  * verdict item 3, guide §2: partition counts should follow data size,
  * not session topology).
  *
  * Why the loops need it (measured round 16, R16Profile at sf0.1 on
  * local[32]): every CC/pageRank/kCore/BPE round runs jobs over frames of
  * ~10³-10⁵ rows, but each round's exchanges inherit
  * `spark.sql.shuffle.partitions` (= core count in the bench session) and
  * AQE materializes EVERY exchange as its own query-stage job —
  * connectedComponents spent 29 jobs / 284 tasks on a 4-round loop whose
  * data fits one partition, and the job-scheduling latency (~100 ms each)
  * dominated the arithmetic. That is also exactly why the round-15
  * scaling block showed the graph family SLOWER on 32 cores than 8
  * (q201 0.38×, q125 0.69×): more cores = more default partitions = more
  * per-round overhead over the same tiny frames.
  *
  * The remedy is the guide's: derive the loop's partition count from the
  * MEASURED row count of the loop frame (the operators all materialize it
  * anyway — persist + count or localCheckpoint + count), and scope it
  * with set-then-restore exactly like the established q70/q106 streaming
  * state sizing. When the sized count is at or below the session's core
  * count, the loop also runs with AQE off: at that size AQE cannot
  * improve any plan (there is nothing to coalesce below 1 partition and
  * joins this small broadcast anyway via static estimates), while its
  * per-exchange stage jobs multiply the per-round job count ~5×. At
  * production sizes the SAME code sizes the loop to hundreds or thousands
  * of partitions and keeps AQE on — nothing here is tuned to local[32].
  */
object LoopConf {

  /** Partition count derived from a measured row count: ceil-ish
    * rows/rowsPerPartition, floored at 1. `rowsPerPartition` is chosen
    * per call site from the row WIDTH so partitions land in the
    * tens-of-MB range (guide §2.2) — e.g. 2M for 16-byte edge pairs,
    * 250k for symbol-array vocab rows.
    */
  def sizedPartitions(rows: Long, rowsPerPartition: Long): Int = {
    require(rowsPerPartition > 0, "rowsPerPartition must be positive")
    math.max(1L, math.min((rows + rowsPerPartition - 1) / rowsPerPartition, 65536L)).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions = p`; additionally
    * with AQE off when p is within the session's core count (the
    * tiny-loop regime where AQE is pure per-exchange job overhead).
    * Set-then-restore, like the q70/q106 streaming state sizing. The
    * caller must materialize everything it returns INSIDE the scope
    * (persist+count / localCheckpoint) — a lazy frame planned after the
    * restore would silently use the session defaults again.
    */
  def withLoopConf[T](spark: SparkSession, p: Int)(body: => T): T = {
    val conf = spark.conf
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.shuffle.partitions", p.toString)
    if (p <= spark.sparkContext.defaultParallelism)
      conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      conf.set("spark.sql.shuffle.partitions", prevParts)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
