package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine deterministic rounding: `floor(x·10^k + 0.5) / 10^k` in
  * plain double arithmetic — the SAME IEEE operations on both sides of
  * the oracle boundary. `round()` is NOT that: Spark rounds the shortest
  * DECIMAL representation of the double (BigDecimal HALF_UP), DuckDB
  * rounds the BINARY value, and values near a 5·10^-(k+1) boundary can
  * flip between the two. This spelling mirrors the convention the repo
  * already uses in `TextAnalysis.qualityScore` and
  * `VectorOps.quantizeInt8`; it is half-up toward +inf for negatives
  * (identically in both engines), which is all cross-engine parity
  * needs. Used by every rounding that feeds a HASH-CHECKED iterative
  * computation (k-means assignment rounds, PageRank iterations,
  * quantized scores), where a single flipped rounding would cascade
  * through every subsequent round.
  */
object Rounding {
  def halfUp(c: Column, k: Int): Column = {
    val s = math.pow(10.0, k)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }
}
