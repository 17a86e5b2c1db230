package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the library-wide token-count contract on exactly the inputs
  * where the old split-based form and the \S+-run form diverge (ADVICE
  * round-8 medium finding): SQL trim strips only spaces, so tab/newline
  * edges made `size(split(trim(x),'\s+'))` count empty elements. The
  * contract is \S+ runs, with trimmed-empty input counting 1 (legacy
  * split identity on ""). tools/token_mirror_check.py runs the DuckDB
  * CASE mirror over the same inputs and asserts these same values, so
  * the cross-engine identity is pinned on BOTH sides.
  */
class TokenCountParitySpec extends SparkSpec {

  // (input, expected) — keep in sync with tools/token_mirror_check.py
  val pins: Seq[(String, Int)] = Seq(
    ("a b", 2),
    ("  a  b  ", 2),
    ("\ta b", 2),       // old split form said 3
    ("a b\n", 2),       // old split form said 3
    ("\t", 0),          // old split form said 2
    ("\n\t\n", 0),
    ("", 1),            // legacy split identity: "" -> [""] -> 1
    ("   ", 1),         // trims to "" -> 1
    ("one", 1),
    ("\t\na  b\t", 2)
  )

  test("tokenCount pins the \\S+-run semantics incl. tab/newline edges") {
    import spark.implicits._
    val got = pins.map(_._1).toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == pins.map(_._2), s"got $got, want ${pins.map(_._2)}")
  }

  test("null propagates as null") {
    import spark.implicits._
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "text")
      .select(TextAnalysis.tokenCount(col("text")).as("n")).collect()
    assert(r(0).isNullAt(0))
  }
}
