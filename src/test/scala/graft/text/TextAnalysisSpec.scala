package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("compression ratio: repetition compresses tighter, bounds hold, deterministic") {
    val rep = ("spam " * 200).trim                // highly repetitive
    val varied = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val rows = Seq(("rep", rep), ("var", varied), ("empty", ""))
      .toDF("k", "t")
      .select(col("k"), TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("empty") == 0.0)
    assert(rows("rep") > 0.0 && rows("var") > 0.0)
    assert(rows("rep") < rows("var") / 2,
      s"repetitive text must compress far tighter: ${rows("rep")} vs ${rows("var")}")
    assert(rows("var") <= 1.1, s"deflate overhead bound exceeded: ${rows("var")}")
    // deterministic across invocations (thread-local Deflater reset per row)
    val again = Seq(("rep", rep)).toDF("k", "t")
      .select(TextAnalysis.compressionRatio(col("t"))).as[Double].head()
    assert(again == rows("rep"))
  }

  test("rolling hash: whitespace/case-normalized, order-sensitive, distributed == local") {
    // normalization: runs of whitespace and case differences hash equal
    assert(TextAnalysis.rollingHash("Alpha  Beta\tGamma") ==
      TextAnalysis.rollingHash("alpha beta gamma"))
    // order-sensitive (unlike the bag-of-words canonical fingerprint)
    assert(TextAnalysis.rollingHash("alpha beta") !=
      TextAnalysis.rollingHash("beta alpha"))
    assert(TextAnalysis.rollingHash(null) == 0L)
    // the UDF applied on executors agrees with the local function
    val texts = Seq("one two three", "  One   TWO three ", "three two one")
    val viaSpark = texts.toDF("t")
      .select(TextAnalysis.rollingHashUdf(col("t"))).as[Long].collect().toSeq
    assert(viaSpark == texts.map(TextAnalysis.rollingHash))
    assert(viaSpark.head == viaSpark(1) && viaSpark.head != viaSpark(2))
  }
}
