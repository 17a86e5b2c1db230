package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Splitter invariants (FIXTURES.md §9): window sizes, overlap
  * reconstruction, chunk word bounds. Property-style checks use a seeded
  * generator (deterministic, no runner dependency).
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def passages(s: String, size: Int, overlap: Int): Seq[String] =
    Seq(s).toDF("t").select(Chunker.passages(col("t"), size, overlap))
      .as[Seq[String]].head()

  test("passage windows: size bound, stride overlap reconstruction") {
    val text = ("abcdefghij" * 100).trim // 1000 chars
    val ps = passages(text, 300, 50)
    assert(ps.nonEmpty)
    assert(ps.forall(_.length <= 300))
    // consecutive windows overlap by 50 chars on the raw (untrimmed) text
    assert(ps.head == text.substring(0, 300))
    assert(ps(1) == text.substring(250, 550))
  }

  test("passage splitter requires size > overlap (reference errors too)") {
    intercept[IllegalArgumentException](Chunker.passages(col("x"), 50, 50))
  }

  test("wordChunks property: chunks bounded at n words, order-preserving") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val words = (1 to (1 + rnd.nextInt(40)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(5)))
      val text = words.mkString(" ")
      val chunks = Seq(text).toDF("t").select(Chunker.wordChunks(col("t"), 10))
        .as[Seq[String]].head()
      assert(chunks.forall(_.split(" ").length <= 10))
      assert(chunks.flatMap(_.split(" ")).toList == words.toList)
    }
  }

  test("sentence chunks pack whole sentences under the budget") {
    val text = "One two three. Four five. Six seven eight nine. Ten."
    val chunks = Chunker.sentenceChunks(5)(text)
    assert(chunks == Seq("One two three. Four five.", "Six seven eight nine. Ten."))
  }

  test("over-long sentence falls back to fixed word windows") {
    val long = (1 to 12).map(i => s"w$i").mkString(" ") + "."
    val chunks = Chunker.sentenceChunks(5)(long)
    assert(chunks.size == 3)
    assert(chunks.flatMap(_.split(" ")).size == 12)
  }

  test("empty and null inputs yield no chunks") {
    assert(Chunker.sentenceChunks(5)("") == Seq.empty)
    assert(Chunker.sentenceChunks(5)(null) == Seq.empty)
    assert(passages("", 300, 50).isEmpty)
  }
}
