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

  test("tokenizer is pluggable; regex default's divergence from Punkt is documented behavior") {
    // DOCUMENTED DIVERGENCE: the regex stand-in breaks after "Dr." where
    // NLTK Punkt (the reference's tokenizer) would not. This test pins
    // the divergence so a future change is a conscious one.
    val text = "Dr. Smith arrived. He left."
    assert(RegexSentenceTokenizer.split(text) ==
      Seq("Dr.", "Smith arrived.", "He left."))
    // an abbreviation-aware tokenizer slots in without touching the
    // chunker: same packing logic, Punkt-like boundaries
    object AbbrevAware extends SentenceTokenizer {
      private val abbrevs = Set("dr.", "mr.", "ms.", "et al.", "fig.")
      def split(text: String): Seq[String] = {
        val parts = RegexSentenceTokenizer.split(text)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        parts.foreach { p =>
          if (out.nonEmpty && abbrevs.exists(a => out.last.toLowerCase.endsWith(a)))
            out(out.length - 1) = out.last + " " + p
          else out += p
        }
        out.toSeq
      }
    }
    assert(AbbrevAware.split(text) == Seq("Dr. Smith arrived.", "He left."))
    val chunks = Chunker.sentenceChunks(10, AbbrevAware)(text)
    assert(chunks == Seq("Dr. Smith arrived. He left."))
  }

  test("BreakIterator tokenizer: UAX #29 suppressions the regex stand-in lacks") {
    // period + lowercase: no boundary (regex breaks here)
    assert(BreakIteratorSentenceTokenizer.split("e.g. apples are red. Oranges too.") ==
      Seq("e.g. apples are red.", "Oranges too."))
    assert(RegexSentenceTokenizer.split("e.g. apples are red. Oranges too.") ==
      Seq("e.g.", "apples are red.", "Oranges too."))
    // period + digit: no boundary (regex breaks here)
    assert(BreakIteratorSentenceTokenizer.split("See Fig. 3 for details. The end.") ==
      Seq("See Fig. 3 for details.", "The end."))
    assert(RegexSentenceTokenizer.split("See Fig. 3 for details. The end.") ==
      Seq("See Fig.", "3 for details.", "The end."))
    // ellipsis + lowercase question: one sentence (regex splits the ellipsis)
    assert(BreakIteratorSentenceTokenizer.split("Wait... really? Yes! Done.") ==
      Seq("Wait... really?", "Yes!", "Done."))
    assert(RegexSentenceTokenizer.split("Wait... really? Yes! Done.") ==
      Seq("Wait...", "really?", "Yes!", "Done."))
    // decimals never break in either tokenizer (no whitespace after '.')
    assert(BreakIteratorSentenceTokenizer.split("Pi is 3.14 exactly. Next sentence.") ==
      Seq("Pi is 3.14 exactly.", "Next sentence."))
  }

  test("BreakIterator tokenizer: documented REMAINING divergence from Punkt on Dr. Smith") {
    // UAX #29 has no abbreviation list: ATerm followed by a capitalized
    // word still breaks, exactly like the regex stand-in. Punkt (the
    // reference) suppresses this. Pinned so a future ICU/abbrev-list
    // upgrade is a conscious change.
    assert(BreakIteratorSentenceTokenizer.split("Dr. Smith arrived. He left.") ==
      Seq("Dr.", "Smith arrived.", "He left."))
  }

  test("sentence chunking packs identically through the BreakIterator tokenizer") {
    val text = "One two three. Four five. Six seven eight nine. Ten."
    assert(Chunker.sentenceChunks(5, BreakIteratorSentenceTokenizer)(text) ==
      Seq("One two three. Four five.", "Six seven eight nine. Ten."))
    // boundary suppression changes the packing where the regex over-splits
    val abbr = "See Fig. 3 now. Then stop."
    assert(Chunker.sentenceChunks(4, BreakIteratorSentenceTokenizer)(abbr) ==
      Seq("See Fig. 3 now.", "Then stop."))
  }

  test("empty and null inputs yield no chunks") {
    assert(Chunker.sentenceChunks(5)("") == Seq.empty)
    assert(Chunker.sentenceChunks(5)(null) == Seq.empty)
    assert(passages("", 300, 50).isEmpty)
  }
}
