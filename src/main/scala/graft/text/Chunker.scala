package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chunking / splitting operators (reference: passage_splitter.py:16-28,
  * text_cleaner.py:136-168) — the reference's "explode" surface. Expressed
  * with native higher-order functions (`sequence`/`transform`/`slice`) so
  * Catalyst sees a generator over an array column: one narrow stage, no
  * UDF, no shuffle. Callers `posexplode` the returned array to get
  * (chunk_index, chunk_text) child rows.
  */
object Chunker {

  /** Overlapping character passages (passage_splitter.py:16-28):
    * windows of `size` chars every `size - overlap` chars, each trimmed,
    * empties dropped downstream. Requires size > overlap, as the reference
    * enforces.
    */
  def passages(c: Column, size: Int = 300, overlap: Int = 50): Column = {
    require(size > overlap, s"passage size ($size) must exceed overlap ($overlap)")
    val stride = size - overlap
    // greatest(...,0): empty text would yield floor(-1/stride) = -1 and
    // sequence(0,-1) generates a DESCENDING range in Spark
    val starts = sequence(lit(0), greatest(floor((length(c) - 1) / stride), lit(0)).cast("int"))
    filter(
      transform(starts, i => trim(substring_index_window(c, i, stride, size))),
      p => p =!= "")
  }

  // substring with 1-based start derived from a window index
  private def substring_index_window(c: Column, i: Column, stride: Int, size: Int): Column =
    c.substr(i * stride + 1, lit(size))

  /** Fixed word-window chunks (text_cleaner.py:161-168 fallback path):
    * split on whitespace, group every `chunkSize` words back into a chunk.
    */
  def wordChunks(c: Column, chunkSize: Int = 100): Column = {
    val words = split(trim(c), "\\s+")
    val nChunks = ceil(size(words).cast("double") / chunkSize).cast("int")
    filter(
      transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => array_join(slice(words, i * chunkSize + 1, lit(chunkSize)), " ")),
      p => p =!= "")
  }

  /** Sentence-aware greedy chunking (text_cleaner.py:136-160): pack whole
    * sentences until the word budget is exceeded, then start a new chunk; a
    * single over-long sentence falls back to fixed word windows. Sequential
    * accumulation → Scala UDF (applied per document, so still fully
    * parallel across the corpus).
    *
    * The sentence boundary detector is pluggable (`SentenceTokenizer`,
    * like `Embedder`): the default regex stand-in diverges from the
    * reference's NLTK `sent_tokenize` (text_cleaner.py:141) on
    * abbreviations, decimals and ellipses — ChunkerSpec documents the
    * divergence — and a real tokenizer slots in without touching the
    * chunking logic.
    */
  def sentenceChunks(maxWords: Int = 100,
                     tokenizer: SentenceTokenizer = RegexSentenceTokenizer): String => Seq[String] = { text =>
    if (text == null || text.trim.isEmpty) Seq.empty
    else {
      val sentences = tokenizer.split(text)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var curWords = 0
      def flush(): Unit = if (cur.nonEmpty) {
        out += cur.mkString(" "); cur.clear(); curWords = 0
      }
      sentences.foreach { s =>
        val w = s.split("\\s+").length
        if (w > maxWords) { // over-long sentence: fixed word windows
          flush()
          s.split("\\s+").grouped(maxWords).foreach(g => out += g.mkString(" "))
        } else {
          if (curWords + w > maxWords) flush()
          cur += s; curWords += w
        }
      }
      flush()
      out.toSeq
    }
  }

  def sentenceChunksUdf(maxWords: Int = 100) = udf(sentenceChunks(maxWords))
}

/** Sentence boundary detection behind a trait so a real tokenizer (the
  * reference uses NLTK Punkt, text_cleaner.py:141) can replace the
  * offline regex stand-in.
  */
trait SentenceTokenizer extends Serializable {
  /** Split text into sentences; must be pure and deterministic. */
  def split(text: String): Seq[String]
}

/** Offline default: split after `.`/`!`/`?` followed by whitespace.
  * KNOWN DIVERGENCE from NLTK Punkt: abbreviations ("Dr. Smith"),
  * decimals inside sentences, and ellipses all produce extra boundaries
  * here that Punkt suppresses.
  */
object RegexSentenceTokenizer extends SentenceTokenizer {
  def split(text: String): Seq[String] =
    text.split("(?<=[.!?])\\s+").toSeq.filter(_.nonEmpty)
}

/** UAX #29 sentence boundaries via the JDK's `java.text.BreakIterator`
  * (public API, offline, deterministic for a fixed locale). Closes most
  * of the regex stand-in's divergence from the reference's NLTK Punkt
  * (text_cleaner.py:141): a period followed by lowercase ("e.g. apples")
  * or by a digit ("Fig. 3"), and ellipses before lowercase
  * ("Wait... really?"), no longer force a boundary. Remaining known
  * divergence, pinned in ChunkerSpec: an abbreviation followed by a
  * CAPITALIZED word ("Dr. Smith") still breaks — UAX #29 carries no
  * abbreviation list, where Punkt learns one from its training corpus.
  *
  * `BreakIterator` is mutable and not thread-safe; each executor thread
  * gets its own instance via a ThreadLocal, so the tokenizer object
  * itself stays serializable and shareable across UDF calls.
  */
object BreakIteratorSentenceTokenizer extends SentenceTokenizer {
  @transient private lazy val local: ThreadLocal[java.text.BreakIterator] =
    ThreadLocal.withInitial(() =>
      java.text.BreakIterator.getSentenceInstance(java.util.Locale.US))
  def split(text: String): Seq[String] = {
    val bi = local.get()
    bi.setText(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      val s = text.substring(start, end).trim
      if (s.nonEmpty) out += s
      start = end
      end = bi.next()
    }
    out.toSeq
  }
}
