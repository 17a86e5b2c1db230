package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's `/ask` request router and answer post-processing chain
  * (SURVEY §2.3 intent/unhelpful predicates, §2.5/§2.8 bullet family),
  * re-expressed as column pipelines. Every online query in the reference
  * passes through these; they are pure regex/array work, so they compile
  * to codegen'd scan-stage expressions — the shuffles are only the
  * order-preserving dedup group-bys.
  *
  * The fixture has no model output, so each query synthesizes its input
  * deterministically from `documents` (same trick as q39/q44/q45) — the
  * DuckDB oracle runs the identical construction.
  */
object RouterOps {

  // ----- q51: small-talk intent router (main.py:16-31) -----

  private val GreetRe =
    "(?i)\\b(hi|hello|hey|howdy|greetings|good\\s+(morning|afternoon|evening))\\b"
  private val ThankRe = "(?i)\\b(thanks?|thank you|appreciate(?:\\s+it)?)\\b"
  private val ByeRe = "(?i)\\b(bye|goodbye|see you|later|take care)\\b"

  /** Intent predicate + canned-reply short-circuit: greetings / thanks /
    * farewells route to fixed replies (priority greet > thank > bye, as
    * in the reference's if-chain); everything else falls through to RAG.
    */
  def q51IntentRoute(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("utterance",
        when(col("doc_id") % 5 === 0, concat(lit("hey, quick question about doc "), col("doc_id")))
          .when(col("doc_id") % 5 === 1, lit("Thanks a lot, appreciate it!"))
          .when(col("doc_id") % 5 === 2, lit("ok goodbye, talk later"))
          .when(col("doc_id") % 5 === 3, concat(lit("Good morning! what does doc "), col("doc_id"), lit(" say?")))
          .otherwise(concat(lit("what is the mechanism described in doc "), col("doc_id"), lit("?"))))
      .withColumn("route",
        when(col("utterance").rlike(GreetRe), "greet")
          .when(col("utterance").rlike(ThankRe), "thank")
          .when(col("utterance").rlike(ByeRe), "bye")
          .otherwise("rag"))
      .withColumn("reply",
        when(col("route") === "greet", "Hello — I’m Nicole. How can I assist you today?")
          .when(col("route") === "thank", "You’re very welcome!")
          .when(col("route") === "bye", "Good‑bye for now; come back any time."))
      .select("doc_id", "utterance", "route", "reply")
      .orderBy("doc_id")

  // ----- q52: unhelpful-answer predicate (main.py:242-250) -----

  /** `len(words) < 3 or "i’m not sure" / "i am not sure" /
    * "insufficient evidence" in lowercased text`.
    */
  def q52Unhelpful(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("answer",
        when(col("doc_id") % 6 === 0, lit("No."))
          .when(col("doc_id") % 6 === 1, lit("I’m not sure about that, sorry."))
          .when(col("doc_id") % 6 === 2, lit("There is insufficient evidence to answer."))
          .when(col("doc_id") % 6 === 3, lit("I am not sure — the context does not say."))
          .otherwise(concat(lit("The answer is described in "), col("text"))))
      .withColumn("unhelpful",
        (graft.text.TextAnalysis.tokenCount(col("answer")) < 3) ||
          lower(col("answer")).contains("i’m not sure") ||
          lower(col("answer")).contains("i am not sure") ||
          lower(col("answer")).contains("insufficient evidence"))
      .select("doc_id", "answer", "unhelpful")
      .orderBy("doc_id")

  // ----- q53: bullet-list post-processing (main.py:253-296) -----

  /** Collapse raw model output into a clean de-duplicated bullet list:
    * strip leading bullet/number markers, drop disclaimer/header/dialogue
    * lines, de-dup by the lowercase alpha-only key (parentheticals
    * removed, first 60 chars), cap at 10, rejoin as `• ` lines, sentinel
    * "Insufficient evidence." when nothing survives. Order-preserving
    * first-occurrence dedup is a window over (doc, key) sorted by line
    * position — the distributed form of the reference's `seen` set.
    *
    * Faithfulness note: the marker strip runs BEFORE the
    * "**no matching evidence" prefix check, exactly as in the reference —
    * so a line opening with `**` has its stars consumed by the strip and
    * the disclaimer check can never fire on it; such lines survive (as
    * they do in the reference).
    */
  def q53BulletClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // every 7th doc gets only filterable lines, so the
    // "Insufficient evidence." sentinel path is exercised
    val raw = docs
      .withColumn("raw", when(col("doc_id") % 7 === 0,
        lit("### Response\nAssistant: nothing here\n   ")).otherwise(concat(
        lit("• Finding one for doc "), col("doc_id"), lit("\n"),
        lit("2. finding one for doc "), col("doc_id"), lit("!\n"),
        lit("### Response\n"),
        lit("Assistant: leaked dialogue line\n"),
        lit("- Second point (an example) for doc "), col("doc_id"), lit("\n"),
        lit("* second point for doc "), col("doc_id"), lit("\n"),
        lit("   \n"),
        lit("**No matching evidence for this query\n"),
        substring(col("text"), 1, 40))))
    val lines = raw
      .select(col("doc_id"), posexplode(split(col("raw"), "\n")).as(Seq("pos", "line")))
      .withColumn("clean", trim(regexp_replace(col("line"), "^[\\s•*\\-0-9.]+", "")))
      .filter(col("clean") =!= "" &&
        !lower(col("clean")).startsWith("**no matching evidence") &&
        !lower(col("clean")).startsWith("###") &&
        !col("clean").rlike("(?i)^(you|assistant):"))
      .withColumn("key", substring(
        regexp_replace(lower(regexp_replace(col("clean"), "\\([^)]*\\)", "")), "[^a-z]", ""),
        1, 60))
    val wKey = Window.partitionBy("doc_id", "key").orderBy("pos")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val kept = lines
      .withColumn("rk", row_number().over(wKey)).filter(col("rk") === 1)
      .withColumn("rn", row_number().over(wDoc)).filter(col("rn") <= 10)
    val agg = kept.groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("clean")))),
        x => concat(lit("• "), x.getField("clean"))), "\n").as("b"))
    // docs whose every line was filtered have no group at all — the left
    // join restores them so the sentinel actually fires (main.py:293-294)
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("b"), lit("Insufficient evidence.")).as("bullets"))
      .orderBy("doc_id")
  }

  // ----- q54: bullet verify-against-context (inference/postprocess.py:126-148) -----

  /** Keep a bullet when its lowercased text occurs verbatim in the
    * context, or when at most 2 of its distinct words are missing from
    * the context word set.
    */
  def q54BulletVerify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("context", lower(col("text")))
    val bullets = docs.select(col("doc_id"), col("context"),
      explode(array(
        // verbatim substring of the context
        trim(substring(col("text"), 1, 50)),
        // context words + 2 novel words — allowed by the ≤2 rule
        concat(trim(substring(col("text"), 1, 30)), lit(" novelword anotherone")),
        // ≥3 novel words — must be dropped
        lit("completely unrelated fabricated claim here"))).as("bullet"))
    bullets
      .withColumn("blower", lower(col("bullet")))
      .withColumn("missing", size(array_except(
        array_distinct(split(col("blower"), "\\s+")),
        split(col("context"), "\\s+"))).cast("long"))
      .filter(col("context").contains(col("blower")) || col("missing") <= 2)
      .select("doc_id", "bullet", "missing")
      .orderBy("doc_id", "bullet")
  }

  // ----- q55: word cap + ellipsis (inference/postprocess.py:159-167) -----

  def q55WordCap(spark: SparkSession, dir: String, maxWords: Int = 60): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"),
        when(size(col("words")) <= maxWords, trim(col("text")))
          .otherwise(concat(array_join(slice(col("words"), 1, maxWords), " "), lit("…")))
          .as("capped"),
        size(col("words")).cast("long").as("n_words"))
      .orderBy("doc_id")

  // ----- q56: order-preserving exact sentence dedup (postprocess.py:75-86) -----

  /** Drop exact duplicate sentences, keep original order, join with one
    * space. Sentence split = whitespace after a period — the reference's
    * `(?<=\.)\s+` lookbehind, done here (and in the DuckDB oracle, which
    * has no lookbehind) by marking the boundary with a sentinel char and
    * splitting on it.
    */
  def q56SentenceDedup(spark: SparkSession, dir: String): DataFrame = {
    val gen = Tables.documents(spark, dir)
      .withColumn("s1", concat(trim(substring(col("text"), 1, 35)), lit(".")))
      .withColumn("s2", concat(trim(substring(col("text"), 36, 30)), lit(".")))
      .withColumn("s3", concat(lit("Doc "), col("doc_id"), lit(" repeats itself.")))
      .withColumn("looped", concat_ws(" ", col("s1"), col("s2"), col("s1"), col("s3"),
        col("s2"), col("s3")))
    val sentences = gen
      .select(col("doc_id"), posexplode(
        split(regexp_replace(col("looped"), "(\\.)\\s+", "$1\u0001"), "\u0001"))
        .as(Seq("pos", "sent")))
      .filter(col("sent") =!= "")
    val wFirst = Window.partitionBy("doc_id", "sent").orderBy("pos")
    sentences
      .withColumn("rk", row_number().over(wFirst)).filter(col("rk") === 1)
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("sent")))),
        x => x.getField("sent")), " ").as("deduped"))
      .orderBy("doc_id")
  }
}
