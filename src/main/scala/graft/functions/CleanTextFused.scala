package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-call `clean_text` (reference text_cleaner.py:105-133).
  *
  * The composable column form (`graft.text.CleanText.cleanText`) chains 11
  * `regexp_replace` expressions; each link converts its UTF8String input to
  * a java.lang.String, runs the regex, and materializes a fresh UTF8String
  * — 11 conversion round-trips and 11 codegen'd call sites per row for the
  * most-executed operator in the engine (every document of every ingest).
  *
  * This expression performs the identical 11 transforms in ONE codegen'd
  * call: a single UTF8String→String→UTF8String round-trip around a static
  * method over precompiled `java.util.regex.Pattern`s with per-thread
  * Matcher reuse. The steps are NOT merged into one regex — the
  * reference's composition is order-sensitive (e.g. punctuation collapse
  * sees citation brackets still present), and semantic identity with the
  * chain (and with the q13 DuckDB oracle) is the contract;
  * `CleanTextSpec` pins fused ≡ chain property-style.
  *
  * Measured honestly (sf0.1 corpus ×100, local[32]): steady-state
  * throughput is AT PARITY with the chain — regex execution dominates,
  * and Spark's RegExpReplace already caches patterns inside
  * whole-stage codegen. What the fusion buys is the first-run compile
  * (one short generated call site vs 11 nested regex blocks of Janino
  * source), a flat expression tree where depth matters, and a
  * SQL-registrable `clean_text(...)` single function for the reference's
  * most-executed operator. It does NOT buy steady-state wall-clock, and
  * no claim otherwise appears in PROGRESS.md.
  */
object CleanTextFused {
  import java.util.regex.Pattern

  // the 11 steps of CleanText.cleanText, same patterns, same order
  private val steps: Array[(Pattern, String)] = Array(
    Pattern.compile("<[^>]+>") -> " ",
    Pattern.compile("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]") -> " ",
    Pattern.compile("([!?.,;:]){2,}") -> "$1",
    Pattern.compile("\\[[^\\]]{1,20}\\]") -> " ",
    Pattern.compile("\\([A-Z][A-Za-z]+ et al\\.?,? ?\\d{4}[a-z]?\\)") -> " ",
    Pattern.compile("(?i)\\((?:fig(?:ure)?\\.? ?\\d+[a-z]?)\\)") -> " ",
    Pattern.compile("(?im)^(?:figure|table)\\s+\\d+[^\\n]*$") -> " ",
    Pattern.compile("(?is)\\n\\s*(?:references|bibliography)\\b.*$") -> "",
    Pattern.compile("(?is)\\n\\s*(?:methods|materials and methods|acknowledg(?:e)?ments?|funding|conflicts? of interest)\\b.*$") -> "",
    Pattern.compile("(\\w+)-\\s*\\n\\s*(\\w+)") -> "$1$2",
    Pattern.compile("\\s+") -> " ")

  // Matchers are stateful: one set per thread, reset per call — avoids 11
  // Matcher allocations per row (Spark's own RegExpReplace caches the same
  // way via its per-expression StringBuffer/pattern fields)
  private val matchers = ThreadLocal.withInitial[Array[java.util.regex.Matcher]](() =>
    steps.map(_._1.matcher("")))

  /** The full transform on a plain String (also the codegen call target).
    * Final trim strips ' ' only — exactly Spark's `trim` semantics (after
    * the \s+ collapse the edges hold at most a single 0x20 anyway).
    */
  def clean(s: String): String = {
    val ms = matchers.get()
    var cur = s
    var i = 0
    while (i < steps.length) {
      cur = ms(i).reset(cur).replaceAll(steps(i)._2)
      i += 1
    }
    var from = 0
    var to = cur.length
    while (from < to && cur.charAt(from) == ' ') from += 1
    while (to > from && cur.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == cur.length) cur else cur.substring(from, to)
  }

  /** Column-API entry point: `clean_text(c)`. */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(CleanTextExpr(ColumnShim.expression(c)))
  }
}

case class CleanTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"clean_text expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CleanTextFused.clean(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.CleanTextFused.clean($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
