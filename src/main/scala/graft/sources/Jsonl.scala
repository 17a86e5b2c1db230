package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus source with quarantine semantics (reference:
  * build_faiss.py:40-66 skips malformed lines silently;
  * fetch_pubmed.py:83-90 appends failures to a quarantine manifest).
  *
  * Spark-first form: one PERMISSIVE read with a corrupt-record column —
  * the scan stays a single pass; good rows and quarantine rows are two
  * projections of it. At 100 TB this is strictly better than the
  * reference's line-by-line Python loop: schema enforcement, predicate
  * pushdown on the good side, and the quarantine side-output costs no
  * second scan.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL tree (recursive, sorted lexically like the reference's
    * rglob) keeping malformed lines in the corrupt-record column.
    */
  def readPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("recursiveFileLookup", "true")
      .json(path)
  }

  /** Valid rows only (reference: silently-skipped lines). */
  def good(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantine side output: the reference's `pmid \t reason` manifest as
    * a DataFrame (raw line + reason), writable as TSV/CSV.
    */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"), lit("malformed_json").as("reason"))
}
