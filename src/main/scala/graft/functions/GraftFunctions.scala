package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the library's custom Catalyst
  * expressions, so `spark.sql("... dot_product(a, b) ...")` works exactly
  * like the Column API. (The SparkSessionExtensions injection point would
  * do the same at session build time; temp-function registration keeps it
  * usable on an already-built session.)
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "clean_text", exprs => CleanTextExpr(exprs.head), "built-in")
  }
}
