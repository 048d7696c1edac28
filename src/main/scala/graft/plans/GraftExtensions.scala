package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Registers `json_match` as a native function. There is deliberately NO
  * optimizer rule lowering `json_match` into per-path extraction
  * predicates: round 3 measured both a `get_json_object` lowering (2 text
  * scans/row) and an exact variant-typed lowering (`try_parse_json` +
  * `schema_of_variant` type guards) against the codegen'd single-parse
  * evaluator on sf0.1 events, and the evaluator won — 0.21 s vs 0.31 s
  * (gjo) vs 0.65 s (variant): without common-subexpression elimination in
  * FilterExec every lowered conjunct re-parses the JSON, and none of these
  * predicates is parquet-pushable (they read a JSON string column), so the
  * lowering bought fragmented parses, not pruning. One engine also removes
  * the round-2 fast-path divergence class (array-of-objects any-element
  * semantics) by construction. See DESIGN.md "json_match execution".
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("json_match"),
      new ExpressionInfo(classOf[JsonMatchExpr].getName, "json_match"),
      (exprs: Seq[Expression]) => JsonMatchExpr(exprs(0), exprs(1))))
  }
}
