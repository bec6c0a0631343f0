package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge

/** Single-evaluation materialization for expensive computed columns.
  *
  * `df.withColumn(name, e)` makes `name` an ALIAS: Catalyst's alias
  * substitution re-inlines `e` at every downstream reference, so a
  * computed stratum consumed by both a filter threshold and the output
  * projection evaluates TWICE per row (measured 2x on the stratified
  * sampler, whose stratum is a whole language-ID `aggregate` pass).
  * Persisting/checkpointing would also pin the value but costs a
  * materialization of the whole dataset, and an `explode(array(e))`
  * Generate barrier costs a per-row UnsafeRow copy (~0.2 s at sf0.1 on
  * the sampler — the carried text column is wide).
  *
  * [[Materialize.once]] instead wraps `e` in [[graft.plans.EvalOnce]],
  * a pass-through Catalyst expression declared non-deterministic.
  * Catalyst never duplicates, inlines, or reorders non-deterministic
  * expressions — `CollapseProject` keeps the computing Project intact
  * and predicate pushdown stops at it — so every downstream reference
  * reads the SAME once-computed attribute, while codegen forwards
  * straight to the child (no barrier cost, same whole-stage span).
  */
object Materialize {

  /** `df` plus column `name` = `e`, guaranteed to evaluate `e` once per
    * row no matter how many times downstream operators reference it.
    * `withColumn` semantics: an existing `name` column is replaced.
    */
  def once(df: DataFrame, name: String, e: Column): DataFrame =
    df.withColumn(name,
      GraftBridge.column(graft.plans.EvalOnce(GraftBridge.expression(e))))

  /** WITHIN-expression single evaluation: `f` sees `e` as a BOUND lambda
    * variable, so however many times the body references it, `e` is
    * computed once. (`transform` over a one-element array binds its
    * element; the wrapper is a single interpreted hop per row, the body
    * references are plain variable reads.) The expression-level
    * complement of [[once]] — use it when the shared value and its
    * consumers must live inside ONE column (e.g. a filter condition).
    */
  def bind1(e: Column)(f: Column => Column): Column =
    org.apache.spark.sql.functions.element_at(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array(e), f), 1)
}
