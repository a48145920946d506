package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column builders over `ArrayType(FloatType)` columns.
  *
  * All arithmetic is promoted to double inside linear HOF folds (SURVEY.md
  * H11): the fold order is left-to-right, matching the reference oracle's
  * list kernels, so results are bit-stable cross-engine; rankings and
  * thresholds should still go through [[cosine6]] (round to 6dp) so ulp
  * noise cannot flip them (H10).
  *
  * These lower to Catalyst `ArrayTransform`/`ArrayAggregate`/`ZipWith`
  * expressions — no UDF, no serialization wall; they stay inside whole-stage
  * codegen'd projections. For 100 TB-scale similarity search prefer the
  * bucketed paths in [[Ann]] over all-pairs scans.
  */
object VectorOps {

  private val D = "double"

  /** dot(a, b) as a left-fold in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(D) * y.cast(D)),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm in double precision. */
  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(D) * x.cast(D)), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity (unrounded — for internal math).
    *
    * Zero-norm (or empty) vectors yield NaN, matching the native
    * single-pass expression's 0/0 arithmetic. The branch matters under
    * Spark 4's default ANSI mode, where a bare `/` THROWS Divide-by-zero —
    * one degenerate embedding must not kill a 100 TB job; NaN simply fails
    * every `sim >= t` threshold downstream. CaseWhen evaluates the divide
    * only when the denominator is nonzero, so no error can fire.
    */
  def cosine(a: Column, b: Column): Column = {
    val den = norm2(a) * norm2(b)
    when(den === 0.0, lit(Double.NaN)).otherwise(dot(a, b) / den)
  }

  /** Cosine similarity rounded to 6dp — the rank/threshold-safe form. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** Native single-pass cosine (graft.functions.CosineSimilarity): bit-
    * identical to [[cosine]] (same per-accumulator fold order) but one
    * fused codegen'd loop instead of three HOF passes. Requires a session
    * built by graft.engine.Graft (the extension registers the function). */
  def cosineNative(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** [[cosineNative]] rounded to 6dp. */
  def cosine6Native(a: Column, b: Column): Column = round(cosineNative(a, b), 6)
}
