package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, composed
  * from codegen'd higher-order functions (no UDFs).
  *
  * Determinism note: elements are cast to double BEFORE any arithmetic, so
  * every multiply/add is an IEEE double op on exactly-converted floats and
  * the sequential `aggregate` accumulation matches DuckDB's
  * list_cosine_similarity bit for bit — which keeps cosine results
  * oracle-checkable with no tolerance.
  */
object VectorFunctions {

  /** Array[Float] → Array[Double], exact. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either norm is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0.0, dot(a, b) / denom)
  }

  /** Squared L2 distance (cheaper than cosine when norms are uniform). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)

  // Native (codegen Expression) forms, built directly — no function-
  // registry registration required, so they are safe as library-internal
  // DEFAULTS. Bit-identical to the HOF compositions above for same-
  // length arrays (pinned in CosineSimilaritySpec / SquaredDistanceSpec);
  // the difference is purely evaluation strategy: one fused primitive
  // loop per call instead of interpreted zip_with/aggregate trees —
  // which matters enormously INSIDE higher-order lambdas (the
  // broadcast-argmin centroid assignment evaluates the score once per
  // centroid per row through ArrayTransform's interpreted path, where a
  // nested interpreted HOF costs ~40µs/element and a native expression
  // ~0.1µs).

  /** Native cosine; accepts array<float|double> on each side (the
    * trained-centroid assignment scores float corpus rows against
    * double k-means centroids). */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.expressions.CosineSimilarity(
        org.apache.spark.sql.GraftSqlShim.expression(a),
        org.apache.spark.sql.GraftSqlShim.expression(b)))

  /** Native dot product (same float/double flexibility). */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.expressions.DotProduct(
        org.apache.spark.sql.GraftSqlShim.expression(a),
        org.apache.spark.sql.GraftSqlShim.expression(b)))

  /** Native squared L2 distance (same float/double flexibility). */
  def l2sqNative(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.expressions.SquaredDistance(
        org.apache.spark.sql.GraftSqlShim.expression(a),
        org.apache.spark.sql.GraftSqlShim.expression(b)))
}
