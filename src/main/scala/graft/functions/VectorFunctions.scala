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
}
