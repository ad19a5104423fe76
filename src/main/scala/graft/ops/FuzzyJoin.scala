package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string join for entity resolution (dirty product/shop
  * names, crawl-title variants): all pairs within a Levenshtein
  * distance bound, WITHOUT the cartesian product — candidates come from
  * q-gram blocking, and only candidates pay the O(len²) distance.
  */
object FuzzyJoin {

  /** All (left_value, right_value, dist) pairs of DISTINCT non-null
    * values with `levenshtein ≤ maxDist`.
    *
    * Blocking is exact (no missed pairs), by a pigeonhole split:
    *   - `k` edits destroy at most `k·q` of a string's q-grams, so if
    *     EITHER side has at least `k·q + 1` grams (length ≥ q·(k+1)),
    *     some gram survives into the other side — the pair appears in
    *     the gram equi-join.
    *   - pairs where BOTH sides are shorter than `q·(k+1)` come from
    *     the short×short product — a bounded, broadcastable set (there
    *     are only so many distinct strings under a fixed tiny length).
    *   Candidates then pass the `|len(a) − len(b)| ≤ k` window before
    *   the verify.
    *
    * Scale: the gram join shuffles (gram → values); a pathological
    * corpus sharing one hot gram degrades toward quadratic — raise `q`
    * to sharpen selectivity (cost: the short×short tier widens). The
    * verify is exact `levenshtein`, identical in Spark and the oracle
    * engine. */
  def editDistancePairs(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 1, "maxDist >= 0 and q >= 1")
    val shortLen = q * (maxDist + 1) // strictly-below ⇒ no guaranteed survivor
    val lv = left.select(col(leftCol).cast("string").as("a"))
      .where(col("a").isNotNull).distinct()
    val rv = right.select(col(rightCol).cast("string").as("b"))
      .where(col("b").isNotNull).distinct()

    val lg = gramsOf(lv, "a", q)
    val rg = gramsOf(rv, "b", q)
    val longCand = lg.join(rg, "__g").select(col("a"), col("b")).distinct()
    val shortCand = lv.where(length(col("a")) < shortLen)
      .crossJoin(rv.where(length(col("b")) < shortLen))
    longCand.unionByName(shortCand).distinct()
      .where(abs(length(col("a")) - length(col("b"))) <= maxDist)
      .select(col("a").as("left_value"), col("b").as("right_value"),
        levenshtein(col("a"), col("b")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** One row per distinct (value, positional q-gram), grams deduped by
    * content: `explode` over the 1-based start offsets. */
  private def gramsOf(df: DataFrame, c: String, q: Int): DataFrame = df
    .where(length(col(c)) >= q)
    .select(col(c), explode(transform(
      sequence(lit(1), length(col(c)) - (q - 1)),
      i => col(c).substr(i, lit(q)))).as("__g"))
    .distinct()
}
