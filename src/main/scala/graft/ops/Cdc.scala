package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: turn a full per-key version history
  * into SCD-type-2 validity intervals — keep only CHANGE POINTS (rows
  * whose tracked values differ from the key's previous version) and
  * stamp each with [valid_from, valid_to) plus an is_current flag. The
  * natural companion to the reference's MERGE loads (SURVEY §2.4): MERGE
  * keeps last-writer-wins snapshots, this keeps the queryable history a
  * warehouse derives from the same staged batches.
  *
  * Scale shape: two windows over the SAME (key, ts) partitioning — one
  * exchange, partitioned by the (high-cardinality) key, each partition
  * bounded by a key's version count. Change detection is null-safe
  * struct equality (`<=>`), so NULL→value and value→NULL transitions
  * count as changes and multi-column tracking needs no special-casing. */
object Cdc {

  /** One row per change point: all of `df`'s columns are preserved via
    * the tracked struct, output is (keyCols*, valueCols*, valid_from,
    * valid_to, is_current) with valid_to = the NEXT change's `tsCol`
    * (null while current). `tsCol` must be unique per key (a version
    * number or event timestamp). */
  def compressHistory(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val tracked: Column = struct(valueCols.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(tracked, 1).over(w))
      // First version (null prev) is always a change point; <=> makes
      // value-null transitions compare deterministically.
      .filter(col("__prev").isNull || !(col("__prev") <=> tracked))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
