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

  /** Keyed diff of two snapshots of the same table: one row per key whose
    * membership or tracked values differ, `change` ∈
    * 'added' (key only in `newSnap`) | 'removed' (only in `oldSnap`) |
    * 'changed' (in both, some `compareCols` value differs). Unchanged
    * keys emit nothing. The load-validation companion to the MERGE
    * snapshot loads (SURVEY §2.4) and [[compressHistory]]: MERGE applies
    * a batch, this AUDITS what a batch did — or reconciles two
    * independently-built copies of a table.
    *
    * Scale shape: each side collapses to (key, 128-bit digest) IN ITS
    * SCAN PROJECTION — the tracked payload never enters the exchange, so
    * the full-outer join moves ~24 bytes/row regardless of row width,
    * and with both snapshots bucketed by key even that exchange
    * disappears. The digest is md5 over a null-distinct encoding
    * (per-column null sentinel + field separator, both ASCII control
    * chars); change detection compares digests WITHIN one engine, so it
    * needs the encoding to be injective, not canonical across engines.
    *
    * `keyCols` must be a non-null primary key of each snapshot:
    * duplicate keys would cross-match in the join and null keys never
    * equi-join (each side's null-key rows would read as added+removed).
    * Values containing the separator/sentinel control characters (0x1e,
    * 0x1f) could alias across column boundaries — absent by construction
    * in machine-generated keys/measures, the caller's contract for
    * free-text columns. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "keys and compare columns required")
    def digested(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+
        md5(concat_ws("\u001f", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u001e"))): _*)).as(as): _*)
    digested(oldSnap, "__od")
      .join(digested(newSnap, "__nd"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__od").isNull, "added")
          .when(col("__nd").isNull, "removed")
          .when(col("__od") =!= col("__nd"), "changed"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
