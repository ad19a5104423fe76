package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator (SURVEY §4.3 path (c):
  * LogicalPlan + Strategy + SparkPlan): keep the k best rows per key
  * under an ordering.
  *
  * The window formulation (`row_number().over(partitionBy(keys).orderBy(
  * ord)) <= k`) shuffles EVERY row and fully sorts every group.
  * This operator plans as partial → shuffle → final, like an
  * aggregation: the map side already reduces each partition to ≤ k rows
  * per key with a bounded heap, so at 1000 executors the exchange carries
  * at most partitions×keys×k rows instead of the whole table, and nothing
  * is ever fully sorted. That asymmetric cut is what survives a 100×
  * scale-up.
  */
case class TopKPerKey(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "use ORDER BY ... LIMIT k (TakeOrderedAndProject) for global top-k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKey {

  /** Group keys go through raw UnsafeRow byte comparison (the heaps) and
    * HashPartitioning (the exchange), so floating-point keys need the
    * same 0.0/-0.0 and NaN canonicalization Spark's optimizer applies to
    * Window partition specs and grouping keys — without it a double key
    * holding both zero encodings splits one semantic group across two
    * heaps and potentially two partitions. Spark's own
    * NormalizeFloatingNumbers rule does not know this node, so the
    * constructors normalize explicitly. No-op for non-float keys. */
  def normalized(keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
      child: LogicalPlan): TopKPerKey =
    TopKPerKey(keys.map(GraftSqlShim.normalizeFloats), ordering, k, child)
}

case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** The final pass streams key groups, so it needs them contiguous: a
    * (spillable, radix) SortExec over the already-reduced shuffle output.
    * The partial pass takes input in any order. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(e => SortOrder(e, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = ordering
    val childOutput = child.output
    if (partial) {
      // Map-side reduction with BOUNDED memory: at most `maxPartialKeys`
      // per-key heaps of ≤ k rows. Rows whose key misses a full map pass
      // straight through — the partial output only has to be a superset
      // of the true per-key top-k; the final pass makes it exact. This is
      // the same degrade-to-passthrough Spark's partial aggregation uses
      // when its hash map can't grow, so high-cardinality keys cost
      // shuffle volume, never an OOM.
      val maxKeys = conf.getConfString("graft.topk.maxPartialKeys", "131072").toInt
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // Heap priority = "worst first" so head is the eviction candidate.
        val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
        val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        val passThrough = iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < kLocal) heap += row.copy()
              else if (ord.lt(row, heap.head)) {
                heap.dequeue(); heap += row.copy()
              }
              Iterator.empty
            case None if heaps.size < maxKeys =>
              val heap = mutable.PriorityQueue.empty[InternalRow](ord)
              heaps.put(key.copy(), heap)
              heap += row.copy()
              Iterator.empty
            case None => Iterator.single(row)
          }
        }
        // `++` is by-name: the flush runs after the input is exhausted.
        passThrough ++ heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      }
    } else {
      // Keys arrive sorted (requiredChildOrdering), so groups are
      // contiguous: keep ONE k-bounded heap at a time — O(k) memory
      // regardless of key cardinality.
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
        val heap = mutable.PriorityQueue.empty[InternalRow](ord)
        var currentKey: UnsafeRow = null
        def drain(): Iterator[InternalRow] = {
          val out = heap.dequeueAll.reverseIterator
          out
        }
        val grouped = iter.flatMap { row =>
          val key = keyProj(row)
          if (currentKey == null) {
            currentKey = key.copy()
            heap += row.copy()
            Iterator.empty
          } else if (key == currentKey) {
            if (heap.size < kLocal) heap += row.copy()
            else if (ord.lt(row, heap.head)) {
              heap.dequeue(); heap += row.copy()
            }
            Iterator.empty
          } else {
            val out = drain().toVector
            currentKey = key.copy()
            heap += row.copy()
            out.iterator
          }
        }
        grouped ++ (if (currentKey == null) Iterator.empty else drain())
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** Plans the logical node as partial (map-side) + final (post-shuffle);
  * EnsureRequirements inserts the key exchange between them. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordering, k, child) =>
      val partialExec = TopKPerKeyExec(keys, ordering, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, ordering, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** User API. */
object TopK {
  /** The k best rows per key group under `orderBy` (best = first in that
    * order). Column args: `TopK.perKey(df, Seq($"user"), Seq($"score".desc), 10)`.
    *
    * Columns are resolved by round-tripping through the analyzer (a
    * throwaway `df.sort` / `df.select`) rather than converted directly:
    * Spark 4's Column→Expression conversion is lazy
    * (`ColumnNodeExpression` wrapping a non-serializable internal node)
    * and only the analyzer produces clean catalyst trees. */
  def perKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column],
      k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val sorted = df.sort(orderBy: _*).queryExecution.analyzed.asInstanceOf[Sort]
    val sortOrders = sorted.order
    val keyExprs: Seq[Expression] = df.select(keys: _*).queryExecution.analyzed
      .asInstanceOf[Project].projectList.map {
        case Alias(child, _) => child
        case ne: NamedExpression => ne
      }
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKey.normalized(keyExprs, sortOrders, k, sorted.child))
  }
}
