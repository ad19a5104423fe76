package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the BPE greedy encode — the apply leg
  * of a trained merge table, replacing the repo's one remaining Scala
  * UDF (the r8 advice item). Semantics are
  * [[graft.functions.Bpe.encodeWord]] verbatim (lowest-rank-first
  * non-overlapping merges to fixpoint; null word → null, empty word →
  * empty array): the expression delegates to the same
  * `encodeWithRanks` loop the driver-side reference uses, so the two
  * cannot drift — bit-identity is spec-pinned in BpeSpec.
  *
  * Why an Expression and not a UDF: the merge table rides a BROADCAST
  * handle referenced from generated code (`addReferenceObj`), so tasks
  * deserialize an id, not a 30k-entry map; the input stays a
  * UTF8String and the output is built directly as Catalyst ArrayData —
  * none of ScalaUDF's per-row Catalyst⇄Scala converter round-trips —
  * and the projection it sits in stays inside whole-stage codegen
  * instead of being fenced off by a BatchEvalPython/ScalaUDF node.
  * The encode loop itself is data-dependent iteration with early exit
  * (the reason no fold-shaped HOF expresses it without paying k
  * passes), invoked as one straight method call per row. */
case class BpeEncode(child: Expression,
    table: Broadcast[(Array[(String, String)], Map[(String, String), Int])])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  /** The per-row kernel, shared by interpreted eval and codegen. */
  def encode(w: UTF8String): ArrayData = {
    val syms = graft.functions.Bpe.encodeWithRanks(
      w.toString, table.value._1, table.value._2)
    new GenericArrayData(syms.map(UTF8String.fromString).toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The expression instance itself is the reference object: it holds
    // the broadcast handle and the kernel, so generated code is one
    // virtual call — no table in the task closure, no converters.
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
