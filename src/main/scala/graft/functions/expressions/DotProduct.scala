package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the dot product over two numeric array
  * columns (`array<float>` or `array<double>`, independently on each
  * side), with whole-stage codegen.
  *
  * Semantics match `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _+_)`
  * when both arrays have the SAME length (always true at the quantized
  * ANN call site, where both sides are d-dimensional vectors): elements
  * widened to double before arithmetic, sequential accumulation, 0.0
  * for empty input, and a null element poisons the result to NULL. For
  * UNEQUAL lengths the semantics intentionally diverge: zip_with pads
  * the shorter array with nulls so the HOF composition returns NULL,
  * while this expression (like DuckDB's `list_dot_product`) dots the
  * common prefix. It runs as one fused primitive loop instead of
  * zip_with building an intermediate array. This is the scoring kernel
  * of the quantized ANN path (dots of reconstruction vectors). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // A null ELEMENT in the common prefix makes the whole result null,
  // matching the HOF composition exactly: zip_with produces a null
  // product and aggregate's `+` propagates it (and DuckDB's
  // list_dot_product is NULL-poisoned the same way). Reading the slot
  // without the check would silently treat it as 0.0.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      def get(arr: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // Only emit the null-element branch when an element CAN be null:
      // with containsNull=false on both sides `nullable` resolves false,
      // nullSafeCodeGen renders ev.isNull as the literal "false", and an
      // unconditional "${ev.isNull} = true;" would generate the Janino
      // compile error "false = true;" (silent fallback to interpreted).
      val elemChecks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None,
      ).flatten
      val nullBreak =
        if (elemChecks.isEmpty) ""
        else s"if (${elemChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      val assign =
        if (elemChecks.isEmpty) s"${ev.value} = $dot;"
        else s"if (!${ev.isNull}) { ${ev.value} = $dot; }"
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $nullBreak
        |  $dot += (${get(a, isFloat(left))}) * (${get(b, isFloat(right))});
        |}
        |$assign
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
