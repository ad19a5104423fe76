package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for squared L2 distance over two numeric
  * array columns (`array<float>` or `array<double>`, independently on
  * each side), with whole-stage codegen.
  *
  * Semantics match [[graft.functions.VectorFunctions.l2sq]] —
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _+_)` on
  * double-widened elements — exactly for same-length arrays: sequential
  * accumulation in index order, 0.0 for empty input, a null element
  * poisons the result to NULL. For unequal lengths it sums the common
  * prefix (zip_with would return NULL), same divergence [[DotProduct]]
  * documents. This is the k-means inner loop ([[graft.functions.Knn]]
  * trainLoop): the HOF form allocates a zipped intermediate array and
  * walks an interpreted expression tree per centroid per row, which made
  * Lloyd's iterations expression-interpretation-bound rather than
  * FLOP-bound.
  */
case class SquaredDistance(left: Expression, right: Expression)
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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // Same literal-false guard as DotProduct: with containsNull=false
      // on both sides `nullable` can resolve false and ev.isNull renders
      // as the literal "false" — an assignment to it would be a Janino
      // compile error (silent interpreted fallback).
      val elemChecks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None,
      ).flatten
      val nullBreak =
        if (elemChecks.isEmpty) ""
        else s"if (${elemChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      val assign =
        if (elemChecks.isEmpty) s"${ev.value} = $acc;"
        else s"if (!${ev.isNull}) { ${ev.value} = $acc; }"
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $nullBreak
        |  double $d = (${get(a, isFloat(left))}) - (${get(b, isFloat(right))});
        |  $acc += $d * $d;
        |}
        |$assign
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_dist"
}
