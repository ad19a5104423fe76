package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two numeric
  * array columns (`array<float>` or `array<double>`, independently on
  * each side), with whole-stage codegen.
  *
  * Semantics match [[graft.functions.VectorFunctions.cosine]] exactly
  * (floats widened to double before any arithmetic; sequential
  * accumulation; `sqrt(na)*sqrt(nb)` denominator; NULL when either norm is
  * zero; a null ELEMENT poisons the result to NULL like zip_with's null
  * product under aggregate's `+`) — so on equal-length inputs it is
  * interchangeable with the HOF composition and with the DuckDB oracle,
  * but runs as one fused primitive loop instead of three
  * zip_with/aggregate array traversals with intermediate array
  * allocations. Unequal-length inputs DIVERGE from the HOF form: this
  * expression sums over the common prefix, while zip_with pads the
  * shorter array with NULLs so the HOF cosine returns NULL (same
  * documented divergence as DotProduct/SquaredDistance). The
  * double-element side exists
  * for k-means-TRAINED centroid tables, whose means are doubles — the
  * trained assignment path scores (float corpus, double centroid) pairs.
  */
case class CosineSimilarity(left: Expression, right: Expression)
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

  // Always nullable: zero-norm input yields NULL regardless of input
  // nullability, so ev.isNull is always a real slot in codegen.
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) dot / denom else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // nullable is unconditionally true (zero-norm → NULL), so ev.isNull
      // is always assignable here — no DotProduct-style literal-false
      // guard needed.
      val elemChecks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($i)") else None,
      ).flatten
      val nullBreak =
        if (elemChecks.isEmpty) ""
        else s"if (${elemChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $nullBreak
        |  double $x = ${get(a, isFloat(left))};
        |  double $y = ${get(b, isFloat(right))};
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |if (!${ev.isNull}) {
        |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |  if ($denom > 0.0) { ${ev.value} = $dot / $denom; }
        |  else { ${ev.isNull} = true; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
