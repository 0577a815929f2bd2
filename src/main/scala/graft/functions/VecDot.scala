package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Sequential dot product of two float/double arrays as ONE codegen'd
 * expression node (round-6, guide §1.2 step 2: make the per-task work
 * fast once the job shape is right).
 *
 * The similarity queries originally folded with Catalyst HOFs —
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — but every HOF is
 * `CodegenFallback`: 3 interpreted 64-element folds per candidate pair
 * dominated d05/e01/e03/e05. The first rewrite (an explicit 64-term
 * `a[0]*b[0] + …` Add chain) fixed the interpretation but exploded the
 * expression TREE — e05 builds 16 dots per row and its ~4k-node
 * projection cost more in optimizer passes + Janino compilation than the
 * data itself (measured 2.2 s → 10.6 s at sf0.1). This expression is the
 * fix for both: one node per dot, a tight compiled loop per row.
 *
 * Value semantics are EXACTLY the old HOF fold's, bit for bit:
 *  - the sum is the sequential left fold ((0.0 + p0) + p1) + … in element
 *    order (IEEE doubles: same ops, same order, same result);
 *  - float elements are widened to double before multiplying (exact, the
 *    same as the old per-element `cast("double")` transform);
 *  - a null INPUT array yields null (BinaryExpression null-intolerance);
 *  - a null ELEMENT on either side yields null (the old zip_with product
 *    was null and `null + x` poisons the whole aggregate);
 *  - mismatched lengths yield null (zip_with pads the shorter side with
 *    nulls, poisoning the fold the same way).
 * Engine-vs-DuckDB parity for every query using it is re-verified against
 * the unchanged oracles at sf0.001/sf0.01/sf0.1.
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(
      s"VecDot expects array<float|double> inputs, got $other")
  }

  // deferred to analysis (the constructor sees unresolved children)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"VecDot expects array<float|double> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  // two literal arrays (e.g. a centroid's self-dot inside a norm) fold to
  // a literal at optimization time instead of re-evaluating per row
  override def foldable: Boolean = left.foldable && right.foldable

  private def lFloat: Boolean = elemType(left) == FloatType
  private def rFloat: Boolean = elemType(right) == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VecDot.getClass.getName.stripSuffix("$") + "$"
    val boxed = ctx.freshName("graftDot") // two dots in one scope must not collide
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double $boxed = $cls.MODULE$$.dotBoxed($a, $b, $lFloat, $rFloat);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Null on length mismatch or any null element (see class doc);
    * otherwise the sequential double fold. */
  def dotBoxed(a: ArrayData, b: ArrayData,
      lFloat: Boolean, rFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}
