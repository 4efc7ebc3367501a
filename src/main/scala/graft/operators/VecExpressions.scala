package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd vector kernels over float-array embedding columns. Numerically
  * IDENTICAL to the `aggregate(zip_with(...))` higher-order-function forms
  * they replace (sequential double accumulation in element order — the
  * DuckDB-oracle bit-exactness contract) but ~10× cheaper: no per-row array
  * allocation, no lambda interpretation.
  */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Sign-bit bucket of `planes` deterministic hyperplanes — same planes and
    * same sequential double dot as the Column-composition form it replaces.
    */
  def hyperplaneBucket(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getFloat(d).toDouble * SimSearch.planeComponent(p, d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.operators.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VecOps.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.VecOps.norm($a)")
  override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
}

case class HyperplaneBucketExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VecOps.hyperplaneBucket(a.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.VecOps.hyperplaneBucket($a, $planes)")
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr =
    copy(child = c)
}

object vecfns {
  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def vec_norm(a: Column): Column = column(VecNorm(expression(a)))
  def hyperplane_bucket(v: Column, planes: Int): Column =
    column(HyperplaneBucketExpr(expression(v), planes))
}
