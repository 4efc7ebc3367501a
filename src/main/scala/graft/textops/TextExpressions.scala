package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable adapters for [[TextOps]]. */
object TextExprOps {
  def langId(t: UTF8String): UTF8String =
    UTF8String.fromString(TextOps.langId(t.toString))

  def qualityScore(t: UTF8String): Long = TextOps.qualityScore(t.toString)

  def shingles(t: UTF8String, k: Int): ArrayData =
    new GenericArrayData(TextOps.shingles(t.toString, k))

  def minHashFromText(t: UTF8String, k: Int, numHashes: Int): ArrayData =
    new GenericArrayData(TextOps.minHash(TextOps.shingles(t.toString, k), numHashes))

  def simHash(t: UTF8String): Long = TextOps.simHash(t.toString)

  def fingerprint(t: UTF8String): Long = TextOps.rollingFingerprint(t.toString)

  def hamming(a: Long, b: Long): Int = TextOps.hamming64(a, b)
}

/** Heuristic language code (en/fr/de/es/zh/und). */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(i: Any): Any =
    TextExprOps.langId(i.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.textops.TextExprOps.langId($c)")
  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
}

/** Composite [0,1000] heuristic quality score. */
case class QualityScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(i: Any): Any =
    TextExprOps.qualityScore(i.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.textops.TextExprOps.qualityScore($c)")
  override protected def withNewChildInternal(c: Expression): QualityScore = copy(child = c)
}

/** Distinct hashed word k-shingles (sorted set). */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(i: Any): Any =
    TextExprOps.shingles(i.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.textops.TextExprOps.shingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}

/** MinHash signature (k-shingles → numHashes slots). */
case class MinHashSig(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(i: Any): Any =
    TextExprOps.minHashFromText(i.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.textops.TextExprOps.minHashFromText($c, $k, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(i: Any): Any =
    TextExprOps.simHash(i.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.textops.TextExprOps.simHash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Rolling-hash document fingerprint. */
case class Fingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(i: Any): Any =
    TextExprOps.fingerprint(i.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.textops.TextExprOps.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint = copy(child = c)
}

/** Hamming distance between two 64-bit fingerprints. */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExprOps.hamming(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.textops.TextExprOps.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
    copy(left = l, right = r)
}

object textfns {
  def lang_id(c: Column): Column = column(LangId(expression(c)))
  def quality_score(c: Column): Column = column(QualityScore(expression(c)))
  def shingles(c: Column, k: Int): Column = column(Shingles(expression(c), k))
  def minhash_sig(c: Column, k: Int, numHashes: Int): Column =
    column(MinHashSig(expression(c), k, numHashes))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def fingerprint(c: Column): Column = column(Fingerprint(expression(c)))
  def hamming64(a: Column, b: Column): Column =
    column(Hamming64(expression(a), expression(b)))
}
