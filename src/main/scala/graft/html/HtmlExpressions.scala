package graft.html

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable adapters (static forwarders) for the HTML layer. */
object HtmlOps {
  def extractHrefs(html: Array[Byte]): ArrayData = {
    val links = HtmlExtract.extractLinks(html)
    new GenericArrayData(links.map(UTF8String.fromString).toArray[Any])
  }
  def extractText(html: Array[Byte]): UTF8String =
    UTF8String.fromString(HtmlExtract.extractText(html))
}

/** crawler.py:32-35 — `soup.find_all('a', href=True)` as an array-returning
  * expression; compose with `explode` for the generator form. Malformed
  * input → empty array, never an exception (O-16).
  */
case class ExtractHrefs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    HtmlOps.extractHrefs(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.html.HtmlOps.extractHrefs($c)")
  override protected def withNewChildInternal(c: Expression): ExtractHrefs = copy(child = c)
}

/** input_hint per-row invariant — `ExtractText(html) == text` byte-wise:
  * bs4-get_text-contract extraction (SURVEY.md §2.2 text-extraction row).
  */
case class ExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    HtmlOps.extractText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.html.HtmlOps.extractText($c)")
  override protected def withNewChildInternal(c: Expression): ExtractText = copy(child = c)
}

object htmlfns {
  def extract_hrefs(html: Column): Column = column(ExtractHrefs(expression(html)))
  def extract_text(html: Column): Column = column(ExtractText(expression(html)))
}
