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

  private val EmptyArray = new GenericArrayData(Array.empty[Any])

  /** Metered twin of [[extractHrefs]]: same links, plus per-partition
    * (pages, bytes_html, links_out, parse_errors) counters into `acc`.
    * `html == null` (fetch failure) counts as a parse error and yields an
    * empty array (≡ the plain expression's null through explode_outer).
    */
  def extractHrefsMetered(html: Array[Byte], acc: ExtractMetricsAcc): ArrayData =
    if (html == null) { acc.record(0L, 0L, 1L); EmptyArray }
    else {
      val (links, err) = HtmlExtract.extractLinksErr(html)
      acc.record(html.length.toLong, links.size.toLong, if (err) 1L else 0L)
      new GenericArrayData(links.map(UTF8String.fromString).toArray[Any])
    }
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

/** [[ExtractHrefs]] with the per-partition fetch/extract metrics accumulator
  * riding the same codegen'd evaluation (the SQLMetric pattern: the
  * accumulator serializes into the task with the expression and reports via
  * task completion). NULL-TOLERANT by design — a null html (failed fetch)
  * must reach the counters as a parse error; it evaluates to an EMPTY array,
  * which under `explode_outer` produces the same single null-href row the
  * plain expression's null does.
  */
case class ExtractHrefsMetered(child: Expression, acc: ExtractMetricsAcc)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    HtmlOps.extractHrefsMetered(
      child.eval(input).asInstanceOf[Array[Byte]], acc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accRef = ctx.addReferenceObj("extractAcc", acc,
      classOf[ExtractMetricsAcc].getName)
    val childGen = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = graft.html.HtmlOps.extractHrefsMetered(
          ${childGen.isNull} ? null : ${childGen.value}, $accRef);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): ExtractHrefsMetered =
    copy(child = c)
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
  def extract_hrefs_metered(html: Column, acc: ExtractMetricsAcc): Column =
    column(ExtractHrefsMetered(expression(html), acc))
  def extract_text(html: Column): Column = column(ExtractText(expression(html)))
}
