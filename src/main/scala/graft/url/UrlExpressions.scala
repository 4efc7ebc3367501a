package graft.url

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the reference's URL pipeline (crawler.py:24-42).
  * All are null-intolerant, deterministic, and whole-stage-codegen'd via
  * static calls into [[UrlOps]] (SURVEY.md §4.3 rationale: Spark's built-in
  * `parse_url` diverges from urllib on the corner cases the contract pins).
  */
abstract class UrlUnary extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  protected def opName: String
  override protected def nullSafeEval(input: Any): Any =
    call(input.asInstanceOf[UTF8String])
  protected def call(u: UTF8String): UTF8String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.url.UrlOps.$opName($c)")
}

/** crawler.py:39-41 — reference-exact clean URL (the dedup/trace key). */
case class CleanUrl(child: Expression) extends UrlUnary {
  override protected def opName: String = "cleanUrl"
  override protected def call(u: UTF8String): UTF8String = UrlOps.cleanUrl(u)
  override protected def withNewChildInternal(c: Expression): CleanUrl = copy(child = c)
}

/** north_rule extended canonicalizer — frontier sharding key ONLY. */
case class CanonicalizeUrl(child: Expression) extends UrlUnary {
  override protected def opName: String = "canonicalizeUrl"
  override protected def call(u: UTF8String): UTF8String = UrlOps.canonicalizeUrl(u)
  override protected def withNewChildInternal(c: Expression): CanonicalizeUrl = copy(child = c)
}

/** crawler.py:24-26 — raw netloc (case/port/userinfo preserved). */
case class UrlNetloc(child: Expression) extends UrlUnary {
  override protected def opName: String = "netloc"
  override protected def call(u: UTF8String): UTF8String = UrlOps.netloc(u)
  override protected def withNewChildInternal(c: Expression): UrlNetloc = copy(child = c)
}

/** crawler.py:37-38 — lowercased scheme. */
case class UrlScheme(child: Expression) extends UrlUnary {
  override protected def opName: String = "scheme"
  override protected def call(u: UTF8String): UTF8String = UrlOps.scheme(u)
  override protected def withNewChildInternal(c: Expression): UrlScheme = copy(child = c)
}

/** Host for politeness/robots keying (userinfo/port stripped). */
case class UrlHost(child: Expression) extends UrlUnary {
  override protected def opName: String = "host"
  override protected def call(u: UTF8String): UTF8String = UrlOps.host(u)
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(child = c)
}

/** crawler.py:36 — `urljoin(base, href)`, urllib-exact. */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlOps.resolve(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => s"graft.url.UrlOps.resolve($b, $h)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlResolve =
    copy(left = l, right = r)
}

/** crawler.py:24-26 — `urlparse(u).netloc.endswith(domain)` verbatim. */
case class UrlInDomain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(u: Any, d: Any): Any =
    UrlOps.inDomain(u.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, d) => s"graft.url.UrlOps.inDomain($u, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UrlInDomain =
    copy(left = l, right = r)
}

/** Column-level API: `import graft.url.urlfns._`. */
object urlfns {
  def clean_url(c: Column): Column = column(CleanUrl(expression(c)))
  def canonicalize_url(c: Column): Column = column(CanonicalizeUrl(expression(c)))
  def url_netloc(c: Column): Column = column(UrlNetloc(expression(c)))
  def url_scheme(c: Column): Column = column(UrlScheme(expression(c)))
  def url_host(c: Column): Column = column(UrlHost(expression(c)))
  def url_resolve(base: Column, href: Column): Column =
    column(UrlResolve(expression(base), expression(href)))
  def url_in_domain(u: Column, domain: Column): Column =
    column(UrlInDomain(expression(u), expression(domain)))
}

/** Fused crawler.py:36-42 per-link pipeline: UrlResolve → scheme filter →
  * CleanUrl in one expression, one parse. NULL output = filtered by scheme.
  */
case class ResolveClean(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlOps.resolveClean(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => s"""
      ${ev.value} = graft.url.UrlOps.resolveClean($b, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveClean =
    copy(left = l, right = r)
}

object urlfns2 {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def resolve_clean(base: Column, href: Column): Column =
    column(ResolveClean(expression(base), expression(href)))
}
