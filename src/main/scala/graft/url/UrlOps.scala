package graft.url

import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable UTF8String adapters for [[PyUrl]]. Spark's generated Java
  * calls these via the static forwarders (`graft.url.UrlOps.cleanUrl(...)`),
  * which keeps every URL expression inside whole-stage codegen.
  */
object UrlOps {
  def cleanUrl(u: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.cleanUrl(u.toString))

  def canonicalizeUrl(u: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.canonicalizeUrl(u.toString))

  def netloc(u: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.netloc(u.toString))

  def scheme(u: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.scheme(u.toString))

  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.host(u.toString))

  def resolve(base: UTF8String, href: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urljoin(base.toString, href.toString))

  /** null ⇒ scheme filtered out (crawler.py:37-38). */
  def resolveClean(base: UTF8String, href: UTF8String): UTF8String = {
    val r = PyUrl.resolveClean(base.toString, href.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def inDomain(u: UTF8String, domain: UTF8String): Boolean =
    PyUrl.inDomain(u.toString, domain.toString)
}
