package graft.url

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

object Vectors {
  def load(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/vectors/$name")
    require(in != null, s"missing vector resource $name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map(_.split("\t", -1)).toVector
    finally src.close()
  }
  def b64(s: String): String =
    if (s.isEmpty) "" else new String(Base64.getDecoder.decode(s), UTF_8)
}

/** Golden-vector equality vs stdlib urllib.parse (tools/gen_vectors.py)
  * for every URL expression — the M1 exactness gate (SURVEY.md §5.3).
  */
class UrlExprSpec extends AnyFunSuite {

  /** scalatestplus bridge is not in the offline cache — sample Gen directly
    * with deterministic seeds.
    */
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("url_clean.tsv: urlparse fields + clean_url match urllib exactly") {
    for (row <- Vectors.load("url_clean.tsv")) {
      val Array(urlB, scheme, netlocB, pathB, paramsB, queryB, fragB, cleanB) = row
      val url = Vectors.b64(urlB)
      val p = PyUrl.urlparse(url)
      assert(p.scheme == scheme, s"scheme of $url")
      assert(p.netloc == Vectors.b64(netlocB), s"netloc of $url")
      assert(p.path == Vectors.b64(pathB), s"path of $url")
      assert(p.params == Vectors.b64(paramsB), s"params of $url")
      assert(p.query == Vectors.b64(queryB), s"query of $url")
      assert(p.fragment == Vectors.b64(fragB), s"fragment of $url")
      assert(PyUrl.cleanUrl(url) == Vectors.b64(cleanB), s"clean of $url")
    }
  }

  test("url_join.tsv: urljoin → scheme filter → clean → netloc → in_domain") {
    checkJoinVectors("url_join.tsv")
  }

  test("url_fuzz.tsv: 3000 randomized pipeline vectors match urllib") {
    checkJoinVectors("url_fuzz.tsv")
  }

  private def checkJoinVectors(name: String): Unit = {
    for (row <- Vectors.load(name)) {
      val Array(baseB, hrefB, joinedB, scheme, keep, cleanB, netlocB, inDom) = row
      val base = Vectors.b64(baseB)
      val href = Vectors.b64(hrefB)
      val joined = PyUrl.urljoin(base, href)
      assert(joined == Vectors.b64(joinedB), s"urljoin($base, $href)")
      assert(PyUrl.scheme(joined) == scheme, s"scheme of $joined")
      val kept = scheme == "http" || scheme == "https"
      assert(kept == (keep == "true"), s"keep of $joined")
      // fused pipeline must agree exactly: null = filtered
      val fused = PyUrl.resolveClean(base, href)
      if (kept) assert(fused == Vectors.b64(cleanB), s"resolveClean($base, $href)")
      else assert(fused == null, s"resolveClean($base, $href) should be null")
      if (kept) {
        val clean = PyUrl.cleanUrl(joined)
        assert(clean == Vectors.b64(cleanB), s"clean of $joined")
        assert(PyUrl.netloc(clean) == Vectors.b64(netlocB), s"netloc of $clean")
        assert(PyUrl.inDomain(clean, "example.com") == (inDom == "true"), s"in_domain of $clean")
      }
    }
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "ftp")
    host <- Gen.oneOf("example.com", "Sub.Example.COM", "a.b.example.com:8080",
      "evil-example.com", "example.com:443")
    path <- Gen.listOfN(3, Gen.oneOf("a", "b", "..", ".", "p;x", "q%20r", ""))
      .map(_.mkString("/", "/", ""))
    query <- Gen.oneOf("", "?a=1&b=2", "?z=9&a=1", "?dup=1&dup=0")
    frag <- Gen.oneOf("", "#f", "#a#b")
  } yield s"$scheme://$host$path$query$frag"

  test("property: cleanUrl is idempotent and fragment-free") {
    forAll(urlGen) { u =>
      val c = PyUrl.cleanUrl(u)
      assert(PyUrl.cleanUrl(c) == c)
      assert(!c.contains('#'))
    }
  }

  test("property: canonicalizeUrl is idempotent, lowercase-host, default-port-free") {
    forAll(urlGen) { u =>
      val c = PyUrl.canonicalizeUrl(u)
      assert(PyUrl.canonicalizeUrl(c) == c)
      val host = PyUrl.host(c)
      assert(host == host.toLowerCase)
      assert(!c.startsWith("https://") || !PyUrl.netloc(c).endsWith(":443"))
    }
  }

  test("property: urljoin with empty href returns base (self-link rule)") {
    forAll(urlGen) { u => assert(PyUrl.urljoin(u, "") == u) }
  }

  test("resolveClean fast path == full path on 400k random (base, href) pairs") {
    // atoms biased toward the structural chars the fast path classifies on,
    // including the sanitize set (\t\r\n, leading space) and dot segments
    val atoms = Array(
      "https://", "http://", "HTTP://", "//", "/", "./", "../", "/..", "/.",
      "a", "b9", "Ex.COM", "h:8080", ":8080", "?q=1&a", "#f", ";p", "?", "#",
      ";", ":", "mailto:x@y", "\t", " ", "\n", "%20", "u@", "[::1]", "x y", ".")
    val r = new scala.util.Random(20260816L)
    def rand(): String =
      (0 until r.nextInt(6)).map(_ => atoms(r.nextInt(atoms.length))).mkString
    var fastHits = 0
    def check(base: String, href: String): Unit = {
      val fast = PyUrl.resolveCleanFast(base, href)
      if (fast != null) {
        fastHits += 1
        val full = PyUrl.resolveCleanFull(base, href)
        assert(fast == full,
          s"fast '$fast' != full '$full' for base='$base' href='$href'")
      }
    }
    (0 until 400000).foreach(_ => check(rand(), rand()))
    // structured pass: well-formed-ish shapes where the fast path applies,
    // with the suffix soup probing every classification boundary
    val scheme = Array("https://", "http://", "HTTPS://", "https:/", "")
    val hostA = Array("Ex.COM:8080", "h", "u@h:1", "[::1]:8", "", "h\th")
    val pathA = Array("", "/", "/a/b", "/a;p/b;q", "/a//b/", "/a/./b", "/..",
      "/p?x=1;y", "/p#f;g", "/%20", "/a?", "/a#", "/x y")
    (0 until 100000).foreach { _ =>
      val base = scheme(r.nextInt(scheme.length)) + hostA(r.nextInt(hostA.length)) +
        pathA(r.nextInt(pathA.length))
      val href =
        if (r.nextBoolean())
          scheme(r.nextInt(scheme.length)) + hostA(r.nextInt(hostA.length)) +
            pathA(r.nextInt(pathA.length))
        else pathA(r.nextInt(pathA.length)) + pathA(r.nextInt(pathA.length))
      check(base, href)
    }
    assert(fastHits > 30000, s"fast path exercised only $fastHits times")
  }

  test("netloc suffix-match quirks (SURVEY.md §A.3)") {
    assert(!PyUrl.inDomain("https://example.com:443/", "example.com"))
    assert(PyUrl.inDomain("https://evilexample.com/", "example.com"))
    assert(!PyUrl.inDomain("https://Example.com/", "example.com"))
    assert(PyUrl.inDomain("https://sub.example.com/", "example.com"))
  }

  test("expressions evaluate via Catalyst eval path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val lit = Literal(UTF8String.fromString("HTTP://ExAmple.COM:8080/Path;param?q=1&a=2#frag"),
      org.apache.spark.sql.types.StringType)
    assert(CleanUrl(lit).eval(null).toString == "http://ExAmple.COM:8080/Path?q=1&a=2")
    assert(UrlNetloc(lit).eval(null).toString == "ExAmple.COM:8080")
    assert(UrlScheme(lit).eval(null).toString == "http")
    val base = Literal(UTF8String.fromString("https://example.com/a/b/c"),
      org.apache.spark.sql.types.StringType)
    val href = Literal(UTF8String.fromString("../z"),
      org.apache.spark.sql.types.StringType)
    assert(UrlResolve(base, href).eval(null).toString == "https://example.com/a/z")
  }
}
