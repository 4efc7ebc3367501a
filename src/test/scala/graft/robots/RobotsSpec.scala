package graft.robots

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for the robots.txt contract (RFC 9309-lite as defined
  * by the Python oracle in tools/gen_site_fixtures.py): 1250 fuzz vectors
  * over gnarly bodies — exotic line separators (VT/FF/FS/GS/RS/NEL/LS/PS,
  * the Python `splitlines` set), NBSP/FS padding (Python `str.strip`),
  * comments, garbage lines, multi-group files — each with the oracle's
  * allow/deny decision (tools/gen_robots_fuzz.py).
  */
class RobotsSpec extends AnyFunSuite {

  test("robots_fuzz.tsv: parse + longest-prefix decisions match the Python oracle") {
    val in = getClass.getResourceAsStream("/vectors/robots_fuzz.tsv")
    require(in != null)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rows = try src.getLines().drop(1).map { line =>
      val Array(b64, url, allowed) = line.split("\t", -1)
      (new String(Base64.getDecoder.decode(b64), UTF_8), url, allowed == "1")
    }.toVector finally src.close()
    assert(rows.size >= 1000)
    var blocked = 0
    val ruleCache = scala.collection.mutable.HashMap.empty[String, Seq[Robots.Rule]]
    rows.foreach { case (body, url, want) =>
      val rules = ruleCache.getOrElseUpdate(body, Robots.parse(body))
      val got = Robots.allowed(url, rules)
      assert(got == want,
        s"decision mismatch for url=$url body=${escape(body)} rules=$rules")
      if (!want) blocked += 1
    }
    assert(blocked >= 40) // the corpus genuinely exercises deny paths
  }

  private def escape(s: String): String =
    s.flatMap {
      case c if c >= 0x20 && c < 0x7f => c.toString
      case c => f"\\u${c.toInt}%04x"
    }
}
