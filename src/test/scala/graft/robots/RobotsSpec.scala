package graft.robots

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Differential gate for the robots.txt contract (RFC 9309-lite as defined
  * by the Python oracle in tools/gen_site_fixtures.py): 1250 fuzz vectors
  * over gnarly bodies — exotic line separators (VT/FF/FS/GS/RS/NEL/LS/PS,
  * the Python `splitlines` set), NBSP/FS padding (Python `str.strip`),
  * comments, garbage lines, multi-group files, crawl-delay values across
  * the full Python float() grammar — each with the oracle's allow/deny
  * decision and parsed crawl-delay (tools/gen_robots_fuzz.py).
  */
class RobotsSpec extends AnyFunSuite {

  test("robots_fuzz.tsv: parse + longest-prefix decisions + crawl-delay match the Python oracle") {
    val in = getClass.getResourceAsStream("/vectors/robots_fuzz.tsv")
    require(in != null)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rows = try src.getLines().drop(1).map { line =>
      val Array(b64, url, allowed, delay) = line.split("\t", -1)
      (new String(Base64.getDecoder.decode(b64), UTF_8), url, allowed == "1", delay)
    }.toVector finally src.close()
    assert(rows.size >= 1000)
    var blocked = 0
    var withDelay = 0
    val parseCache = scala.collection.mutable.HashMap.empty[String, Robots.Parsed]
    rows.foreach { case (body, url, want, wantDelay) =>
      val parsed = parseCache.getOrElseUpdate(body, Robots.parseAll(body))
      val got = Robots.allowed(url, parsed.rules)
      assert(got == want,
        s"decision mismatch for url=$url body=${escape(body)} rules=${parsed.rules}")
      if (!want) blocked += 1
      // delay column: '' = none, 'nan' = any NaN, else IEEE-754 bit hex
      val gotDelay = parsed.crawlDelay match {
        case None => ""
        case Some(d) if d.isNaN => "nan"
        case Some(d) => f"${java.lang.Double.doubleToRawLongBits(d)}%016x"
      }
      assert(gotDelay == wantDelay,
        s"crawl-delay mismatch ($gotDelay vs $wantDelay) for body=${escape(body)}")
      if (wantDelay.nonEmpty) withDelay += 1
    }
    assert(blocked >= 40) // the corpus genuinely exercises deny paths
    assert(withDelay >= 40) // ...and the crawl-delay float grammar
  }

  test("delay_budget.tsv: politeness budget = max(1, int(60.0 // d)) with " +
    "CPython floordiv semantics, incl. the off-by-one divergence set") {
    val in = getClass.getResourceAsStream("/vectors/delay_budget.tsv")
    require(in != null)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rows = try src.getLines().drop(1).map { line =>
      val Array(bits, budget, diverges) = line.split("\t", -1)
      (java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(bits, 16)), budget.toLong, diverges == "1")
    }.toVector finally src.close()
    assert(rows.size >= 4000)
    // the corpus genuinely contains delays where floor(window/d) of the
    // rounded quotient is wrong — the cases this contract exists for
    assert(rows.count(_._3) >= 100)
    rows.foreach { case (d, want, diverges) =>
      val got = graft.plans.PlanOps.crawlDelayBudget(60.0, d)
      assert(got == want, f"budget mismatch for delay=$d%.17g " +
        f"(bits ${java.lang.Double.doubleToRawLongBits(d)}%016x): " +
        s"got $got want $want (diverges-from-naive=$diverges)")
    }
  }

  private def escape(s: String): String =
    s.flatMap {
      case c if c >= 0x20 && c < 0x7f => c.toString
      case c => f"\\u${c.toInt}%04x"
    }
}
