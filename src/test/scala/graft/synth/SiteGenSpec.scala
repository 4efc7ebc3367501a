package graft.synth

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SURVEY.md §7.3 #4: synthesis must be a pure function of (seed, url) —
  * identical rows at any partition count, so local[8] and local[32] see the
  * same input (the scaling-evidence precondition).
  */
class SiteGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pages are identical across partition counts") {
    def snap(parts: Int): Seq[(String, String)] =
      SiteGen.pages(spark, "example.com", 500, hosts = 4, outDegree = 6,
        numPartitions = parts)
        .select("url", "text")
        .as[(String, String)]
        .collect()
        .sortBy(_._1)
        .toSeq
    val a = snap(2)
    val b = snap(16)
    assert(a == b)
  }

  test("html is reproducible byte-for-byte for a fixed (seed, i)") {
    val h1 = SiteGen.buildHtml("example.com", 4, 1000, 8, 42L, 123L)
    val h2 = SiteGen.buildHtml("example.com", 4, 1000, 8, 42L, 123L)
    assert(h1 == h2)
    val h3 = SiteGen.buildHtml("example.com", 4, 1000, 8, 43L, 123L)
    assert(h1 != h3) // seed matters
  }

  test("text column equals engine extraction (input_hint invariant by construction)") {
    val rows = SiteGen.pages(spark, "example.com", 50, hosts = 2, outDegree = 4,
      numPartitions = 2)
      .select("html", "text")
      .as[(Array[Byte], String)]
      .collect()
    rows.foreach { case (html, text) =>
      assert(graft.html.HtmlExtract.extractText(html) == text)
    }
  }
}
