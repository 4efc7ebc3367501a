package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SURVEY.md §5.3 SketchSpec: no false negatives, FPP bound, merge
  * associativity/commutativity (the treeAggregate precondition), cuckoo
  * delete, saturation fallback, distributed build equivalence.
  */
class SketchSpec extends AnyFunSuite {

  private def urls(from: Int, n: Int): Seq[String] =
    (from until from + n).map(i => s"https://h${i % 7}.example.com/p/$i?v=${i * 31}")

  test("bloom: no false negatives") {
    val b = BloomSketch.forExpected(10000, 0.01)
    val in = urls(0, 10000)
    in.foreach(b.add)
    assert(in.forall(b.mightContain))
  }

  test("bloom: FPP within 3x of target") {
    val b = BloomSketch.forExpected(20000, 0.01)
    urls(0, 20000).foreach(b.add)
    val probes = urls(1000000, 20000)
    val fp = probes.count(b.mightContain).toDouble / probes.size
    assert(fp < 0.03, s"observed fpp $fp")
  }

  test("bloom: merge is associative and commutative") {
    def fresh(parts: Seq[Seq[String]], order: Seq[Int]): BloomSketch = {
      val sketches = parts.map { p =>
        val s = BloomSketch.forExpected(3000, 0.01); p.foreach(s.add); s
      }
      order.map(sketches).reduceLeft((a, b) => a.merge(b))
    }
    val parts = Seq(urls(0, 500), urls(500, 500), urls(1000, 500))
    val a = fresh(parts, Seq(0, 1, 2))
    val b = fresh(parts, Seq(2, 0, 1))
    val c = fresh(parts, Seq(1, 2, 0))
    assert(a.words.sameElements(b.words) && b.words.sameElements(c.words))
  }

  test("bloom: treeAggregate build == local build membership") {
    val spark = SparkTestSession.spark
    val in = urls(0, 5000)
    val rdd = spark.sparkContext.parallelize(in, 8)
    val dist = BloomSketch.build(rdd, 5000, 0.01)
    assert(in.forall(dist.mightContain))
    val local = BloomSketch.forExpected(5000, 0.01)
    in.foreach(local.add)
    assert(dist.words.sameElements(local.words)) // OR-merge is exact, not approximate
  }

  test("cuckoo: no false negatives below load ceiling") {
    val c = CuckooSketch.forExpected(10000)
    val in = urls(0, 10000)
    assert(in.forall(c.add))
    assert(in.forall(c.mightContain))
    assert(c.loadFactor < 0.9)
  }

  test("cuckoo: low false-positive rate") {
    val c = CuckooSketch.forExpected(20000)
    urls(0, 20000).foreach(c.add)
    val probes = urls(1000000, 20000)
    val fp = probes.count(c.mightContain).toDouble / probes.size
    assert(fp < 0.01, s"observed fpp $fp") // 16-bit fp, b=4 → ~2^-13 · 8
  }

  test("cuckoo: delete removes membership (deletable property)") {
    val c = CuckooSketch.forExpected(1000)
    val in = urls(0, 1000)
    in.foreach(c.add)
    val victim = in(123)
    assert(c.mightContain(victim))
    assert(c.remove(victim))
    // after delete, only a hash-twin could still report true
    val twins = in.filterNot(_ == victim).count(u => !c.mightContain(u))
    assert(twins == 0) // no collateral false negatives
  }

  test("cuckoo: merge preserves membership or reports saturation") {
    val a = CuckooSketch.forExpected(4000)
    val b = CuckooSketch.forExpected(4000)
    val ua = urls(0, 2000)
    val ub = urls(2000, 2000)
    ua.foreach(a.add)
    ub.foreach(b.add)
    assert(a.merge(b))
    assert((ua ++ ub).forall(a.mightContain))
  }

  test("seen-sketch: treeAggregate build has no false negatives; tiny build degrades") {
    val spark = SparkTestSession.spark
    val in = urls(0, 3000)
    val rdd = spark.sparkContext.parallelize(in, 8)
    val dist = SeenSketch.build(rdd, 4000)
    assert(in.forall(dist.mightContain))
    assert(!dist.isDegraded, "healthy-capacity build should not saturate")
    // under-provisioned distributed build saturates → degraded, still no FN
    val tiny = SeenSketch.build(rdd, 64)
    assert(tiny.isDegraded)
    assert(in.forall(tiny.mightContain))
  }

  test("seen-sketch facade: saturation degrades to always-maybe, never false-negative") {
    val s = new SeenSketch(64) // deliberately tiny → forced saturation
    val in = urls(0, 5000)
    in.foreach(s.add)
    assert(s.isDegraded)
    assert(in.forall(s.mightContain)) // conservative after degrade
    // merge of degraded + healthy is degraded
    val h = new SeenSketch(10000)
    h.add("https://x.example.com/")
    assert(h.merge(s).isDegraded)
  }
}
