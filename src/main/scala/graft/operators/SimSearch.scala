package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.textops.TextOps

/** Approximate-nearest-neighbor search over an embedding column
  * (builder-prompt mandate): brute-force cosine top-k as the exact baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path (probes
  * only same-bucket candidates; buckets are deterministic functions of the
  * vector, so the bucketing join shuffles by bucket key and scales
  * horizontally).
  */
object SimSearch {

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a fixed function, identical across executors — no RNG state.
    */
  @inline def planeComponent(p: Int, d: Int): Double = {
    val h = TextOps.mix64(p.toLong * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL)
    // map to (-1, 1)
    h.toDouble / Long.MaxValue.toDouble
  }

  /** Sign-bit bucket of `planes` random hyperplanes (codegen'd expression;
    * same planes and accumulation order as the original higher-order-function
    * composition).
    */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    vecfns.hyperplane_bucket(v, planes)

  /** Exact cosine similarity between two float-array columns (sequential
    * double accumulation — the oracle bit-exactness contract).
    */
  def cosine(a: Column, b: Column): Column = {
    val na = vecfns.vec_norm(a)
    val nb = vecfns.vec_norm(b)
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(vecfns.vec_dot(a, b) / (na * nb))
  }

  /** Cosine from PREcomputed norms — for all-pairs/brute plans where norm
    * recomputation per pair would dominate (|C|·|Q| pairs but only |C|+|Q|
    * vectors). Bit-identical: same doubles, same dot/(na·nb).
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(vecfns.vec_dot(a, b) / (na * nb))

  /** Brute-force cosine top-k: every query row against the full corpus —
    * the exact baseline. Queries should be small (broadcast side).
    * Output: (query_id, neighbor_id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", vecfns.vec_norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", vecfns.vec_norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: same-bucket candidates only, then exact cosine top-k
    * within the candidate set. Recall < 1 by construction; at scale the
    * cross join shrinks from |Q|·|C| to Σ_bucket |Q_b|·|C_b|.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", hyperplaneBucket(col("cv"), planes))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", hyperplaneBucket(col("qv"), planes))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}

object SimSearchIvf {
  import org.apache.spark.sql.SparkSession

  /** Deterministic driver-side k-means coarse quantizer (fixed iterations,
    * init = lowest-id vectors) — the IVF index's training step. Centroid
    * count is tiny (≤ a few thousand); training data is a bounded sample.
    */
  def trainCentroids(sample: Array[(Long, Array[Float])], nLists: Int,
      iters: Int): Array[Array[Float]] = {
    val sorted = sample.sortBy(_._1)
    val dim = sorted.head._2.length
    var centroids = sorted.take(nLists).map(_._2.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Long](nLists)
      sorted.foreach { case (_, v) =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(nLists) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids.map(_.map(_.toFloat))
  }

  def nearest(v: Array[Float], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d2 = 0.0
      var d = 0
      while (d < v.length) {
        val diff = v(d) - centroids(c)(d); d2 += diff * diff; d += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  def nearestN(v: Array[Float], centroids: Array[Array[Double]], n: Int): Array[Int] = {
    centroids.zipWithIndex.map { case (cv, i) =>
      var d2 = 0.0
      var d = 0
      while (d < v.length) { val diff = v(d) - cv(d); d2 += diff * diff; d += 1 }
      (d2, i)
    }.sortBy(_._1).take(n).map(_._2)
  }

  /** IVF ANN: k-means coarse quantizer → corpus sharded into inverted lists
    * → each query probes its nProbe nearest lists only → exact cosine top-k
    * within the probed lists. At scale the list assignment shuffles by list
    * id, so the candidate join touches |corpus|·nProbe/nLists rows.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      trainN: Int = 4096, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].sort(col(idCol)).limit(trainN).collect()
    val centroids = trainCentroids(sample, nLists, iters).map(_.map(_.toDouble))
    val bcast = spark.sparkContext.broadcast(centroids)

    val listed = corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, nearest(v, bcast.value)) }
      .toDF("neighbor_id", "cv", "list")
    val probed = queries.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        nearestN(v, bcast.value, nProbe).map(l => (id, v, l))
      }.toDF("query_id", "qv", "list")

    val scored = listed.join(probed, Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", SimSearch.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
