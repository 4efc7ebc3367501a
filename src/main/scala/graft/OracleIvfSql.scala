package graft

/** DuckDB SQL twin of [[graft.operators.SimSearchIvf.ivfTopK]] at its
  * PRODUCTION configuration (nProbe < nLists) — the k-means trainer is
  * deterministic (init = lowest-id vectors, fixed iteration count, sorted
  * accumulation), so the whole index build is replayed in SQL by unrolling
  * the iterations as CTE pairs:
  *
  *   train     = first `trainN` vectors by id (CAST to DOUBLE[] — exact)
  *   cent_0    = first `nLists` training vectors
  *   iter i:   assign_i = argmin_c d2(v, cent_{i-1}[c])   (ties → lowest c,
  *             matching the engine's strict `<` scan)
  *             cent_i   = per-dim mean over assigned vectors in vec_id
  *             order (the engine's sorted fold); empty cluster keeps the
  *             previous centroid
  *   centf     = final centroids through the engine's Double→Float→Double
  *             round-trip
  *   corpus/queries then assign, probe nProbe nearest lists, and score
  *   exact cosine top-k within the probed lists.
  *
  * Bit-exactness: d2 is the same sequential double fold over the same
  * doubles (list_reduce is a left fold; float→double casts are exact), and
  * `list_cosine_similarity(DOUBLE[])` ≡ the engine's codegen'd cosine was
  * established by the q_ann_brute/q_ann_lsh oracles.
  */
object OracleIvfSql {

  /** embeddings are dim-64 at every sf (TESTDATA.md). */
  private val Dim = 64

  /** Sequential-fold squared L2 between DOUBLE[] expressions `v` and `c` —
    * the exact twin of SimSearchIvf.nearest's accumulation loop.
    */
  private def d2(v: String, c: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, $Dim), " +
      s"d -> ($v[d] - $c[d]) * ($v[d] - $c[d]))), (a, b) -> a + b)"

  def ivfTopK(k: Int, nLists: Int, nProbe: Int, queryMaxId: Int,
      trainN: Int = 4096, iters: Int = 5): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""assign_$i AS (
         |  SELECT vec_id, e, c FROM (
         |    SELECT t.vec_id, t.e, cc.c,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${d2("t.e", "cc.vec")}, cc.c) AS rn
         |    FROM train t CROSS JOIN cent_${i - 1} cc) WHERE rn = 1
         |), cent_$i AS (
         |  SELECT p.c, coalesce(m.vec, p.vec) AS vec
         |  FROM cent_${i - 1} p LEFT JOIN (
         |    SELECT c, list_transform(generate_series(1, $Dim), d ->
         |      list_reduce(list_prepend(0.0, list_transform(vs, v -> v[d])),
         |        (a, b) -> a + b) / cnt) AS vec
         |    FROM (SELECT c, list(e ORDER BY vec_id) AS vs,
         |            CAST(count(*) AS DOUBLE) AS cnt
         |          FROM assign_$i GROUP BY c)
         |  ) m ON p.c = m.c
         |)""".stripMargin
    }.mkString(",\n")

    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), train AS (
       |  SELECT vec_id, e FROM v ORDER BY vec_id LIMIT $trainN
       |), cent_0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c, e AS vec
       |  FROM (SELECT vec_id, e FROM train ORDER BY vec_id LIMIT $nLists)
       |),
       |$iterCtes,
       |centf AS (
       |  SELECT c, list_transform(vec, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS vec
       |  FROM cent_$iters
       |), corpusl AS (
       |  SELECT vec_id, e, c FROM (
       |    SELECT v.vec_id, v.e, cc.c,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${d2("v.e", "cc.vec")}, cc.c) AS rn
       |    FROM v CROSS JOIN centf cc) WHERE rn = 1
       |), probes AS (
       |  SELECT vec_id, e, c FROM (
       |    SELECT v.vec_id, v.e, cc.c,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${d2("v.e", "cc.vec")}, cc.c) AS rn
       |    FROM v CROSS JOIN centf cc WHERE v.vec_id < $queryMaxId) WHERE rn <= $nProbe
       |), scored AS (
       |  SELECT p.vec_id AS query_id, cl.vec_id AS neighbor_id,
       |    list_cosine_similarity(p.e, cl.e) AS cosine
       |  FROM probes p JOIN corpusl cl ON p.c = cl.c AND cl.vec_id <> p.vec_id
       |)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin
  }
}
