package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.textops.textfns._

/** Training-data deduplication operators (builder-prompt mandate). All are
  * plan-level compositions over the custom text expressions — shuffles are
  * keyed by content hashes/buckets so they scale horizontally; candidate
  * verification is always exact (LSH only proposes).
  */
object Dedup {

  /** Default hot-bucket chain cap for every LSH family (minHashLsh, simHash,
    * embeddingNearDup). Named so callers depending on exact full-pair-set
    * semantics notice the r4 default flip away from Int.MaxValue and can opt
    * back out explicitly.
    */
  val DefaultMaxBucketSize: Int = 4096

  /** Candidate pairs from an LSH bucket table, with a hot-bucket cap — the
    * shared scale guard for every LSH family (minhash bands, simhash chunks,
    * hyperplane buckets). Input: one row per (bucket key(s), id). Output:
    * distinct (a, b) with a < b.
    *
    * Buckets of ≤ `maxBucketSize` rows emit all pairs (exact candidate
    * semantics). Oversized buckets — N near-identical docs would otherwise
    * emit N²/2 pairs inside ONE task — emit only CONSECUTIVE id pairs (a
    * sorted chain, O(N) pairs): mutual near-dups stay connected for
    * downstream clustering while the quadratic blowup is cut. The join moves
    * only (keys, id) — payloads (signatures, vectors) are re-joined by id by
    * the caller, so they cross the wire once per id, never once per pair.
    */
  private[operators] def bucketPairs(buckets: DataFrame, keys: Seq[String],
      maxBucketSize: Int): DataFrame = {
    val kc = keys.map(col)
    if (maxBucketSize == Int.MaxValue) {
      val l = buckets.select(kc :+ col("id").as("a"): _*)
      val r = buckets.select(kc :+ col("id").as("b"): _*)
      l.join(r, keys).filter(col("a") < col("b"))
        .select("a", "b").dropDuplicates("a", "b")
    } else {
      val w = Window.partitionBy(kc: _*)
      val sized = buckets.withColumn("bsz", count(lit(1)).over(w))
      val small = sized.filter(col("bsz") <= maxBucketSize)
      val allPairs = small.select(kc :+ col("id").as("a"): _*)
        .join(small.select(kc :+ col("id").as("b"): _*), keys)
        .filter(col("a") < col("b")).select("a", "b")
      val big = sized.filter(col("bsz") > maxBucketSize)
        .withColumn("rk", row_number().over(w.orderBy("id")))
      val chained = big.select((kc :+ col("rk")) :+ col("id").as("a"): _*)
        .join(big.select((kc :+ (col("rk") - 1).as("rk")) :+ col("id").as("b"): _*),
          keys :+ "rk")
        .select("a", "b")
      allPairs.union(chained).dropDuplicates("a", "b")
    }
  }

  /** Exact dedup: group by full-content hash, keep the lowest id.
    * Output: (doc_id, text_hash, dup_count) for kept docs.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("text_hash"), col("dup_count"))

  /** MinHash+LSH near-dup candidates, exactly verified by n-gram Jaccard.
    *
    * shingle → minhash(numHashes) → split into `bands` bands → IDS-ONLY
    * bucket-join on (band, band-slice hash) → distinct candidate pairs →
    * shingle sets re-joined per pair (the ngramJaccard shape) → exact
    * Jaccard → threshold. Output: (a, b, jaccard) with a < b.
    *
    * Shuffle accounting (the 100-TB argument): the band join and the pair
    * dedup move only (band, bucket, id) triples — shingle arrays cross the
    * wire exactly once, keyed by id in the per-pair re-join, instead of
    * bands× through the bucket join.
    *
    * `maxBucketSize` caps pathological buckets (N identical docs ⇒ N²/2
    * pairs in one bucket): oversized buckets emit only CONSECUTIVE id pairs
    * (a sorted chain, O(N) pairs) — mutual near-dups stay connected for
    * downstream clustering while the quadratic blowup is cut. The cap is ON
    * by default (4096, same as simHash/embeddingNearDup): at 10^10 docs with
    * heavy exact duplication, band buckets go quadratic without it. Pass
    * Int.MaxValue for exact candidate semantics (and no sizing shuffle).
    *
    * @note BEHAVIOR CHANGE (r4): the default flipped from Int.MaxValue
    *       (exact full pair set) to [[DefaultMaxBucketSize]]. Callers that
    *       depend on every intra-bucket pair — not just a connectivity-
    *       preserving chain — must now pass `maxBucketSize = Int.MaxValue`
    *       explicitly.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val sigs = docs.select(
      col(idCol).as("id"),
      minhash_sig(col(textCol), shingleK, numHashes).as("sig"))
    // band buckets: one row per (doc, band) keyed by the slice hash
    val buckets = sigs.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat(lit("band"), b.cast("string"),
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")))))
        .as(Seq("band", "bucket")))
    val pairs = bucketPairs(buckets, Seq("band", "bucket"), maxBucketSize)
    ngramJaccard(docs, pairs, idCol, textCol, shingleK)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit fingerprints, banded into 4×16-bit chunks
    * (any pair within hamming ≤ 3 shares at least one exact chunk), verified
    * by exact hamming distance. Output: (a, b, hamming).
    *
    * Each chunk has only 2^16 possible values, so at web scale EVERY chunk
    * bucket is hot (~10^5+ docs per bucket at 10^10 docs) — `maxBucketSize`
    * chains oversized buckets (see [[bucketPairs]]) instead of emitting their
    * quadratic pair set. The chunk join is ids-only; fingerprints rejoin by
    * id for the exact hamming verify.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunks = hashed.select(col("id"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    bucketPairs(chunks, Seq("chunk_idx", "chunk"), maxBucketSize)
      .join(hashed.select(col("id").as("a"), col("sh").as("fa")), Seq("a"))
      .join(hashed.select(col("id").as("b"), col("sh").as("fb")), Seq("b"))
      .withColumn("hamming", hamming64(col("fa"), col("fb")))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** n-gram Jaccard similarity for an explicit candidate-pair set (exact). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
    pairs
      .join(sh.select(col("id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col("id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))))
      .withColumn("jaccard",
        when(col("uni") === 0, lit(0.0))
          .otherwise(col("inter").cast("double") / col("uni")))
      .select("a", "b", "jaccard")
  }

  /** Embedding-cosine near-dup: LSH-bucketed (random-hyperplane sign bits)
    * candidate pairs verified by exact cosine. Output: (a, b, cosine).
    *
    * Near-dup clusters are exactly where embedding mass concentrates, so a
    * popular region can put N²/2 pairs into one of the 2^planes buckets —
    * `maxBucketSize` chains oversized buckets (see [[bucketPairs]]). The
    * bucket join is ids-only; vectors rejoin by id for the exact-cosine
    * verify, crossing the wire once per id, never once per candidate pair.
    */
  def embeddingNearDup(embs: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, threshold: Double = 0.95,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val vecs = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bucketed = vecs
      .select(col("id"), SimSearch.hyperplaneBucket(col("v"), planes).as("bucket"))
    bucketPairs(bucketed, Seq("bucket"), maxBucketSize)
      .join(vecs.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(vecs.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .withColumn("cosine", SimSearch.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
