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
    * downstream clustering while the quadratic blowup is cut. Default = no
    * cap (and no extra shuffle), preserving exact candidate semantics.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = Int.MaxValue): DataFrame = {
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
    val pairs =
      if (maxBucketSize == Int.MaxValue) {
        val l = buckets.select(col("band"), col("bucket"), col("id").as("a"))
        val r = buckets.select(col("band"), col("bucket"), col("id").as("b"))
        l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
          .select("a", "b").dropDuplicates("a", "b")
      } else {
        val sized = buckets.withColumn("bsz",
          count(lit(1)).over(Window.partitionBy("band", "bucket")))
        val small = sized.filter(col("bsz") <= maxBucketSize)
        val allPairs = small.select(col("band"), col("bucket"), col("id").as("a"))
          .join(small.select(col("band"), col("bucket"), col("id").as("b")),
            Seq("band", "bucket"))
          .filter(col("a") < col("b")).select("a", "b")
        val big = sized.filter(col("bsz") > maxBucketSize).withColumn("rk",
          row_number().over(Window.partitionBy("band", "bucket").orderBy("id")))
        val chained = big.select(col("band"), col("bucket"), col("rk"), col("id").as("a"))
          .join(big.select(col("band"), col("bucket"), (col("rk") - 1).as("rk"),
            col("id").as("b")), Seq("band", "bucket", "rk"))
          .select("a", "b")
        allPairs.union(chained).dropDuplicates("a", "b")
      }
    ngramJaccard(docs, pairs, idCol, textCol, shingleK)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit fingerprints, banded into 4×16-bit chunks
    * (any pair within hamming ≤ 3 shares at least one exact chunk), verified
    * by exact hamming distance. Output: (a, b, hamming).
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunks = hashed.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    val l = chunks.select(col("chunk_idx"), col("chunk"),
      col("id").as("a"), col("sh").as("fa"))
    val r = chunks.select(col("chunk_idx"), col("chunk"),
      col("id").as("b"), col("sh").as("fb"))
    l.join(r, Seq("chunk_idx", "chunk"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
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
    */
  def embeddingNearDup(embs: DataFrame, idCol: String, vecCol: String,
      planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val bucketed = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", SimSearch.hyperplaneBucket(col("v"), planes))
    val l = bucketed.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val r = bucketed.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("cosine", SimSearch.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
