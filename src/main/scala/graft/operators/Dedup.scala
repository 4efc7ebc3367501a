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
    * shingle → minhash(numHashes) → split into `bands` bands → bucket-join
    * on (band, band-slice hash) → distinct candidate pairs → exact Jaccard
    * via array_intersect/array_union on the shingle sets → threshold.
    * Output: (a, b, jaccard) with a < b.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val sigs = docs.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"),
      minhash_sig(col(textCol), shingleK, numHashes).as("sig"))
    // band buckets: one row per (doc, band) keyed by the slice hash
    val buckets = sigs.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat(lit("band"), b.cast("string"),
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")))))
        .as(Seq("band", "bucket")))
    val l = buckets.select(col("band"), col("bucket"),
      col("id").as("a"), col("sh").as("sha"))
    val r = buckets.select(col("band"), col("bucket"),
      col("id").as("b"), col("sh").as("shb"))
    val pairs = l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sha", "shb")
      .dropDuplicates("a", "b")
    pairs
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))))
      .filter(col("uni") > 0)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
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
