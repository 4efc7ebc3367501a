package graft.sketch

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

import graft.util.SerializableHadoopConf

/** Url-hash-bucket-sharded seen-set Bloom sketch persisted as one file per
  * bucket — the 10^10-scale replacement for broadcasting one monolithic
  * sketch (BASELINE.md's accounting: ~12 GB at 10^10 URLs, infeasible to
  * broadcast; ~12 MB per bucket at 2^10 buckets).
  *
  * Design:
  *  - '''bucket(url) is `pmod(hash(url), B)` — Spark's own HashPartitioning
  *    id function, THE SAME key as [[SeenUrlStore.bucketCol]]''': a frame
  *    already hash-partitioned by url (every post-groupBy/distinct candidate
  *    frame in the engine) arrives with each bucket wholly inside one task,
  *    so with matching bucket count the probe needs NO exchange of its own
  *    (`assumeDistributed`) — and because the probe preserves the incoming
  *    distribution, the exact seen-store probe downstream consumes the SAME
  *    single candidate exchange. Murmur3 (Spark `hash`) is independent of
  *    the sketch's own bit-hash family, so sharding does not bias per-shard
  *    bit distribution.
  *  - '''build/merge''': the delta's urls are repartitioned BY BUCKET, so each
  *    task owns whole buckets; it folds its urls into the existing bucket file
  *    and atomically replaces it (FileContext rename OVERWRITE). No driver
  *    materialization — the full sketch never exists in any single JVM.
  *  - '''probe''': rows stream one at a time; each task loads a bucket's
  *    shard file on first touch and keeps it for the task (exactly one
  *    bucket per task when routed or aligned; memory per task = O(one shard)
  *    per distinct bucket touched).
  *  - Missing shard file ⇒ empty sketch ⇒ `maybe_seen = false`, which is
  *    exact: a bucket file exists iff some seen url hashed to it, and
  *    replacement is atomic. Bloom adds are idempotent, so task retries and
  *    resume-time re-merges of already-merged urls are harmless.
  *
  * Crash safety: shard files are merged BEFORE the epoch's snapshot commit,
  * so after a crash they can only be AHEAD of the resumed snapshot — extra
  * bits cause false positives (routed to the authoritative anti-join), never
  * false negatives.
  */
final class BloomShardStore(val dir: String, val numBuckets: Int,
    val bitsPerShard: Long, val numHashes: Int) extends Serializable {
  require(numBuckets > 0)
  import BloomShardStore._

  /** The bucket of a url Column — `pmod(hash(url), B)`, Spark's
    * HashPartitioning id (see class doc; matches [[SeenUrlStore.bucketCol]]).
    */
  def bucketCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(url), lit(numBuckets))

  /** Fold `urls` (a single `url` string column) into the shard files. */
  def mergeDelta(urls: DataFrame): Unit = {
    require(urls.columns.length == 1,
      s"mergeDelta expects a single url column, got ${urls.columns.mkString(",")}")
    val (d, bits, k, nb) = (dir, bitsPerShard, numHashes, numBuckets)
    val sconf = new SerializableHadoopConf(
      urls.sparkSession.sparkContext.hadoopConfiguration)
    urls
      .withColumn("__b", bucketCol(col(urls.columns.head)))
      .repartition(nb, col("__b"))
      .sortWithinPartitions("__b")
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = sconf.value
        var cur = -1
        var sk: BloomSketch = null
        def flush(): Unit = if (sk != null) writeShard(s"$d/bucket-$cur.bloom", sk, conf)
        it.foreach { row =>
          val b = row.getInt(1)
          if (b != cur) {
            flush()
            cur = b
            sk = readShard(s"$d/bucket-$b.bloom", conf)
              .getOrElse(new BloomSketch(bits, k))
          }
          sk.add(row.getString(0))
        }
        flush()
      }
  }

  /** Adds a `maybe_seen` boolean to `df`, resolving each row against its
    * bucket's shard file. `false` ⇒ definitely unseen (no false negatives).
    * `assumeDistributed = true` skips the co-locating exchange (pass only
    * when `df` is already url-hash-partitioned with partition count ==
    * numBuckets; correctness never depends on it — each task loads whatever
    * bucket a row computes to, it only bounds duplicate shard loads).
    */
  def probe(df: DataFrame, urlCol: String,
      assumeDistributed: Boolean = false): DataFrame = {
    val (d, nb) = (dir, numBuckets)
    val outSchema = df.schema.add("maybe_seen", BooleanType, nullable = false)
    val width = df.schema.size
    val urlIdx = df.schema.fieldIndex(urlCol) // url may sit anywhere in df
    val sconf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val keyed = df.withColumn("__b", bucketCol(col(urlCol)))
    val routed =
      if (assumeDistributed) keyed
      else keyed.repartition(nb, col("__b"))
    routed
      .mapPartitions { it =>
        val conf = sconf.value
        // one sketch per distinct bucket this task touches — exactly one in
        // the routed and aligned shapes (bucket id == partition id)
        val open = new java.util.HashMap[Int, Option[BloomSketch]]()
        it.map { row =>
          val b = row.getInt(width)
          var sk = open.get(b)
          if (sk == null) {
            sk = readShard(s"$d/bucket-$b.bloom", conf)
            open.put(b, sk)
          }
          val u = row.getString(urlIdx)
          val flag = sk.exists(_.mightContain(u))
          Row.fromSeq(row.toSeq.dropRight(1) :+ flag)
        }
      }(Encoders.row(outSchema))
  }

  /** Bytes across all existing shard files (observability/tests). */
  def totalBytes(conf: Configuration): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(_.getPath.getName.endsWith(".bloom")).map(_.getLen).sum
  }
}

object BloomShardStore {

  /** Atomic shard replace: tmp write + FileContext rename(OVERWRITE). The
    * tmp name must be GLOBALLY unique — a speculative/retried copy of the
    * same merge task on another executor can share a thread id, and two
    * writers interleaving into one tmp file would install a corrupted shard
    * (cleared bits ⇒ bloom false negatives ⇒ re-visited URLs). Task attempt
    * ids are unique per attempt across the app; the UUID covers non-task
    * callers.
    */
  private def writeShard(path: String, sk: BloomSketch, conf: Configuration): Unit = {
    val fin = new Path(path)
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => s"a${tc.taskAttemptId()}")
      .getOrElse(s"u${java.util.UUID.randomUUID().toString.take(8)}")
    val tmp = new Path(fin.getParent, s".tmp-${fin.getName}-$attempt")
    val fs = fin.getFileSystem(conf)
    fs.mkdirs(fin.getParent)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(tmp, true)))
    try {
      out.writeLong(sk.numBits)
      out.writeInt(sk.numHashes)
      var i = 0
      while (i < sk.words.length) { out.writeLong(sk.words(i)); i += 1 }
    } finally out.close()
    FileContext.getFileContext(fin.toUri, conf)
      .rename(tmp, fin, Options.Rename.OVERWRITE)
  }

  private def readShard(path: String, conf: Configuration): Option[BloomSketch] = {
    val p = new Path(path)
    val fs: FileSystem = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = new DataInputStream(new java.io.BufferedInputStream(fs.open(p)))
      try {
        val bits = in.readLong()
        val k = in.readInt()
        val sk = new BloomSketch(bits, k)
        var i = 0
        while (i < sk.words.length) { sk.words(i) = in.readLong(); i += 1 }
        Some(sk)
      } finally in.close()
    }
  }
}
