package graft.sketch

import java.io.DataOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** EXACT url-seen set as url-hash-bucketed SORTED shard files — the
  * bucket-local replacement for the per-epoch `left_anti` join against the
  * cumulative visited table (BASELINE.md 10^10 accounting: "dedup is
  * bucket-local"). The visited parquet remains the authoritative record;
  * this store is a derived exact index over the same rows, maintained
  * delta-per-epoch so it supports the snapshot layer's exact resume.
  *
  * Why: a plain parquet read cannot surface its file layout as a Catalyst
  * output partitioning, so the authoritative anti-join re-shuffles the whole
  * O(total-crawled) seen set EVERY epoch — ~600 GB of never-changing state
  * per epoch at 10^10 URLs. Here the big side is never shuffled at all:
  *
  *  - '''writeDelta(urls, epoch)''': the epoch's fetched urls (O(epoch), the
  *    only state that is new) are repartitioned by url-hash bucket
  *    ([[bucketCol]] = `pmod(hash(url), B)` — deliberately Spark's own
  *    HashPartitioning id function); each task writes
  *    one SORTED file per bucket: `bucket=<b>/e<epoch>.seen`, atomic rename.
  *  - '''filterUnseen(df, urlCol, upToEpoch)''': candidates are routed by
  *    the same bucket key — at worst an O(candidates) exchange, and ZERO
  *    exchange when the frame is already url-hash-partitioned with matching
  *    partition count (`assumeDistributed`); each task consults
  *    only its buckets' files with epoch ≤ `upToEpoch` — binary search by
  *    positioned reads for sparse probes (cost O(probes·log n), FLAT in the
  *    accumulated seen size), switching to a one-shot bulk load + in-memory
  *    search when the task probes a dense fraction of a shard (the regime
  *    where reading the shard once is optimal anyway).
  *
  * Exact resume falls out of the epoch-suffixed file names: a probe during
  * epoch e reads only files with epoch ≤ e, so deltas left behind by a
  * crashed/truncated later epoch are invisible, and the re-run of an epoch
  * deterministically overwrites its own files (same contract as the snapshot
  * store's data dirs). Task retries are idempotent for the same reason.
  *
  * Sizing: shard bytes ≈ total-seen × ~60 B / numBuckets — pick numBuckets
  * so a shard fits task memory for the bulk path (2^14 buckets ≈ 40 MB/shard
  * at 10^10 urls; sorting cost at write time is per-epoch-delta only).
  */
final class SeenUrlStore(val dir: String, val numBuckets: Int) extends Serializable {
  require(numBuckets > 0)
  import SeenUrlStore._

  /** True iff any shard file exists (driver-side; resume-rebuild decision). */
  def hasAnyData(conf: Configuration): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      s.isDirectory && s.getPath.getName.startsWith("bucket=") &&
        fs.listStatus(s.getPath).exists(_.getPath.getName.endsWith(".seen"))
    }
  }

  /** Write the epoch's url delta (single string column) as one sorted shard
    * file per non-empty bucket. Urls are deduplicated within the delta; the
    * caller guarantees cross-epoch disjointness (an url is fetched once).
    */
  def writeDelta(urls: DataFrame, epoch: Int): Unit = {
    require(urls.columns.length == 1,
      s"writeDelta expects a single url column, got ${urls.columns.mkString(",")}")
    val (d, nb) = (dir, numBuckets)
    urls
      .withColumn("__b", bucketCol(col(urls.columns.head)))
      .repartition(nb, col("__b"))
      .sortWithinPartitions("__b")
      .foreachPartition { (it: Iterator[Row]) =>
        val conf = new Configuration()
        var cur = -1
        val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        def flush(): Unit = if (cur >= 0 && buf.nonEmpty) {
          writeShard(s"$d/bucket=$cur/e$epoch.seen", buf, conf)
          buf.clear()
        }
        it.foreach { row =>
          val b = row.getInt(1)
          if (b != cur) { flush(); cur = b }
          buf += row.getString(0).getBytes(UTF_8)
        }
        flush()
      }
  }

  /** DRUM-style periodic merge: per bucket, fold every delta shard with
    * epoch ≤ `upToEpoch` (and any older base) into one `c<upToEpoch>.seen`
    * base file — probe cost stops growing with epoch count (a 500-epoch
    * crawl would otherwise open 500 delta files per consulted bucket).
    * Deltas are NEVER deleted: a resume that truncates snapshots back past
    * this compaction ignores the base (its epoch exceeds the probe's
    * `upToEpoch`) and falls back to the per-epoch deltas, so exact resume
    * is preserved; the re-run re-compacts deterministically (atomic
    * overwrite). Safe to run concurrently with probes — readers see the
    * base or not, and membership is identical either way.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, upToEpoch: Int): Unit = {
    val (d, nb) = (dir, numBuckets)
    import spark.implicits._
    spark.range(0, nb, 1, math.min(nb, 64)).as[Long]
      .foreachPartition { (it: Iterator[Long]) =>
        val conf = new Configuration()
        it.foreach(b => compactBucket(s"$d/bucket=$b", upToEpoch, conf))
      }
  }

  /** The bucket of a url Column — `pmod(hash(url), B)`, i.e. EXACTLY Spark's
    * own `HashPartitioning` id function. That choice makes a frame that is
    * already hash-partitioned by url (every post-groupBy/distinct candidate
    * frame in the engine) arrive with each bucket wholly inside one task, so
    * the probe can skip its exchange entirely (`assumeDistributed`).
    */
  def bucketCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(url), lit(numBuckets))

  /** Rows of `df` whose `urlCol` is in NO shard file with epoch ≤
    * `upToEpoch`. Exact (byte-equality on UTF-8), schema-preserving.
    *
    * `assumeDistributed = true` skips the co-locating exchange: correctness
    * NEVER depends on it (each task groups its rows by computed bucket and
    * opens exactly those buckets' files), it only bounds duplicate shard
    * loads — pass true only when `df` is already hash-partitioned by url
    * with partition count == numBuckets (then bucket i ⊆ partition i, even
    * under AQE coalescing, which merges whole partitions).
    */
  def filterUnseen(df: DataFrame, urlCol: String, upToEpoch: Int,
      assumeDistributed: Boolean = false): DataFrame = {
    val (d, nb) = (dir, numBuckets)
    val width = df.schema.size
    val urlIdx = df.schema.fieldIndex(urlCol)
    val outSchema = df.schema
    val keyed = df.withColumn("__b", bucketCol(col(urlCol)))
    val routed =
      if (assumeDistributed) keyed
      else keyed.repartition(nb, col("__b"))
    routed
      .mapPartitions { it =>
        val conf = new Configuration()
        // group the task's rows by bucket (a task may hold several buckets —
        // always under AQE coalescing, and by design when the caller skipped
        // the exchange), then probe one bucket at a time
        val groups = new java.util.HashMap[Int, scala.collection.mutable.ArrayBuffer[Row]]()
        it.foreach { row =>
          val b = row.getInt(width)
          var g = groups.get(b)
          if (g == null) {
            g = scala.collection.mutable.ArrayBuffer.empty[Row]
            groups.put(b, g)
          }
          g += row
        }
        val buckets = groups.keySet().iterator()
        new Iterator[Seq[Row]] {
          def hasNext: Boolean = buckets.hasNext
          def next(): Seq[Row] = {
            val b = buckets.next()
            val group = groups.get(b)
            val shards = openBucket(s"$d/bucket=$b", upToEpoch, group.size, conf)
            try {
              group.iterator.filter { r =>
                val key = r.getString(urlIdx).getBytes(UTF_8)
                !shards.exists(_.contains(key))
              }.map(r => Row.fromSeq(r.toSeq.dropRight(1))).toVector
            } finally shards.foreach(_.close())
          }
        }.flatten
      }(Encoders.row(outSchema))
  }
}

object SeenUrlStore {

  /** Shard file layout (all big-endian):
    *   int32 magic, int32 n, int64 offsets[n+1] (relative to data start),
    *   url bytes (concatenated, sorted unsigned-lexicographic = UTF-8 byte
    *   order = code-point order, deduplicated).
    */
  private val Magic = 0x5345454e // "SEEN"

  private def compareBytes(a: Array[Byte], b: Array[Byte], bLen: Int): Int = {
    val n = math.min(a.length, bLen)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - bLen
  }

  private def writeShard(path: String, urls: scala.collection.mutable.ArrayBuffer[Array[Byte]],
      conf: Configuration): Unit = {
    val sorted = urls.toArray
    java.util.Arrays.sort(sorted, new java.util.Comparator[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int = compareBytes(a, b, b.length)
    })
    // dedup adjacent (defensive — the delta should already be distinct)
    var n = 0
    var i = 0
    while (i < sorted.length) {
      if (n == 0 || compareBytes(sorted(i), sorted(n - 1), sorted(n - 1).length) != 0) {
        sorted(n) = sorted(i); n += 1
      }
      i += 1
    }
    val fin = new Path(path)
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => s"a${tc.taskAttemptId()}")
      .getOrElse(s"u${java.util.UUID.randomUUID().toString.take(8)}")
    val tmp = new Path(fin.getParent, s".tmp-${fin.getName}-$attempt")
    val fs = fin.getFileSystem(conf)
    fs.mkdirs(fin.getParent)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(fs.create(tmp, true)))
    try {
      out.writeInt(Magic)
      out.writeInt(n)
      var off = 0L
      var j = 0
      while (j < n) { out.writeLong(off); off += sorted(j).length; j += 1 }
      out.writeLong(off)
      j = 0
      while (j < n) { out.write(sorted(j)); j += 1 }
    } finally out.close()
    FileContext.getFileContext(fin.toUri, conf)
      .rename(tmp, fin, Options.Rename.OVERWRITE)
  }

  /** One bucket's shard files relevant at `upToEpoch`: the newest base
    * (`c<N>.seen`, N ≤ upToEpoch) if any, plus the deltas (`e<i>.seen`) with
    * baseN < i ≤ upToEpoch — newest first (recent epochs are likelier hits
    * for steady-state candidates; the base goes last).
    */
  private def selectFiles(bucketDir: String, upToEpoch: Int,
      conf: Configuration): (org.apache.hadoop.fs.FileSystem, Seq[Path]) = {
    val p = new Path(bucketDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return (fs, Nil)
    val named = fs.listStatus(p).toSeq.filter(_.isFile).flatMap { s =>
      val name = s.getPath.getName
      if (!name.endsWith(".seen")) None
      else {
        val kind = name.charAt(0)
        scala.util.Try(name.substring(1).stripSuffix(".seen").toInt).toOption
          .collect { case e if (kind == 'e' || kind == 'c') && e <= upToEpoch =>
            (kind, e, s.getPath)
          }
      }
    }
    val base = named.filter(_._1 == 'c').sortBy(-_._2).headOption
    val floor = base.map(_._2).getOrElse(Int.MinValue)
    val deltas = named.filter(f => f._1 == 'e' && f._2 > floor)
      .sortBy(-_._2).map(_._3)
    (fs, deltas ++ base.map(_._3).toSeq)
  }

  /** All committed shards of one bucket with epoch ≤ upToEpoch, opened for
    * probing.
    */
  private def openBucket(bucketDir: String, upToEpoch: Int, nProbes: Int,
      conf: Configuration): Seq[SortedShard] = {
    val (fs, files) = selectFiles(bucketDir, upToEpoch, conf)
    if (files.isEmpty) return Nil
    // the binary-search path issues many small positioned reads; on a local
    // filesystem Hadoop's ChecksumFileSystem turns each into crc-chunk
    // verification (~100s of µs) — read through the raw fs instead (shard
    // publish is atomic-rename, content integrity is the snapshot layer's)
    val readFs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    files.map(path => SortedShard.open(readFs.open(path), nProbes))
  }

  /** Every url of one shard file (compaction input). */
  private def readAllUrls(fs: org.apache.hadoop.fs.FileSystem, path: Path,
      out: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Unit = {
    val in = fs.open(path)
    try {
      val magic = in.readInt()
      require(magic == Magic, f"bad seen-shard magic 0x$magic%08x")
      val n = in.readInt()
      val raw = new Array[Byte]((n + 1) * 8)
      in.readFully(8L, raw, 0, raw.length)
      val bb = java.nio.ByteBuffer.wrap(raw)
      val offsets = new Array[Long](n + 1)
      var i = 0
      while (i <= n) { offsets(i) = bb.getLong(); i += 1 }
      val data = new Array[Byte](offsets(n).toInt)
      in.readFully(8L + 8L * (n + 1), data, 0, data.length)
      i = 0
      while (i < n) {
        out += java.util.Arrays.copyOfRange(data, offsets(i).toInt, offsets(i + 1).toInt)
        i += 1
      }
    } finally in.close()
  }

  /** Fold one bucket's base + deltas (≤ upToEpoch) into `c<upToEpoch>.seen`.
    * No-op when there is at most one file to fold.
    */
  private def compactBucket(bucketDir: String, upToEpoch: Int,
      conf: Configuration): Unit = {
    val (fs, files) = selectFiles(bucketDir, upToEpoch, conf)
    if (files.size <= 1) return
    val urls = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    files.foreach(f => readAllUrls(fs, f, urls))
    writeShard(s"$bucketDir/c$upToEpoch.seen", urls, conf)
  }

  /** One open sorted shard, loaded LAZILY: opening reads only the 8-byte
    * header, so shards that are never consulted (probes resolve in a newer
    * epoch's shard first — the newest-first early-exit) cost nothing. On
    * first search the offsets array is heap-loaded (8 B per url); url bytes
    * are then fetched by positioned read during binary search — O(log n)
    * small reads per probe, flat in shard size — unless the caller probes a
    * dense fraction of the shard, where one sequential bulk read of the data
    * region plus in-memory search is cheaper.
    */
  private final class SortedShard(in: FSDataInputStream, n: Int, nProbes: Int) {

    private var offsets: Array[Long] = null
    private var dataStart: Long = 0L
    private var bulk: Array[Byte] = null
    // positioned-read cache: the top of the binary-search tree is shared by
    // every probe of the shard, so most reads repeat a small index set
    private val entryCache = new java.util.HashMap[Int, Array[Byte]]()

    private def ensureLoaded(): Unit = if (offsets == null) {
      // ONE bulk read for the offsets region — element-wise readLong would
      // cost n small filesystem reads per open
      val raw = new Array[Byte]((n + 1) * 8)
      in.readFully(8L, raw, 0, raw.length)
      val bb = java.nio.ByteBuffer.wrap(raw)
      offsets = new Array[Long](n + 1)
      var i = 0
      while (i <= n) { offsets(i) = bb.getLong(); i += 1 }
      dataStart = 8L + 8L * (n + 1)
      val dataLen = offsets(n)
      // dense probing (> ~1/8 of entries) or a modest shard: one sequential
      // read beats O(probes·log n) positioned reads
      if (dataLen < (1L << 30) && (dataLen <= (4 << 20) || nProbes.toLong * 8 > n)) {
        bulk = new Array[Byte](dataLen.toInt)
        in.readFully(dataStart, bulk, 0, bulk.length)
      }
    }

    private def cmpAt(idx: Int, key: Array[Byte]): Int = {
      val off = offsets(idx)
      val len = (offsets(idx + 1) - off).toInt
      if (bulk != null) {
        val base = off.toInt
        val m = math.min(len, key.length)
        var i = 0
        while (i < m) {
          val c = (bulk(base + i) & 0xff) - (key(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        len - key.length
      } else {
        var buf = entryCache.get(idx)
        if (buf == null) {
          buf = new Array[Byte](len)
          in.readFully(dataStart + off, buf, 0, len)
          if (entryCache.size < 65536) entryCache.put(idx, buf)
        }
        -compareBytes(key, buf, buf.length)
      }
    }

    def contains(key: Array[Byte]): Boolean = {
      if (n == 0) return false
      ensureLoaded()
      var lo = 0
      var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = cmpAt(mid, key)
        if (c == 0) return true
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      false
    }

    def close(): Unit = in.close()
  }

  private object SortedShard {
    def open(in: FSDataInputStream, nProbes: Int): SortedShard = {
      val magic = in.readInt()
      require(magic == Magic, f"bad seen-shard magic 0x$magic%08x")
      val n = in.readInt()
      new SortedShard(in, n, nProbes)
    }
  }
}
