package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off drive of the widened image-codec dispatch (r4): synthesize a
  * corpus, show per-codec feature stats, confirm jpeg/gif/tiff take the
  * real decode path (flat-gray probes pool to ~0.502).
  */
object MediaDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.multimodal.{JdkCodec, MediaOps}

    val docs = (1L to 60L).map(i => (i, "t")).toDF("doc_id", "text")
    val corpus = MediaOps.synthesize(docs, "doc_id", "text")
    val feats = MediaOps.extractFeatures(corpus, targetW = 32, targetH = 32, dim = 8)
    val joined = corpus.toDF().select(col("doc_id"), col("meta.codec").as("codec"))
      .join(feats.toDF().select(col("doc_id"), col("mediaType"),
        element_at(col("features"), 1).as("f0")), "doc_id")
    joined.groupBy("codec").agg(count(lit(1)).as("n"),
      min("f0").as("min_f0"), max("f0").as("max_f0")).orderBy("codec")
      .show(truncate = false)

    // flat-gray probe per codec: real decode pools every feature to 128/255
    val rows = Seq("jpeg", "gif", "tiff", "bmp", "png").zipWithIndex.map { case (c, i) =>
      MediaOps.MediaRow(i.toLong, JdkCodec.encodeImage(c, 48, 32, (_, _) => 0x808080),
        MediaOps.MediaMeta("image", 48, 32, 0L, c))
    }
    MediaOps.extractFeatures(spark.createDataset(rows), 8, 8, 4)
      .toDF().select(col("doc_id"), col("features")).show(truncate = false)
    spark.stop()
  }
}
