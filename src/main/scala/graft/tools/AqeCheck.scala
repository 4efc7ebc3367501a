package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AqeCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(0, 1400000, 1, 32)
      .select(concat(lit("https://h"), (col("id") % 999), lit(".example.com/p/"), col("id")).as("url"))
      .distinct()
      .persist()
    df.count()
    println("AQECHECK distinct-cached partitions = " + df.rdd.getNumPartitions)
    spark.stop()
  }
}
