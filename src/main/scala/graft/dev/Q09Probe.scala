package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe: which leg of q09 dominates at sf1 (exact distincts, approx
  * sketches, or the mixed-distinct Expand plan). Not part of the surface. */
object Q09Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.lineitem(spark, d)
    time("warmup count")(li.count())
    time("exact only")(li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_orderkey")))
      .write.format("noop").mode("overwrite").save())
    time("approx only")(li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02),
        approx_count_distinct(col("l_orderkey"), 0.02))
      .write.format("noop").mode("overwrite").save())
    time("mixed (q09 shape)")(li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("ep"),
        countDistinct(col("l_orderkey")).as("eo"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
