package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the dev loop (not part of the driver contract). */
object DevProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.ColumnOps._

    time("warmup range")(spark.range(1 << 20).selectExpr("sum(id)").collect())
    time("warmup parquet")(spark.read.parquet(s"$d/region.parquet").count())
    val docs = spark.read.parquet(s"$d/documents.parquet")
    time("docs count")(docs.count())
    time("docs md5 groupBy")(
      docs.groupBy(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .count())
    time("q37 full")(SparkEntry.queries("q37_exact_dedup")(spark, d).count())
    time("q37 again")(SparkEntry.queries("q37_exact_dedup")(spark, d).count())
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(shingles(tokens(col("text")), 3))).as("sh"))
    time("shingle explode count")(sh.count())
    val shp = sh.persist()
    time("shingle persist count")(shp.count())
    time("self-join pairs")(
      shp.as("a").join(shp.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count())
    time("q38 full")(SparkEntry.queries("q38_ngram_jaccard")(spark, d).count())
    time("q38 again")(SparkEntry.queries("q38_ngram_jaccard")(spark, d).count())
    // Differential: native kernels must equal the HOF formulations exactly.
    val diff = time("kernel-vs-HOF diff")(
      docs.select(
        tokens(col("text")).as("tk"), tokensHof(col("text")).as("th"),
        shingles(tokens(col("text")), 3).as("sk"),
        shinglesHof(tokensHof(col("text")), 3).as("sh2"))
        .filter(not(col("tk") === col("th")) || not(col("sk") === col("sh2")))
        .count())
    println(s"[probe] differential mismatches = $diff (must be 0)")
    spark.stop()
  }
}
