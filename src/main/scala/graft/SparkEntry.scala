package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every module's GraftQuery registry into the flat
  * `queries` / `oracleSql` maps the verify/bench harness consumes.
  */
object SparkEntry {

  /** All registered operator pipelines, by module. */
  def registry: Seq[GraftQuery] =
    ops.Relational.queries ++
      ops.Windows.queries ++
      ops.Scalars.queries ++
      ops.AdvancedJoins.queries ++
      ops.Dedup.queries ++
      ops.Similarity.queries ++
      ops.TextAnalysis.queries ++
      ops.Analytics.queries ++
      ops.Multimodal.queries ++
      ops.PipelineOps.queries ++
      ops.Clustering.queries ++
      ops.GraphOps.queries ++
      ops.ScaleOps.queries ++
      ops.SourcesAndUdfs.queries ++
      streaming.StreamingOps.queries ++
      etl.EtlQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's incremental watermark ETL re-expressed Spark-first
    * (SURVEY.md §0 template, §7 M0). */
  def entry(spark: SparkSession): DataFrame =
    etl.WatermarkEtl.delta(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
