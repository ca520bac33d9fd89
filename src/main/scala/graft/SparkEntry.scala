package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each operator family contributes (queries, oracle) pairs; the maps are
  * concatenated here. Column names in each Spark result match the aliases
  * in its oracle SQL exactly (the driver compare sorts columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q3TopkRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Selection.queries ++ Analytics.queries ++ Temporal.queries ++ Dedup.queries ++
      Graph.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Sketches.queries ++ Layout.queries ++
      Map("mm_binary_meta" -> (Multimodal.mmBinaryMeta _),
        "mm_dedup" -> (Multimodal.mmDedup _),
        "mm_chunk_dedup" -> (Multimodal.mmChunkDedup _),
        "mm_phash" -> (Multimodal.mmPhash _),
        "mm_phash_near" -> (Multimodal.mmPhashNear _),
        "mm_components" -> (Multimodal.mmComponents _),
        "mm_frames" -> (Multimodal.mmFrames _),
        "mm_cdc_chunks" -> (Multimodal.mmCdcChunks _),
        "mm_shard_manifest" -> (Multimodal.mmShardManifest _)) ++ EventStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    Selection.oracle ++ Analytics.oracle ++ Temporal.oracle ++ Dedup.oracle ++
      Graph.oracle ++
      Similarity.oracle ++ TextAnalysis.oracle ++ Sketches.oracle ++ Layout.oracle ++
      Map("mm_binary_meta" -> Multimodal.mmBinaryMetaSql,
        "mm_dedup" -> Multimodal.mmDedupSql,
        "mm_chunk_dedup" -> Multimodal.mmChunkDedupSql,
        "mm_phash" -> Multimodal.mmPhashSql,
        "mm_phash_near" -> Multimodal.mmPhashNearSql,
        "mm_components" -> Multimodal.mmComponentsSql,
        // the mapPartitions codec op runs a FAKE codec whose output is
        // SQL-expressible, so even the non-SQL operator gets a full oracle
        "mm_frames" -> Multimodal.mmFramesSql,
        "mm_cdc_chunks" -> Multimodal.mmCdcChunksSql,
        "mm_shard_manifest" -> Multimodal.mmShardManifestSql) ++ EventStream.oracle
}
