package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side layouts — the two that matter at 100 TB:
  *
  * - Date-partitioned parquet: the standard lake layout. Partition pruning
  *   turns every time-range query into a directory listing (the scan never
  *   opens out-of-range files), which is what makes the `ds_*` time-window
  *   operators cheap on years of history.
  *
  * - Bucketed+sorted tables: both sides of a recurring fact-fact join are
  *   hashed into the same bucket layout once at ingest, and every later
  *   join on that key is exchange-free (BucketJoinSpec proves the plan has
  *   zero Exchange). Amortizes the 100 TB shuffle across all future joins.
  */
object Sinks {

  /** Write `df` as parquet partitioned by the day of `tsCol`
    * (`p_date=yyyy-MM-dd/` directories). Callers filter on `p_date` to get
    * partition pruning; the original timestamp column is preserved.
    */
  def writePartitionedDaily(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("p_date").parquet(path)

  /** Save `df` as a bucketed+sorted table: `buckets` buckets hashed and
    * sorted by `key`. Joins between tables bucketed the same way on the
    * same key shuffle neither side.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Write an IVF cell assignment (`Similarity.ivfCells`) as parquet
    * partitioned by cell id (`cid=<n>/` directories) — the billion-vector
    * ANN layout: a probe's literal `cid` predicate prunes the listing to
    * its nprobe directories, so search I/O is ~nprobe/cells of the corpus
    * instead of a full scan filtered after the fact.
    */
  def writeIvfCells(cells: DataFrame, path: String): Unit =
    cells.write.mode("overwrite").partitionBy("cid").parquet(path)
}
