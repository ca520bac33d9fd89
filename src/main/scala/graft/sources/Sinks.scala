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

  /** Collision-free identifier slug for a data-directory path — the key
    * persisted-artifact names (LSH index tables, export dirs) embed.
    * Character-by-character sanitization is INJECTIVE up to case (every
    * non-alphanumeric maps to '_', which cannot un-collide two distinct
    * alphanumeric tails), unlike the hashCode the r12 review caught: two
    * corpus dirs with colliding hashes would silently share one artifact
    * and the write-once memo would serve corpus B's index to corpus A.
    */
  def pathSlug(path: String): String =
    path.toLowerCase.map(c => if (c.isLetterOrDigit) c else '_')

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

  /** Write `df` Z-ORDERED on two numeric columns: each column scales onto a
    * 16-level grid (bounds collected once driver-side — 4 doubles, the KB
    * state contract), the two 4-bit cell ids interleave into an 8-bit
    * Morton code, and files are range-partitioned + sorted by that code.
    * Each file's (c1, c2) min/max box is then a compact TILE instead of a
    * full-width stripe, so parquet min/max stats prune files for probes in
    * EITHER dimension — `layout_zorder` scores this layout arithmetically;
    * this writer materializes it (SinksSpec measures real per-file stats).
    * At 100 TB: the sort is a range shuffle on an 8-bit key — the one-time
    * ingest cost the pruning amortizes over every later query.
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      files: Int = 16): Unit = {
    val b = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head
    // Degenerate-range guard (ADVICE r9): the floor must be a NORMAL-range
    // epsilon — Double.MIN_VALUE is the smallest subnormal, and dividing it
    // by 16 underflows to 0.0, turning a constant column into 0/0 = NaN
    // instead of the guarded division. 1e-12 keeps every constant column
    // deterministically in cell 0.
    def cell(c: String, lo: Double, hi: Double) =
      least(lit(15), greatest(lit(0),
        floor((col(c).cast("double") - lit(lo)) /
          lit(math.max(hi - lo, 1e-12) / 16.0)).cast("int")))
    val g1 = cell(c1, b.getDouble(0), b.getDouble(1))
    val g2 = cell(c2, b.getDouble(2), b.getDouble(3))
    // bit interleave: c1 takes odd bits, c2 even — disjoint bits, so + is |
    val mz = (0 until 4).map(i =>
      shiftleft(shiftright(g1, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(g2, i).bitwiseAND(lit(1)), 2 * i)).reduce(_ + _)
    df.withColumn("z_mz", mz)
      .repartitionByRange(files, col("z_mz"))
      .sortWithinPartitions("z_mz")
      .drop("z_mz")
      .write.mode("overwrite").parquet(path)
  }

  /** Write an IVF cell assignment (`Similarity.ivfCells`) as parquet
    * partitioned by cell id (`cid=<n>/` directories) — the billion-vector
    * ANN layout: a probe's literal `cid` predicate prunes the listing to
    * its nprobe directories, so search I/O is ~nprobe/cells of the corpus
    * instead of a full scan filtered after the fact.
    */
  def writeIvfCells(cells: DataFrame, path: String): Unit =
    cells.write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Write a training-ready corpus (`TextAnalysis.trainingCorpus`: one
    * row per kept document with its deterministic training position `pos`
    * and token-bin assignment) as the layout a sequential trainer reads:
    * `source=<s>/` partition directories, each holding ≤ `shards`
    * pos-CONTIGUOUS files with rows sorted by `pos` inside — so epoch
    * order is a directory listing + sequential scans, never a shuffle at
    * read time. The range partitioning on (source, pos) is the one-time
    * ingest sort (an 8-bit-style range exchange over the already
    * budget-bounded selection); `partitionBy` then splits each range task
    * by source, giving per-directory file counts ≤ shards with
    * non-overlapping pos ranges (SinksSpec reads the real files and
    * checks both). At 100 TB `shards` scales with selection size — the
    * layout contract (contiguous, sorted, per-source pruned) is
    * unchanged.
    */
  def writeTrainingCorpus(df: DataFrame, path: String, shards: Int = 8): Unit =
    df.repartitionByRange(shards, col("source"), col("pos"))
      .sortWithinPartitions("source", "pos")
      .write.mode("overwrite").partitionBy("source").parquet(path)

  /** Persist the incremental-dedup corpus index (`Dedup.lshBandIndex` +
    * the corpus signature table) as bucketed tables: bands hashed+sorted
    * on the probe join's exact keys (band, bk), signatures on doc_id.
    * At 100 TB the index build is the one full-corpus pass; every daily
    * batch screen after it probes these tables with NO corpus-side
    * exchange (the bucketing satisfies both joins' distributions) and no
    * corpus re-scan — the build cost `dedup_index_build` prices is what
    * this layout amortizes away.
    */
  def writeLshIndex(bands: DataFrame, sigs: DataFrame, tablePrefix: String,
      buckets: Int = 8): Unit = {
    // drop + clear any stale warehouse location first: mode("overwrite")
    // only replaces tables the CURRENT catalog knows, but the in-memory
    // catalog forgets managed tables across sessions while their
    // directories survive — a rewrite from a fresh session would otherwise
    // die with LOCATION_ALREADY_EXISTS
    replaceTable(bands.sparkSession, s"${tablePrefix}_bands")
    replaceTable(sigs.sparkSession, s"${tablePrefix}_sigs")
    bands.write.mode("overwrite")
      .bucketBy(buckets, "band", "bk").sortBy("band", "bk")
      .saveAsTable(s"${tablePrefix}_bands")
    sigs.write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(s"${tablePrefix}_sigs")
  }

  /** Drop `table` from the catalog AND delete its (possibly orphaned)
    * managed location — the overwrite semantics a writer needs when the
    * warehouse outlives the in-memory catalog.
    */
  private def replaceTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(wh), table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
