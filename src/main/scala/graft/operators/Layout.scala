package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Storage-layout effectiveness: the table-layout decision every 100 TB
  * deployment makes before any query runs. `layout_zorder` scores two file
  * layouts of the `events` table — time-linear (files = hour ranges, the
  * default append order) vs Z-order (files = Morton-curve tiles over
  * (user bucket, hour bucket), the Delta/Iceberg OPTIMIZE ZORDER shape) —
  * by replaying parquet-style min/max file pruning for three probe
  * rectangles and reporting files hit + rows scanned vs rows actually
  * matched.
  *
  * Scale design: ONE corpus pass builds the Grid×Grid cell histogram (a
  * map-side-combinable groupBy onto ≤256 keys — shuffle is constant-size
  * per partition regardless of corpus size); file assignment, per-file
  * min/max stats, pruning, and the probe×layout scorecard are all
  * arithmetic over those ≤256 rows. The layouts are never materialized —
  * the histogram is sufficient because a cell maps to exactly one file in
  * each layout. All math is integer (counts, bit interleaves, interval
  * intersections): both engines agree bit-for-bit.
  */
object Layout {

  private val GridBits = 4
  private val Grid = 1 << GridBits // 16 buckets per dimension
  // Dropping the low FileShift bits of the 2·GridBits-bit Morton code
  // yields 16 files, each a 4×4 tile — the same file COUNT as the
  // time-linear layout (16 hour-bucket files), so the comparison is fair.
  private val FileShift = 4

  private case class Probe(name: String, xlo: Int, xhi: Int, ylo: Int, yhi: Int)
  // x_band: selective on user only — the probe an append-by-time layout
  // cannot prune at all. y_band: selective on time only — linear's best
  // case. rect: selective on both — the mixed workload Z-order exists for.
  private val Probes = Seq(
    Probe("rect", 3, 9, 6, 12),
    Probe("x_band", 4, 7, 0, Grid - 1),
    Probe("y_band", 0, Grid - 1, 6, 12))

  /** Morton interleave of two GridBits-bit values: even bits ← x, odd ← y. */
  private[graft] def mortonCol(x: Column, y: Column): Column =
    (0 until GridBits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until GridBits).map { k =>
      s"((($x >> $k) & 1) << ${2 * k}) + ((($y >> $k) & 1) << ${2 * k + 1})"
    }.mkString(" + ")

  def layoutZorder(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // cast(ts as long) = floor epoch seconds (micros truncation), the
    // exact mirror of the oracle's floor(epoch(ts)) — see Selection's
    // epoch idiom. Both dims wrap into the 16-bucket grid.
    val cells = Tables.events(spark, d)
      .select(
        pmod(col("user_id"), lit(Grid.toLong)).as("ux"),
        pmod(expr("cast(ts as long) div 3600"), lit(Grid.toLong)).as("uy"))
      .groupBy("ux", "uy").agg(count(lit(1)).as("n"))

    // One histogram row fans out to its file id under each layout; the
    // explode is over ≤256 rows, not the corpus.
    val tagged = cells.select(col("ux"), col("uy"), col("n"),
      explode(array(
        struct(lit("zorder").as("layout"),
          shiftright(mortonCol(col("ux"), col("uy")), FileShift).as("f")),
        struct(lit("linear_time").as("layout"), col("uy").as("f")))).as("lf"))
      .select(col("ux"), col("uy"), col("n"),
        col("lf.layout").as("layout"), col("lf.f").as("f"))

    val probeDf = Probes.map(p => (p.name, p.xlo, p.xhi, p.ylo, p.yhi))
      .toDF("probe", "xlo", "xhi", "ylo", "yhi")

    // Per-(layout, probe, file): min/max box, row count, and matched rows
    // folded into ONE aggregation over cells×layouts×probes (≤1536 rows) —
    // so the whole scorecard derives from the single corpus pass above.
    val inRect = col("ux").between(col("xlo"), col("xhi")) &&
      col("uy").between(col("ylo"), col("yhi"))
    val perFile = tagged.crossJoin(probeDf)
      .groupBy("layout", "probe", "f", "xlo", "xhi", "ylo", "yhi").agg(
        min("ux").as("minx"), max("ux").as("maxx"),
        min("uy").as("miny"), max("uy").as("maxy"),
        sum("n").as("n_rows"),
        sum(when(inRect, col("n")).otherwise(0L)).as("n_match"))

    // Parquet-style pruning: a file survives iff its min/max box
    // intersects the probe rectangle.
    val hit = col("maxx") >= col("xlo") && col("minx") <= col("xhi") &&
      col("maxy") >= col("ylo") && col("miny") <= col("yhi")
    perFile.groupBy("layout", "probe").agg(
      count(lit(1)).as("n_files"),
      sum(when(hit, 1L).otherwise(0L)).as("files_hit"),
      sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"),
      sum("n_match").as("rows_matched"))
      .orderBy("layout", "probe")
  }

  val layoutZorderSql: String = {
    val probeValues = Probes.map(p =>
      s"('${p.name}', ${p.xlo}, ${p.xhi}, ${p.ylo}, ${p.yhi})").mkString(", ")
    s"""WITH cells AS (
       |  SELECT CAST(user_id % $Grid AS BIGINT) AS ux,
       |         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % $Grid AS BIGINT) AS uy,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |tagged AS (
       |  SELECT ux, uy, n, 'zorder' AS layout,
       |         CAST((${mortonSql("ux", "uy")}) >> $FileShift AS BIGINT) AS f FROM cells
       |  UNION ALL
       |  SELECT ux, uy, n, 'linear_time' AS layout, uy AS f FROM cells),
       |probes(probe, xlo, xhi, ylo, yhi) AS (VALUES $probeValues),
       |pf AS (SELECT layout, probe, f, xlo, xhi, ylo, yhi,
       |              min(ux) AS minx, max(ux) AS maxx,
       |              min(uy) AS miny, max(uy) AS maxy, sum(n) AS n_rows,
       |              sum(CASE WHEN ux BETWEEN xlo AND xhi AND uy BETWEEN ylo AND yhi
       |                  THEN n ELSE 0 END) AS n_match
       |       FROM tagged CROSS JOIN probes GROUP BY 1, 2, 3, 4, 5, 6, 7)
       |SELECT layout, probe,
       |  CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(CASE WHEN maxx >= xlo AND minx <= xhi AND maxy >= ylo AND miny <= yhi
       |           THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(sum(CASE WHEN maxx >= xlo AND minx <= xhi AND maxy >= ylo AND miny <= yhi
       |           THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       |  CAST(sum(n_match) AS BIGINT) AS rows_matched
       |FROM pf GROUP BY 1, 2
       |ORDER BY layout, probe""".stripMargin
  }

  // --- layout_compact -----------------------------------------------------
  // Small-file compaction planner — the OPTIMIZE/bin-packing step every
  // streaming-ingest table needs: an hourly append ingest leaves one tiny
  // file per hour (720 files of ~14 rows at sf0.01); the planner assigns
  // consecutive files to output bins of ~CompactTarget rows, preserving
  // the time clustering (bin = floor(rows-before / target), the standard
  // start-offset rule — so every output file except possibly the last is
  // ≥ target·(1−1/target) full and min/max hour spans stay contiguous).
  //
  // Scale shape: the corpus contributes ONE map-side-combinable groupBy
  // onto |hours| keys; everything after operates on the FILE-STATS table
  // (metadata-sized — 100 TB at hourly grain is ~10⁴–10⁵ rows, the same
  // class real table formats hold in their manifest), so the unpartitioned
  // cumulative window there is over metadata, never the corpus — the
  // q_calendar_fill precedent, documented here because ci.sh's
  // single-partition-window audit asks.
  private val CompactTarget = 512L // rows per compacted output file

  def layoutCompact(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.events(spark, d)
      .groupBy(expr("cast(ts as long) div 3600").as("hour_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("hour_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NB: `div`, not `/` — Column./ is IEEE double division, which would
    // misround bin boundaries once cumulative sums pass 2^53.
    files
      .withColumn("before", sum("n").over(w) - col("n"))
      .withColumn("bin", expr(s"before div $CompactTarget"))
      .groupBy("bin").agg(
        count(lit(1)).as("n_files"),
        sum("n").as("n_rows"),
        min("hour_id").as("hour_lo"),
        max("hour_id").as("hour_hi"))
      .orderBy("bin")
  }

  val layoutCompactSql: String =
    s"""WITH f AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_id,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |b AS (SELECT hour_id, n,
       |  CAST((sum(n) OVER (ORDER BY hour_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
       |       // $CompactTarget AS BIGINT) AS bin
       |  FROM f)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(min(hour_id) AS BIGINT) AS hour_lo,
       |  CAST(max(hour_id) AS BIGINT) AS hour_hi
       |FROM b GROUP BY 1 ORDER BY bin""".stripMargin

  // --- layout_cluster_depth -----------------------------------------------
  // Clustering-quality metric — the "should we re-sort this table?" signal
  // table formats derive from file-level min/max stats: how badly do the
  // per-file [min(value), max(value)] ranges of a time-appended layout
  // overlap on a non-time column? Perfectly value-clustered files are
  // pairwise disjoint (every range-probe prunes to ~1 file); a time-append
  // layout of an uncorrelated column overlaps almost totally (probes scan
  // everything — exactly what layout_zorder measures from the probe side).
  // Reports C(n,2) pair totals, overlapping pairs, and max sweep depth
  // (the worst-case file count a point probe must read).
  //
  // Scale shape: the corpus contributes ONE map-side-combinable groupBy
  // onto |hours| keys (min/max per file); the endpoint sweep — a sorted
  // cumulative count over 2·|files| rows — runs on the METADATA table
  // (manifest-sized at any corpus scale, the layout_compact precedent),
  // so its unpartitioned window never sees the corpus. Counting uses the
  // classic sweep identity: a pair is disjoint iff one file's hi sorts
  // strictly before the other's lo (closed-interval semantics, so the
  // degenerate single-row-file case where lo = hi cannot double-count),
  // hence disjoint pairs = Σ over lo-endpoints of (hi-endpoints strictly
  // before it) — one running sum, no pairwise join even on metadata.
  def layoutClusterDepth(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.events(spark, d)
      .groupBy(expr("cast(ts as long) div 3600").as("hour_id"))
      .agg(min("value").as("lo"), max("value").as("hi"))
    // kind 0 = interval open (lo), 1 = close (hi); lo sorts FIRST on value
    // ties so a hi touching a lo at equal value counts as overlapping
    // (closed intervals), never as closed-before.
    val endpoints = files.select(col("hour_id"), col("lo").as("v"), lit(0).as("kind"))
      .unionAll(files.select(col("hour_id"), col("hi").as("v"), lit(1).as("kind")))
    val w = Window.orderBy("v", "kind", "hour_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = endpoints
      .withColumn("c_lo", sum(when(col("kind") === 0, 1L).otherwise(0L)).over(w))
      .withColumn("c_hi_excl",
        sum(when(col("kind") === 1, 1L).otherwise(0L)).over(w) -
          when(col("kind") === 1, 1L).otherwise(0L))
    swept.filter(col("kind") === 0)
      .select((col("c_lo") - col("c_hi_excl")).as("depth"), col("c_hi_excl").as("closed_before"))
      .agg(count(lit(1)).as("n_files"), max("depth").as("max_depth"),
        sum("closed_before").as("disjoint"))
      .select(col("n_files"),
        expr("n_files * (n_files - 1) div 2").as("total_pairs"),
        expr("n_files * (n_files - 1) div 2 - disjoint").as("overlap_pairs"),
        col("max_depth"),
        (expr("n_files * (n_files - 1) div 2 - disjoint").cast("double") /
          expr("n_files * (n_files - 1) div 2").cast("double")).as("overlap_frac"))
  }

  val layoutClusterDepthSql: String =
    """WITH f AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour_id,
      |         min(value) AS lo, max(value) AS hi
      |  FROM events GROUP BY 1),
      |e AS (SELECT hour_id, lo AS v, 0 AS kind FROM f
      |      UNION ALL SELECT hour_id, hi, 1 FROM f),
      |s AS (SELECT kind,
      |  sum(CASE WHEN kind = 0 THEN 1 ELSE 0 END) OVER
      |    (ORDER BY v, kind, hour_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_lo,
      |  sum(CASE WHEN kind = 1 THEN 1 ELSE 0 END) OVER
      |    (ORDER BY v, kind, hour_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - CASE WHEN kind = 1 THEN 1 ELSE 0 END AS c_hi_excl
      |  FROM e),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
      |        CAST(max(c_lo - c_hi_excl) AS BIGINT) AS max_depth,
      |        CAST(sum(c_hi_excl) AS BIGINT) AS disjoint
      |      FROM s WHERE kind = 0)
      |SELECT n_files,
      |  CAST(n_files * (n_files - 1) // 2 AS BIGINT) AS total_pairs,
      |  CAST(n_files * (n_files - 1) // 2 - disjoint AS BIGINT) AS overlap_pairs,
      |  max_depth,
      |  CAST(n_files * (n_files - 1) // 2 - disjoint AS DOUBLE)
      |    / CAST(n_files * (n_files - 1) // 2 AS DOUBLE) AS overlap_frac
      |FROM a""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> layoutZorder,
    "layout_compact" -> layoutCompact,
    "layout_cluster_depth" -> layoutClusterDepth)

  val oracle: Map[String, String] = Map(
    "layout_zorder" -> layoutZorderSql,
    "layout_compact" -> layoutCompactSql,
    "layout_cluster_depth" -> layoutClusterDepthSql)
}
