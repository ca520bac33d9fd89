package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plan-stat measurements behind the r19 scale dispatches (the
  * memoSide leaf-byte gate, the eventsSlim memo ride, the ann_recall
  * baseline persist): LEAF relation stat bytes are the one estimate the
  * static planner gets right (parquet file bytes × column-prune ratio);
  * join/agg OUTPUT stats are multiplicative garbage without CBO column
  * stats, so gates must never read them.
  */
private[graft] object PlanStats {
  /** Sum of the plan's leaf relation stat bytes, saturating at Long.Max. */
  def leafStatBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong)
      .foldLeft(0L)((a, b) => if (a + b < 0) Long.MaxValue else a + b)

  /** The small-side floor below which persist/memo choreography costs more
    * than the work it removes (measured at sf0.1 across the memoSide
    * family and ann_recall; see OPTIMIZATION_r19.md). Deployment knob,
    * bytes. */
  def minLeafBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.memoSide.minLeafBytes")
      .map(_.toLong).getOrElse(16L * 1024 * 1024)
}
