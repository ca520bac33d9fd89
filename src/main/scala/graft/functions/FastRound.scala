package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{signum, lit}

/** Exact integer-lattice quantization without `round()`'s per-row cost.
  *
  * Spark's `Round` on DOUBLE allocates a `java.math.BigDecimal` per row
  * even inside whole-stage codegen — FloorProbe measured the four-column
  * money scan of 60M lineitem rows at 2.8 s with `round(x*100)` vs
  * 0.26 s with the cast form, i.e. the conversion cost ~10× the scan it
  * sits in and dominates every money-touching operator at sf10.
  *
  * `CAST(double AS BIGINT)` truncates toward zero, so
  * `(x·s + signum(x)·0.5)` truncated reproduces round-half-AWAY-FROM-ZERO
  * for both signs — the same rule as `java.math.RoundingMode.HALF_UP` in
  * Spark's `Round` and C `round()` in the DuckDB oracle. NULLs propagate
  * through the arithmetic unchanged.
  *
  * Exactness contract: the two forms agree unless the true product x·s
  * lies within one double ulp of a `k ± 0.5` boundary AND the float add
  * crosses it. Money and quantity columns are 2-decimal lattices, so
  * x·100 lands within ~1e-11 of an INTEGER — maximally far from .5
  * boundaries; embedding quantizers use power-of-two-ish scales with the
  * same margin. The 259-query DuckDB oracle compare (hash equality at
  * sf0.01/sf0.1) pins the agreement for every operator on every corpus
  * the driver checks.
  */
object FastRound {
  /** round(c·scale) to BIGINT, half away from zero. */
  def roundL(c: Column, scale: Double): Column =
    (c * lit(scale) + signum(c) * lit(0.5)).cast("long")

  /** round(c·100) to BIGINT — the integer-cents lattice. */
  def cents(c: Column): Column = roundL(c, 100.0)

  /** round(c) to BIGINT. */
  def roundL(c: Column): Column = roundL(c, 1.0)

  /** SQL-lambda fragment of [[roundL]] for higher-order-function bodies
    * (`transform(embedding, x -> ...)`), where a Column can't reach. */
  def roundLSql(x: String, scale: String): String =
    s"CAST($x * $scale + sign($x) * 0.5D AS BIGINT)"
}
