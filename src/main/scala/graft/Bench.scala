package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Per-query time = MINIMUM over this many cold-cache passes. The shared
    // box this runs on has multi-second CPU-steal spikes (round 3's single
    // pass recorded 159s for a workload that measures 43s clean); min-of-k
    // is the standard noise estimator (and what the round-3 review asked
    // for). Caches are wiped BETWEEN passes, so each pass pays the full
    // pipeline costs exactly like a single-pass run would.
    // 3 passes by default (r6 review): with the shared box's contention
    // spikes, 2 passes can't distinguish "one pass was dirty" from "the
    // workload regressed" — 3 gives a median and a spread.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // Same builder as Verify/ExplainDump — benched plans = audited plans.
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet footer caches, JIT) on the flagship so
    // the first timed query isn't charged for session startup.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // A failing query must not bench as "fast": a query is excluded from
    // timings (and reported under "errors") only if it failed in EVERY
    // pass; one flaky failure with a later success keeps its timing.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val succeeded = scala.collection.mutable.Set[String]()
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    val passTotals = scala.collection.mutable.ArrayBuffer[Double]()
    val passClean = scala.collection.mutable.ArrayBuffer[Boolean]()
    // full-precision per-pass per-query times, persisted to a side file so
    // cross-round drift is diagnosable per pass (the stdout JSON line only
    // has room for the per-query minima at 10ms resolution)
    val passDetail = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.LinkedHashMap[String, Double]]()
    for (_ <- 1 to passes) {
      // cold caches per pass; WITHIN a pass operators manage their own
      // hygiene: corpus-sized intermediates are unpersisted before a query
      // returns, and the only retained tables are Dedup's memoized
      // pipeline-stage outputs (duplicate-density-bounded, shared by the
      // three LSH queries — wiping them mid-pass would charge the md5
      // signature pipeline to every stage of what is one pipeline in any
      // real deployment).
      graft.operators.Dedup.releaseCaches()
      spark.catalog.clearCache()
      var passTotal = 0.0
      var clean = true
      val detail = scala.collection.mutable.LinkedHashMap[String, Double]()
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          succeeded += name
          passTotal += dt
          detail(name) = dt
          if (!best.get(name).exists(_ <= dt)) best(name) = dt
        } catch {
          case e: Throwable =>
            clean = false
            // strip EVERY char that can break the single-line JSON (quotes,
            // backslashes, all control chars) — a parse failure here zeroes
            // the whole round's bench
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
        }
      }
      passTotals += passTotal
      passClean += clean
      passDetail += detail
    }
    val results = best.filter { case (k, _) => succeeded(k) }
    val permanent = errors.filterNot { case (k, _) => succeeded(k) }
    // The driver keeps only the last ~2000 chars of stdout and parses the
    // JSON line out of THAT window — round 5's line hit ~2000 chars (71
    // queries at full Double.toString precision) and the round's bench
    // parsed as null. Per-query times at 10ms resolution keep the line
    // ~1600 chars with headroom for more operators; the headline value
    // keeps millisecond precision.
    def r(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r(v, 2) }
      .mkString("{", ",", "}")
    val es = permanent.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // Headline "value" = the best SINGLE-PASS total over error-free passes —
    // a total one run actually achieved (the per-query-minimum sum mixes
    // passes and understates any real run). Falls back to the min-sum only
    // if no pass was clean. Caveat stays: passes after the first run with a
    // warm OS page cache (Spark/operator caches ARE wiped per pass), so
    // "cold" here means cold JVM-side state, not cold files.
    val sumOfMins = if (results.nonEmpty) results.values.sum else 0.0
    val cleanTotals = passTotals.zip(passClean).collect { case (t, true) => t }
    val total = if (cleanTotals.nonEmpty) cleanTotals.min else sumOfMins
    // median over clean passes — min answers "how fast can it go", median
    // answers "was this run trustworthy" (r6's 100.8s-vs-62.7s spread was
    // invisible to a min-only headline)
    val medBase = (if (cleanTotals.nonEmpty) cleanTotals else passTotals).sorted
    val median =
      if (medBase.isEmpty) 0.0
      else if (medBase.length % 2 == 1) medBase(medBase.length / 2)
      else (medBase(medBase.length / 2 - 1) + medBase(medBase.length / 2)) / 2.0
    // Locale.ROOT everywhere: f"" uses the JVM default locale, and a
    // comma-decimal locale (de_DE etc.) would corrupt the JSON with [1,234].
    val pts = passTotals.map(r(_, 3)).mkString("[", ",", "]")
    // per-pass per-query detail at full precision → side file (never the
    // stdout line: 3 passes × 76 queries would blow the driver's tail
    // window that ate round 5's bench)
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_passes.json")
    val detailJson = passDetail.zipWithIndex.map { case (m, i) =>
      val qd = m.map { case (k, v) => "\"" + k + "\":" + r(v, 4) }.mkString("{", ",", "}")
      s"""{"pass":${i + 1},"clean":${passClean(i)},"total":${r(passTotals(i), 3)},"queries":$qd}"""
    }.mkString("[\n", ",\n", "\n]")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), detailJson)
    catch { case _: Throwable => () } // diagnostics only — never fail the bench
    val line = s"""{"metric":"total","value":${r(total, 3)},"unit":"sec","queries":$qs,"errors":$es,"passes":$passes,"pass_totals":$pts,"pass_median":${r(median, 3)},"sum_of_query_mins":${r(sumOfMins, 3)},"sf":"$sfDir"}"""
    // Hard guard against regrowing past the driver's tail window: if the
    // line is ever too long again, drop per-query precision rather than
    // lose the whole round's bench to an unparseable line. sum_of_query_mins
    // stays in the fallback — it is the cross-round statistic (r6 review).
    val out =
      if (line.length <= 1800) line
      else {
        val qs1 = results.map { case (k, v) => "\"" + k + "\":" + r(v, 1) }
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${r(total, 3)},"unit":"sec","queries":$qs1,"errors":$es,"passes":$passes,"pass_totals":$pts,"pass_median":${r(median, 3)},"sum_of_query_mins":${r(sumOfMins, 3)},"sf":"$sfDir"}"""
      }
    println(out)
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }
}
