package graft
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every hardware thread: the bench contract is local[32]
    // on the 32-core driver box (SPARK_GRAFT_CPUS still overrides). The
    // old default of 4 silently ran the recorded benches 8x
    // under-parallelized whenever the env was unset.
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    // Per-query time = MINIMUM over this many cold-cache passes. The shared
    // box this runs on has multi-second CPU-steal spikes (round 3's single
    // pass recorded 159s for a workload that measures 43s clean); min-of-k
    // is the standard noise estimator (and what the round-3 review asked
    // for). Caches are wiped BETWEEN passes, so each pass pays the full
    // pipeline costs exactly like a single-pass run would.
    // 5 passes by default (r10 verdict #9: r10's three passes read
    // 281/318/161s — two dirty — so the recorded minima leaned on one
    // clean pass; with 5, the min estimator has headroom even when the
    // box is bad). SPARK_GRAFT_BENCH_PASSES still overrides for the dev
    // loop.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt
    // contention marker (r10 verdict #9): 1-minute /proc/loadavg sampled
    // at each pass boundary, recorded per pass in the side file, so a
    // dirty pass is diagnosable as box noise rather than a regression
    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    val passLoad = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    // Direct contention evidence (r11 verdict #8: loadavg alone can't
    // separate "this JVM kept the box busy" from "someone else did"):
    // sample system-wide busy/total jiffies (/proc/stat) and THIS
    // process's jiffies (/proc/self/stat utime+stime) at pass boundaries;
    // ext_cpu_pct = share of the pass's total CPU capacity consumed by
    // OTHER processes. A dirty pass now carries its own attribution — a
    // high-ext pass is box noise, a low-ext slow pass is ours.
    def cpuSample(): (Long, Long, Long) =
      try {
        val stat = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
          .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
        val total = stat.sum
        val idle = stat(3) + (if (stat.length > 4) stat(4) else 0L)
        val self = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/stat"))
          .split("\\s+")
        (total, total - idle, self(13).toLong + self(14).toLong)
      } catch { case scala.util.control.NonFatal(_) => (-1L, -1L, -1L) }
    val passExtCpu = scala.collection.mutable.ArrayBuffer[Double]()
    // Direct kernel-side contention evidence (closes r11's pinned-cores /
    // cgroup ask — there is no cgroup CPU quota on this box, so the two
    // signals that actually attribute a dirty pass are):
    //  - steal_pct: hypervisor CPU steal (/proc/stat cpu field 8) as a
    //    share of the pass's total jiffies — time the VCPUs were runnable
    //    but the HOST ran someone else; no amount of in-guest core
    //    pinning can remove it, which is why min-of-k (not pinning) is
    //    the right estimator here;
    //  - cpu_stall_ms: /proc/pressure/cpu "some total=" delta — microsecs
    //    (reported as ms) at least one runnable task in THIS guest waited
    //    for a CPU, the PSI view of oversubscription.
    def stealSample(): Long =
      try {
        val f = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
          .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
        if (f.length > 7) f(7) else -1L
      } catch { case scala.util.control.NonFatal(_) => -1L }
    def psiSample(): Long =
      try {
        val some = java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/pressure/cpu")).linesIterator
          .find(_.startsWith("some")).getOrElse("")
        some.split("total=").last.trim.toLong // microseconds
      } catch { case scala.util.control.NonFatal(_) => -1L }
    val passSteal = scala.collection.mutable.ArrayBuffer[Double]()
    val passStall = scala.collection.mutable.ArrayBuffer[Long]()
    // Same builder as Verify/ExplainDump — benched plans = audited plans.
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Partition-less Windows are statically gated to audited report-sized
    // inputs by ExplainDump's GlobalWindowAllowed set, so WindowExec's
    // per-instantiation WARN here is always about a ≤256-row window; the
    // flood it produces buried real warnings in r9's bench tail. Any NEW
    // global window fails ExplainDump loudly, so silencing this one logger
    // cannot hide a corpus-sized window.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // Warm the JVM (codegen, parquet footer caches, JIT) on the flagship so
    // the first timed query isn't charged for session startup.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // A failing query must not bench as "fast": a query is excluded from
    // timings (and reported under "errors") only if it failed in EVERY
    // pass; one flaky failure with a later success keeps its timing.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val succeeded = scala.collection.mutable.Set[String]()
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    // execution-only minima (toRdd.count, planning excluded): at 166+
    // queries the fixed ~0.3s/query analyze+optimize floor is ~a third of
    // the wall headline, and a real operator regression can hide inside it.
    // Wall stays the headline (cross-round comparable); this is the
    // regression-sensitive view (r8 verdict #8).
    val bestExec = scala.collection.mutable.LinkedHashMap[String, Double]()
    val passTotals = scala.collection.mutable.ArrayBuffer[Double]()
    val passClean = scala.collection.mutable.ArrayBuffer[Boolean]()
    // per-pass cost of pre-materializing the dedup family's shared stage
    // outputs (LSH pair tables + component labels) — a pipeline cost shared
    // by the whole family, warmed OUTSIDE the timed region so it no longer
    // lands on whichever family query runs first (r8 verdict #4)
    val familyBuilds = scala.collection.mutable.ArrayBuffer[Double]()
    // full-precision per-pass per-query times, persisted to a side file so
    // cross-round drift is diagnosable per pass (the stdout headline line
    // carries NO per-query data — see the tail-window note below)
    val passDetail = scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.LinkedHashMap[String, Double]]()
    for (passIdx <- 1 to passes) {
      // cold caches per pass; WITHIN a pass operators manage their own
      // hygiene: corpus-sized intermediates are unpersisted before a query
      // returns, and the only retained tables are Dedup's memoized
      // pipeline-stage outputs (duplicate-density-bounded, shared by the
      // three LSH queries — wiping them mid-pass would charge the md5
      // signature pipeline to every stage of what is one pipeline in any
      // real deployment).
      graft.operators.Dedup.releaseCaches()
      graft.operators.Selection.releaseCaches()
      graft.operators.Analytics.releaseCaches()
      spark.catalog.clearCache()
      // r15: the census-decomposed operators localCheckpoint their
      // bucketed streams, and checkpoint blocks pin until session end —
      // across 5 passes that accumulated past the storage pool
      // (measured: untouched queries' MINS rose ~0.3-3s from eviction/GC
      // drag; q_promo_share 0.76→3.67 with an unchanged 0.66s standalone
      // plan). Dropping every persistent RDD at the pass boundary bounds
      // the pinned set to one pass; Dedup's memo re-warms right below.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val loadStart = loadavg()
      val cpuStart = cpuSample()
      val stealStart = stealSample()
      val psiStart = psiSample()
      val tb = System.nanoTime()
      // NonFatal only (ADVICE r9): an OutOfMemoryError/Interrupted must not
      // be swallowed. A failed warm records -1.0 (a value no real duration
      // can take) instead of the aborted duration, so a silent warm failure
      // can't skew the per-pass family-build attribution — the family
      // queries rebuild lazily and report their own errors.
      val warmOk =
        try {
          graft.operators.Dedup.warmFamilyCaches(spark, sfDir)
          // r16: the ds_cusum/ds_spc_rules shared center/spread lattice —
          // same attribution contract as the dedup memo (a pipeline cost
          // shared by the pair, warmed outside any one query's timer)
          graft.operators.Selection.warmQcCaches(spark, sfDir)
          graft.operators.Analytics.warmFamilyCaches(spark, sfDir)
          true
        }
        catch { case scala.util.control.NonFatal(_) => false }
      familyBuilds += (if (warmOk) (System.nanoTime() - tb) / 1e9 else -1.0)
      // r15: blocks pinned AFTER the warm are per-query checkpoint streams
      // (the census decompositions), not shared state — warmFamilyCaches
      // has already built every memo meant to survive the pass. Snapshot
      // the surviving ids so each query's new blocks release right after
      // it runs; without this the within-pass accumulation (~20 sf-sized
      // streams) degraded later queries' minima through eviction/GC.
      val warmIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
      var passTotal = 0.0
      var clean = true
      val detail = scala.collection.mutable.LinkedHashMap[String, Double]()
      // Per-pass DETERMINISTIC shuffle of query order (r15 verdict #2): a
      // heavy neighbor bills its major-GC debt to whoever runs next, and
      // with a FIXED order the same victim pays in every pass, so even
      // min-of-k keeps the artifact (r15: text_langid_confusion 4.1s
      // in-bench vs ~1s standalone; q_promo_share 2.7-5.0s after
      // stream_interval_join). A different permutation per pass gives
      // each query k different neighborhoods — the min approximates the
      // isolated cost without paying the rejected per-query System.gc().
      // Seeded by pass index: run-to-run reproducible.
      val passOrder = new scala.util.Random(passIdx).shuffle(SparkEntry.queries.toSeq)
      passOrder.foreach { case (name, fn) =>
        // NO per-query System.gc() (r15, tried and measured): a heavy
        // neighbor can bill its major-GC debt to whoever runs next in
        // hash order (q_promo_share read 2.7-5.0s straight after
        // stream_interval_join in two runs vs 0.66-0.88s isolated), but
        // forcing a full GC before every query recovered those ~2-3s
        // while costing ~15-20s of warmth across the other 257 entries
        // (sf1 aggregate 177.8->199.6). QueryTime keeps the gc() — it
        // measures ISOLATED minima; the bench measures the workload as a
        // workload, GC debt included.
        // guide §1.5 (r19): label the jobs and drop a stderr breadcrumb so
        // a mid-pass JVM death (the sf10 OOM this round) is attributable
        // to a query from the log — measurement-neutral; stdout keeps the
        // one-JSON-line contract (breadcrumbs go to stderr only)
        spark.sparkContext.setJobDescription(s"bench: $name")
        Console.err.println(s"bench pass=$passIdx query=$name")
        val t0 = System.nanoTime()
        try {
          // Execute the AUDITED plan (queryExecution.toRdd = the exact
          // physical plan ExplainDump gates), materializing every output
          // row. A plain .count() re-optimizes with only COUNT(*) as the
          // required output, which (r8 finding) eliminates unreferenced
          // left joins against keyed aggregates and prunes every projection
          // no aggregate consumes — dedup_substring benched at 0.11s under
          // count() while its real plan costs ~3s; text_repetition's
          // native-expression projection never ran at all. toRdd.count()
          // is the library-consumer cost: rows produced, none shipped to
          // the driver.
          val qe = fn(spark, sfDir).queryExecution
          // force analysis + optimization + initial physical planning WITHOUT
          // executing: executedPlan builds the (Adaptive)SparkPlan but runs
          // no stages. The floor split must NOT use `toRdd` as the marker —
          // under AQE, evaluating toRdd eagerly executes every non-result
          // query stage, which would book nearly all distributed work as
          // "planning" (first cut of this split measured exec_value=9.8s
          // against a 240s wall for exactly that reason).
          qe.executedPlan
          val t1 = System.nanoTime()
          qe.toRdd.count()
          val t2 = System.nanoTime()
          val dt = (t2 - t0) / 1e9
          val dtExec = (t2 - t1) / 1e9
          succeeded += name
          passTotal += dt
          detail(name) = dt
          if (!best.get(name).exists(_ <= dt)) best(name) = dt
          if (!bestExec.get(name).exists(_ <= dtExec)) bestExec(name) = dtExec
        } catch {
          case e: Throwable =>
            clean = false
            // strip EVERY char that can break the single-line JSON (quotes,
            // backslashes, all control chars) — a parse failure here zeroes
            // the whole round's bench
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
        }
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!warmIds.contains(id)) rdd.unpersist(false)
        }
      }
      passTotals += passTotal
      passClean += clean
      passDetail += detail
      passLoad += ((loadStart, loadavg()))
      val cpuEnd = cpuSample()
      val stealEnd = stealSample()
      passSteal += {
        if (stealStart < 0 || stealEnd < 0 || cpuStart._1 < 0 ||
          cpuEnd._1 <= cpuStart._1) -1.0
        else 100.0 * (stealEnd - stealStart) / (cpuEnd._1 - cpuStart._1)
      }
      val psiEnd = psiSample()
      passStall +=
        (if (psiStart < 0 || psiEnd < 0) -1L else (psiEnd - psiStart) / 1000)
      passExtCpu += {
        if (cpuStart._1 < 0 || cpuEnd._1 < 0 || cpuEnd._1 == cpuStart._1) -1.0
        else {
          val ext = (cpuEnd._2 - cpuStart._2) - (cpuEnd._3 - cpuStart._3)
          100.0 * math.max(0L, ext) / (cpuEnd._1 - cpuStart._1)
        }
      }
    }
    val results = best.filter { case (k, _) => succeeded(k) }
    val permanent = errors.filterNot { case (k, _) => succeeded(k) }
    def r(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    // Headline metric (r7 review): SUM OF PER-QUERY MINIMA across passes.
    // On the shared driver box, per-pass totals swing 3.5× under CPU steal
    // (r7: 80.7s / 224.2s / 284.2s for identical code) while the min-sum
    // stays stable round over round (44.2 → 44.6s) — it is the only
    // cross-round-comparable statistic this box can produce.
    val sumOfMins = if (results.nonEmpty) results.values.sum else 0.0
    val cleanTotals = passTotals.zip(passClean).collect { case (t, true) => t }
    // best single-pass total — a total one run actually achieved — kept as
    // a secondary field
    val total = if (cleanTotals.nonEmpty) cleanTotals.min else sumOfMins
    val medBase = (if (cleanTotals.nonEmpty) cleanTotals else passTotals).sorted
    val median =
      if (medBase.isEmpty) 0.0
      else if (medBase.length % 2 == 1) medBase(medBase.length / 2)
      else (medBase(medBase.length / 2 - 1) + medBase(medBase.length / 2)) / 2.0
    // Locale.ROOT everywhere: f"" uses the JVM default locale, and a
    // comma-decimal locale (de_DE etc.) would corrupt the JSON with [1,234].
    val pts = passTotals.map(r(_, 3)).mkString("[", ",", "]")
    val es = permanent.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // ALL per-query detail (minima + per-pass times, full precision) goes
    // to the side file, NEVER the stdout line: the driver parses its JSON
    // out of a ~2000-char stdout tail window, and a per-query map at 86+
    // queries overflows it — that zeroed the official bench number in
    // round 5 AND round 7. The side file is a JSON object so both views
    // live in one artifact.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_passes.json")
    val minJson = results.map { case (k, v) => "\"" + k + "\":" + r(v, 4) }
      .mkString("{", ",", "}")
    val execMinJson = bestExec.filter { case (k, _) => succeeded(k) }
      .map { case (k, v) => "\"" + k + "\":" + r(v, 4) }.mkString("{", ",", "}")
    val passesJson = passDetail.zipWithIndex.map { case (m, i) =>
      val qd = m.map { case (k, v) => "\"" + k + "\":" + r(v, 4) }.mkString("{", ",", "}")
      s"""{"pass":${i + 1},"clean":${passClean(i)},"total":${r(passTotals(i), 3)},"family_build_s":${r(familyBuilds(i), 3)},"load_1m_start":${r(passLoad(i)._1, 2)},"load_1m_end":${r(passLoad(i)._2, 2)},"ext_cpu_pct":${r(passExtCpu(i), 1)},"steal_pct":${r(passSteal(i), 2)},"cpu_stall_ms":${passStall(i)},"queries":$qd}"""
    }.mkString("[\n", ",\n", "\n]")
    // Pinned DuckDB baseline (r12 verdict #7): the committed artifact
    // tools/duckdb_baseline.py writes (min-of-N per oracle query, recorded
    // in the same box window as a Spark bench run) rides along in BOTH
    // bench artifacts, so weak-set adjudication compares against one
    // pinned number instead of whatever the oracle box did that day.
    // Only embedded when the baseline was measured on THIS sfDir.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_DUCKDB_BASELINE",
      "duckdb_baseline_sf0.1.json")
    val baseline: Option[(Int, Map[String, Double])] =
      try {
        val p = java.nio.file.Paths.get(baselinePath)
        if (!java.nio.file.Files.exists(p)) None
        else {
          val root = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readString(p))
          val bsf = Option(root.get("sf")).map(_.asText).getOrElse("")
          def norm(s: String) = s.stripSuffix("/")
          if (norm(bsf) != norm(sfDir)) None
          else {
            val pq = root.get("per_query")
            val m = pq.fieldNames.asScala
              .map(n => n -> pq.get(n).asDouble).toMap
            Some((Option(root.get("passes")).map(_.asInt).getOrElse(0), m))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    // ratio over the SHARED entries only (the baseline can't time non-SQL
    // entries and new queries may postdate the pin) — both sides are
    // sums of per-query minima over the intersection
    val baselineFields = baseline.map { case (bp, m) =>
      val shared = results.keySet.intersect(m.keySet)
      val sparkShared = shared.toSeq.map(results).sum
      val duckShared = shared.toSeq.map(m).sum
      val ratio = if (duckShared > 0) sparkShared / duckShared else -1.0
      (s""","duckdb_total":${r(m.values.sum, 3)},"duckdb_passes":$bp,""" +
        s""""shared_n":${shared.size},"spark_shared":${r(sparkShared, 3)},""" +
        s""""duckdb_shared":${r(duckShared, 3)},"vs_duckdb":${r(ratio, 3)}""",
        m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + r(v, 4) }
          .mkString(",\n\"duckdb_per_query\":{", ",", "}"))
    }
    val detailJson = s"""{"query_mins":$minJson,\n"query_exec_mins":$execMinJson${baselineFields.map(_._2).getOrElse("")},\n"passes":$passesJson}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), detailJson)
    catch { case _: Throwable => () } // diagnostics only — never fail the bench
    // The LAST stdout line is a SHORT fixed-field headline (~250 chars —
    // an order of magnitude of headroom in the tail window): metric,
    // value, pass stats, error map (normally {}), query count, sf.
    // exec_value = sum of execution-only minima (driver planning floor
    // excluded); family_build_s = per-pass dedup shared-pipeline warm cost,
    // charged to the family, not to whichever family query runs first
    val sumOfExecMins = bestExec.filter { case (k, _) => succeeded(k) }.values.sum
    val fb = familyBuilds.map(r(_, 3)).mkString("[", ",", "]")
    println(s"""{"metric":"sum_of_query_mins","value":${r(sumOfMins, 3)},"unit":"sec","exec_value":${r(sumOfExecMins, 3)},"family_build_s":$fb,"n_queries":${results.size},"best_pass_total":${r(total, 3)},"pass_totals":$pts,"pass_median":${r(median, 3)},"passes":$passes,"errors":$es${baselineFields.map(_._1).getOrElse("")},"sf":"$sfDir"}""")
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }
}
