package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Scratch lab for the r18 TPC-H join-constant attack: races q5 plan
  * shapes at a given sfDir and prints exec time + whether the lineitem
  * side still pays an exchange. Not part of the library surface.
  *   sbt "runMain graft.tools.JoinLab <sfDir> <passes>"
  */
object JoinLab {
  private def ts(s: String) = to_timestamp(lit(s))
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  // variant B: qualified-orders side built first, all joins hint-free —
  // AQE broadcasts from observed size, shuffle fallback at scale
  def q5Qual(spark: SparkSession, d: String): DataFrame = {
    val r = Tables.region(spark, d).filter(col("r_name") === "EUROPE").select("r_regionkey")
    val n = Tables.nation(spark, d).select("n_nationkey", "n_name", "n_regionkey")
    val nEur = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("n_nationkey")
    val c = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val cEur = c.join(broadcast(nEur), c("c_nationkey") === nEur("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val qual = o.join(cEur, o("o_custkey") === cEur("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    val s = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val l = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(qual, l("l_orderkey") === qual("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
        col("c_nationkey") === s("s_nationkey"))
      .groupBy(col("s_nationkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("revc"))
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), (col("revc") / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  // variant C: same, but the qual side is persisted+materialized so the
  // STATIC planner sees its true size and picks BHJ before any lineitem
  // shuffle write is scheduled
  def q5QualCached(spark: SparkSession, d: String): DataFrame = {
    val r = Tables.region(spark, d).filter(col("r_name") === "EUROPE").select("r_regionkey")
    val n = Tables.nation(spark, d).select("n_nationkey", "n_name", "n_regionkey")
    val nEur = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("n_nationkey")
    val c = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val cEur = c.join(broadcast(nEur), c("c_nationkey") === nEur("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val qual = o.join(cEur, o("o_custkey") === cEur("c_custkey"))
      .select("o_orderkey", "c_nationkey")
      .persist()
    qual.count() // materialize: InMemoryRelation now reports true size
    val s = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val l = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = l.join(qual, l("l_orderkey") === qual("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") &&
        col("c_nationkey") === s("s_nationkey"))
      .groupBy(col("s_nationkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("revc"))
      .join(broadcast(Tables.nation(spark, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), (col("revc") / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
    out
  }

  // time the q5 qualified-side build in isolation: scan+join vs persist cost
  def buildProbe(spark: SparkSession, d: String): Unit = {
    val r = Tables.region(spark, d).filter(col("r_name") === "EUROPE").select("r_regionkey")
    val n = Tables.nation(spark, d).select("n_nationkey", "n_name", "n_regionkey")
    val nEur = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("n_nationkey")
    def qual = {
      val cEur = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
        .join(broadcast(nEur), col("c_nationkey") === nEur("n_nationkey"))
        .select("c_custkey", "c_nationkey")
      Tables.orders(spark, d)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey")
        .join(cEur, col("o_custkey") === cEur("c_custkey"))
        .select("o_orderkey", "c_nationkey")
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val nRows = qual.count() // no persist: pure scan+join cost
      val t1 = System.nanoTime()
      val p = qual.persist()
      p.count()
      val t2 = System.nanoTime()
      p.unpersist()
      println(f"PROBE pass$i qual rows=$nRows plainCount=${(t1 - t0) / 1e9}%6.3f persistCount=${(t2 - t1) / 1e9}%6.3f")
    }
    val q = qual
    q.queryExecution.toRdd.count()
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("Broadcast"))
      .mkString("\n"))
    // orders scan alone
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = Tables.orders(spark, d)
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey").count()
      println(f"PROBE pass$i ordersScan rows=$c t=${(System.nanoTime() - t0) / 1e9}%6.3f")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 2 && args(2) == "probe") {
      graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).queryExecution.toRdd.count()
      buildProbe(spark, sfDir)
      spark.stop()
      return
    }
    println("bloom filter conf: " +
      spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    // warm footers
    graft.SparkEntry.queries("q5_region_join")(spark, sfDir).queryExecution.toRdd.count()

    // q_corr_subquery, shared-exchange form: one repartition(partkey) feeds
    // both the stats aggregate and the probe side — ReuseExchange (and
    // AQE's stage reuse) materializes the shuffle once, no cache involved
    def qCorrReuse(d: String): DataFrame = {
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val lp = Tables.lineitem(spark, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .repartition(n, col("l_partkey"))
      val p = Tables.part(spark, d).select("p_partkey", "p_brand")
      val stats = lp.groupBy(col("l_partkey").as("s_partkey"))
        .agg(sum(cents(col("l_quantity"))).as("sq"), count(lit(1)).as("cq"))
      lp.join(stats, lp("l_partkey") === stats("s_partkey"))
        .filter(cents(col("l_quantity")) * col("cq") * lit(5L) < col("sq"))
        .join(p, lp("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg((sum(cents(col("l_extendedprice"))) / 100.0).as("low_qty_revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("p_brand")
    }
    // q3 original (pre-r18) shape: lazy o+c join, post-join groupBy
    def q3Orig(d: String): DataFrame = {
      val c = Tables.customer(spark, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(spark, d)
        .filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(spark, d)
        .filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o.join(c, o("o_custkey") === c("c_custkey")),
          l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"),
          col("o_orderpriority"))
        .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }
    // q_overlap_matrix pre-r18 shape: two consumers of the ud exchange
    def omOrig(d: String): DataFrame = {
      val ud = Tables.events(spark, d)
        .select(col("user_id"), expr("cast(ts as long) div 86400").as("day"), col("event_type"))
        .groupBy("user_id", "day")
        .agg(sort_array(collect_set("event_type")).as("types"))
      val pairs = ud.select(explode(expr(
          "flatten(transform(types, (a, i) -> " +
            "transform(slice(types, i + 2, size(types)), b -> struct(a AS ta, b AS tb))))")).as("p"))
        .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      val tot = ud.select(explode(col("types")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
      pairs
        .join(tot.select(col("t").as("ta_k"), col("n").as("n_a")), col("type_a") === col("ta_k"))
        .join(tot.select(col("t").as("tb_k"), col("n").as("n_b")), col("type_b") === col("tb_k"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
          (col("n_both").cast("double") / (col("n_a") + col("n_b") - col("n_both")).cast("double"))
            .as("jaccard"))
        .orderBy("type_a", "type_b")
    }
    // q17 r18 attack: the raw 60M-row lineitem side pays a partkey
    // exchange ONLY to meet the 2M-row per-part stats. Packing the stats
    // into (partkey, sum_qty<<20 | cnt) keeps the side ~32 MB — under the
    // 64 MB static threshold at sf10 — so a persisted+materialized memo
    // static-broadcasts and the raw side never exchanges. At 100x SF the
    // stats side outgrows the threshold and the same plan degrades to
    // the shuffle join by itself (the memoSide contract).
    def q17Packed(d: String, pin: Boolean): DataFrame = {
      val l = Tables.lineitem(spark, d).select(
        col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
      var perPart = l.groupBy("l_partkey")
        .agg((sum(col("qty")) * lit(1L << 20) + count(lit(1))).as("packed"))
      if (pin) {
        perPart = perPart.persist()
        perPart.count()
      }
      val p = Tables.part(spark, d).select(col("p_partkey"), col("p_brand"))
      l.join(perPart, Seq("l_partkey"))
        .filter(col("qty") * lit(5L) * col("packed").bitwiseAND(lit((1L << 20) - 1)) <
          shiftright(col("packed"), 20))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small_lines"),
          (sum(col("price_c")) / 100.0).as("small_revenue"))
        .orderBy("p_brand")
    }
    def q17Shj(d: String): DataFrame = {
      val l = Tables.lineitem(spark, d).select(
        col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))
      val perPart = l.groupBy("l_partkey")
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
        .hint("shuffle_hash")
      val p = Tables.part(spark, d).select(col("p_partkey"), col("p_brand"))
      l.join(perPart, Seq("l_partkey"))
        .filter(col("qty") * lit(5L) * col("cnt") < col("sum_qty"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small_lines"),
          (sum(col("price_c")) / 100.0).as("small_revenue"))
        .orderBy("p_brand")
    }
    // sketch_jaccard_calib truth-join shapes: string concat key (pre-r18)
    // vs (user_id, day) integer keys vs overlap-style set explode
    def calibStr(d: String): DataFrame = {
      val ev = Tables.events(spark, d)
      val users = ev.select(col("event_type"),
        concat_ws(":", col("user_id").cast("string"),
          date_format(col("ts"), "yyyy-MM-dd")).as("user_id")).distinct()
      val usizes = users.groupBy("event_type").agg(count(lit(1)).as("mu"))
      val uinter = users.as("a").join(users.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("nu"))
      uinter.join(usizes.select(col("event_type").as("t1"), col("mu").as("mu1")), Seq("t1"))
        .join(usizes.select(col("event_type").as("t2"), col("mu").as("mu2")), Seq("t2"))
        .orderBy("t1", "t2")
    }
    def calibInt(d: String): DataFrame = {
      val ev = Tables.events(spark, d)
      val users = ev.select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day")).distinct()
      val usizes = users.groupBy("event_type").agg(count(lit(1)).as("mu"))
      val uinter = users.as("a").join(users.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("nu"))
      uinter.join(usizes.select(col("event_type").as("t1"), col("mu").as("mu1")), Seq("t1"))
        .join(usizes.select(col("event_type").as("t2"), col("mu").as("mu2")), Seq("t2"))
        .orderBy("t1", "t2")
    }
    // overlap-matrix lowering: ONE (user_id, day) exchange, set explode
    // with the diagonal as the per-type total
    def calibSet(d: String): DataFrame = {
      val ud = Tables.events(spark, d)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
        .groupBy("user_id", "day")
        .agg(sort_array(collect_set("event_type")).as("types"))
      val cells = ud.select(explode(expr(
          "flatten(transform(types, (a, i) -> " +
            "transform(slice(types, i + 1, size(types) - i), b -> struct(a AS ta, b AS tb))))")).as("p"))
        .groupBy(col("p.ta").as("t1"), col("p.tb").as("t2"))
        .agg(count(lit(1)).as("nu"))
      val diag = when(col("t1") === col("t2"), col("nu"))
      cells
        .withColumn("mu1", max(diag).over(Window.partitionBy("t1")))
        .withColumn("mu2", max(diag).over(Window.partitionBy("t2")))
        .filter(col("t1") < col("t2"))
        .orderBy("t1", "t2")
    }
    // q12 shapes: payload-trimmed orders side (hi computed pre-exchange)
    // and shuffle_hash vs the planner's SMJ
    def q12Trim(d: String, shj: Boolean): DataFrame = {
      val l = Tables.lineitem(spark, d)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .select("l_orderkey", "l_returnflag", "l_shipdate")
      var o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hi"))
      if (shj) o = o.hint("shuffle_hash")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("hi"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("hi"), 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A_q12_orig" -> (() => graft.SparkEntry.queries("q12_late_priority")(spark, sfDir)),
      "B_q12_trim" -> (() => q12Trim(sfDir, shj = false)),
      "C_q12_trim_shj" -> (() => q12Trim(sfDir, shj = true)),
      "A2_q12_orig" -> (() => graft.SparkEntry.queries("q12_late_priority")(spark, sfDir)),
      "B2_q12_trim" -> (() => q12Trim(sfDir, shj = false)),
      "C2_q12_trim_shj" -> (() => q12Trim(sfDir, shj = true))
    )
    for ((name, mk) <- variants) {
      var bestT = Double.MaxValue
      var bestE = Double.MaxValue
      var rows = 0L
      var plan = ""
      for (_ <- 1 to passes) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = mk() // memo variants persist+materialize inside: build cost lands here
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.count()
        rows = df.count()
        val t2 = System.nanoTime()
        val tE = (t2 - t1) / 1e9
        val tT = (t2 - t0) / 1e9
        if (tE < bestE) bestE = tE
        if (tT < bestT) bestT = tT // build+exec: the number Bench would see
        plan = df.queryExecution.executedPlan.toString
      }
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      println(f"LAB $name%-14s total=$bestT%6.3f exec=$bestE%6.3f rows=$rows hashExchanges=$exchanges bhj=$bhj")
      // print result head for parity eyeball
      mk().collect().take(3).foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
