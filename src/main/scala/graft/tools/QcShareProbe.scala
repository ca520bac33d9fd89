package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** r15 verdict #4 probe: would ds_cusum + ds_spc_rules get cheaper by
  * SHARING one (compound, b)-repartitioned, checkpointed stream carrying
  * (compound, b, event_id, cts, vc, t, madx) — the scan+parse, the two
  * center/spread aggregates, the dev join, and the bucket exchange paid
  * once for the pair instead of twice? Times the registered pair
  * (sequential, as a bench pass sees them) against a hand-fused variant
  * whose two window pipelines read the shared checkpoint. Min-of-3.
  */
object QcShareProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt

    def sharedRows(): DataFrame = {
      val k0 = graft.operators.Selection.keyedFor(spark, d)
        .select(col("event_id"), col("compound"), col("cts"),
          round(col("value") * 100).cast("long").as("vc"))
        .withColumn("tu", unix_micros(col("cts")))
      val stats = k0.groupBy("compound").agg(
        count(lit(1)).as("n"), sum(col("vc")).as("sv"),
        min(col("tu")).as("tmin"), max(col("tu")).as("tmax"))
        .withColumn("t", expr("sv div n"))
      val dev = k0.join(stats.select("compound", "t", "n", "tmin", "tmax"), Seq("compound"))
        .groupBy("compound").agg(max(col("t")).as("t"),
          expr("sum(abs(vc - t)) div max(n)").as("madx"),
          max(col("tmin")).as("tmin"), max(col("tmax")).as("tmax"))
      k0.join(dev, Seq("compound"))
        .withColumn("b", expr("(tu - tmin) * 256 div (tmax - tmin + 1)"))
        .select("compound", "b", "event_id", "cts", "vc", "t", "madx")
        .repartition(n, col("compound"), col("b"))
        .localCheckpoint(false)
    }

    def cusumFromShared(sh: DataFrame): DataFrame = {
      val rows = sh
        .withColumn("k", expr("madx div 2"))
        .withColumn("h", expr("madx * 4"))
        .withColumn("dh", col("vc") - col("t") - col("k"))
        .withColumn("dl", col("t") - col("k") - col("vc"))
      val lw = Window.partitionBy("compound", "b").orderBy("cts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = rows
        .withColumn("lph", sum(col("dh")).over(lw))
        .withColumn("lpl", sum(col("dl")).over(lw))
        .withColumn("lmh", min(col("lph")).over(lw))
        .withColumn("lml", min(col("lpl")).over(lw))
        .select("compound", "b", "event_id", "h", "dh", "dl",
          "lph", "lpl", "lmh", "lml")
        .localCheckpoint(false)
      val cw = Window.partitionBy("compound").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val census = local.groupBy("compound", "b").agg(
        sum(col("dh")).as("sdh"), sum(col("dl")).as("sdl"),
        min(col("lph")).as("bmh"), min(col("lpl")).as("bml"))
        .withColumn("offh", coalesce(sum(col("sdh")).over(cw), lit(0L)))
        .withColumn("offl", coalesce(sum(col("sdl")).over(cw), lit(0L)))
        .withColumn("pmh", min(col("offh") + col("bmh")).over(cw))
        .withColumn("pml", min(col("offl") + col("bml")).over(cw))
        .select("compound", "b", "offh", "offl", "pmh", "pml")
      val p = local.join(census, Seq("compound", "b"))
        .withColumn("sh", col("offh") + col("lph") -
          least(least(col("pmh"), col("offh") + col("lmh")), lit(0L)))
        .withColumn("sl", col("offl") + col("lpl") -
          least(least(col("pml"), col("offl") + col("lml")), lit(0L)))
      p.select(col("compound"), col("event_id"), col("h"),
          explode(array(
            struct(lit("high").as("side"), col("sh").as("s")),
            struct(lit("low").as("side"), col("sl").as("s")))).as("x"))
        .select(col("compound"), col("event_id"),
          col("x.side").as("side"), col("x.s").as("s"), col("h"))
        .filter(col("s") > col("h"))
        .orderBy("compound", "event_id", "side")
    }

    def spcFromShared(sh: DataFrame): DataFrame = {
      val rows = sh.withColumn("side",
        when(col("vc") > col("t"), lit(1L))
          .when(col("vc") < col("t"), lit(-1L)).otherwise(lit(0L)))
      val lw = Window.partitionBy("compound", "b").orderBy("cts", "event_id")
      val local = rows.withColumn("li", row_number().over(lw))
        .select("compound", "b", "event_id", "vc", "t", "madx", "side", "li")
        .localCheckpoint(false)
      val cw = Window.partitionBy("compound").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val census = local.groupBy("compound", "b").agg(count(lit(1)).as("cb"))
        .withColumn("start", coalesce(sum(col("cb")).over(cw), lit(0L)) + 1L)
        .select("compound", "b", "start", "cb")
      val own = local.join(census, Seq("compound", "b"))
        .withColumn("i", col("start") + col("li") - 1L)
        .select("compound", "b", "cb", "li", "event_id", "vc", "t", "madx", "side", "i")
        .localCheckpoint(false)
      val baseCols = Seq("compound", "event_id", "vc", "t", "madx", "side", "i")
      val ownK = own.select(baseCols.map(col) :+ col("b").as("gb") :+ lit(false).as("ctx"): _*)
      val ctxK = own.filter(col("li") > col("cb") - 7)
        .withColumn("tstart", explode(expr("sequence(i + 1, i + 7)")))
        .join(census.select(col("compound"), col("start").as("tstart"), col("b").as("tb")),
          Seq("compound", "tstart"))
        .select(baseCols.map(col) :+ col("tb").as("gb") :+ lit(true).as("ctx"): _*)
      val ord = Window.partitionBy("compound", "gb").orderBy("i")
      val w8 = ord.rowsBetween(-7, Window.currentRow)
      val w6 = ord.rowsBetween(-5, Window.currentRow)
      val p = ownK.union(ctxK)
        .withColumn("prev", lag(col("vc"), 1).over(ord))
        .withColumn("mv",
          when(col("prev").isNull, lit(0L))
            .when(col("vc") > col("prev"), lit(1L))
            .when(col("vc") < col("prev"), lit(-1L)).otherwise(lit(0L)))
        .withColumn("s8", sum(col("side")).over(w8))
        .withColumn("m6", sum(col("mv")).over(w6))
      p.filter(!col("ctx"))
        .groupBy("compound").agg(
          count(lit(1)).as("n_points"),
          sum(when(abs(col("vc") - col("t")) > col("madx") * 3, 1L)
            .otherwise(0L)).as("n_rule1"),
          sum(when(col("i") >= 8 && abs(col("s8")) === 8, 1L)
            .otherwise(0L)).as("n_rule2"),
          sum(when(col("i") >= 7 && abs(col("m6")) === 6, 1L)
            .otherwise(0L)).as("n_rule3"))
        .orderBy("compound")
    }

    def run(tag: String, body: () => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        val t0 = System.nanoTime()
        body()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"QCSHARE $tag%-22s $best%.3fs")
    }

    run("pair_registered", () => {
      SparkEntry.queries("ds_cusum")(spark, d).queryExecution.toRdd.count()
      SparkEntry.queries("ds_spc_rules")(spark, d).queryExecution.toRdd.count()
    })
    run("pair_shared_stream", () => {
      val sh = sharedRows()
      cusumFromShared(sh).queryExecution.toRdd.count()
      spcFromShared(sh).queryExecution.toRdd.count()
    })
    // sanity: shared-stream results must match the registered ones
    val sh = sharedRows()
    val a = cusumFromShared(sh).collect().map(_.toString).sorted
    val b = SparkEntry.queries("ds_cusum")(spark, d).collect().map(_.toString).sorted
    val c = spcFromShared(sh).collect().map(_.toString).sorted
    val e = SparkEntry.queries("ds_spc_rules")(spark, d).collect().map(_.toString).sorted
    println(s"QCSHARE parity cusum=${a.sameElements(b)} spc=${c.sameElements(e)}")
    spark.stop()
  }
}
