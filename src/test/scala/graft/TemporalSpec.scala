package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.sources.Tables

class TemporalSpec extends SparkSpec {

  test("asof: every purchase appears exactly once (left as-of keeps non-matches)") {
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    val out = Temporal.qAsofJoin(spark, sf)
    assert(out.count() === purchases)
    assert(out.select("event_id").distinct().count() === purchases)
  }

  test("asof: matched view is at-or-before the purchase, same user, and is the latest such view") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect()
    val views = ev.filter(_.getAs[String]("event_type") == "view")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t"), r.getAs[Long]("event_id")))
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
      .map(r => r.getAs[Long]("event_id") -> (r.getAs[Long]("user_id"), r.getAs[Long]("t"))).toMap
    Temporal.qAsofJoin(spark, sf).collect().foreach { r =>
      val (user, pt) = purchases(r.getAs[Long]("event_id"))
      val eligible = views.filter { case (u, vt, _) => u == user && vt <= pt }
      if (r.isNullAt(r.fieldIndex("view_id"))) assert(eligible.isEmpty)
      else {
        // independently recompute the winner: max (t, event_id)
        val (_, bt, bid) = eligible.maxBy { case (_, vt, id) => (vt, id) }
        assert(r.getAs[Long]("view_id") === bid)
        assert(r.getAs[Long]("lag_us") === pt - bt)
      }
    }
  }

  test("asof tolerance: equals plain as-of with stale matches nulled") {
    val plain = Temporal.qAsofJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("lag_us"))) None else Some(r.getAs[Long]("lag_us")))).toMap
    val bounded = Temporal.qAsofTolerance(spark, sf).collect()
    assert(bounded.length === plain.size)
    var nulledByBound = 0
    bounded.foreach { r =>
      val lag = plain(r.getAs[Long]("event_id"))
      lag match {
        case Some(l) if l <= 3600000000L =>
          assert(r.getAs[Long]("lag_us") === l)
          assert(!r.isNullAt(r.fieldIndex("view_id")))
        case Some(_) => // stale: the bound must null the match
          assert(r.isNullAt(r.fieldIndex("view_id")))
          nulledByBound += 1
        case None =>
          assert(r.isNullAt(r.fieldIndex("view_id")))
      }
    }
    assert(nulledByBound > 0, "the 1h bound should actually reject some stale matches")
  }

  test("range join: counts equal an independently computed interval scan") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect()
    val all = ev.map(_.getAs[Long]("t")).sorted
    val expected = ev.filter(_.getAs[String]("event_type") == "error").map { r =>
      val t0 = r.getAs[Long]("t")
      r.getAs[Long]("event_id") -> all.count(t => t >= t0 && t < t0 + 600000000L).toLong
    }.toMap
    val got = Temporal.qRangeJoin(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n")).toMap
    assert(got === expected.filter(_._2 > 0)) // every anchor matches itself → no dropped rows
    assert(expected.values.forall(_ > 0))
  }

  test("range join plan has no cartesian product and no nested loop join") {
    val plan = Temporal.qRangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
