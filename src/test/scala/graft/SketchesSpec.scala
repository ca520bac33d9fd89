package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("hll sketch equals an exact local recomputation of the register definition") {
    val events = graft.sources.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = events.groupBy(_._1).map { case (et, rs) =>
      val regs = scala.collection.mutable.Map[Long, Long]()
      rs.map(_._2).distinct.foreach { uid =>
        val h = java.lang.Long.parseLong(md5Hex(uid.toString).take(15), 16)
        val idx = h % 64
        val rest = h / 64
        val rho = if (rest == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        regs(idx) = math.max(regs.getOrElse(idx, 0L), rho)
      }
      val sumScaled = regs.values.map(m => 1L << (55 - m)).sum + (64 - regs.size) * (1L << 55)
      val raw = 0.709 * 64 * 64 * math.pow(2.0, 55) / sumScaled.toDouble
      val v = 64 - regs.size
      val corrected = if (raw <= 2.5 * 64 && v > 0) 64.0 * math.log(64.0 / v) else raw
      val est = math.floor(corrected * 1e6 + 0.5) / 1e6
      et -> (rs.map(_._2).distinct.length.toLong, est)
    }
    val got = Sketches.sketchHll(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nExact, est) = expected(r.getString(0))
      assert(r.getAs[Long]("n_exact") === nExact)
      assert(r.getAs[Double]("hll_est") === est)
    }
  }

  test("cms estimate is an overestimate for every key and exact for collision-free keys") {
    val rows = Sketches.sketchCms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_exact"),
        s"user ${r.getLong(0)}: CMS must never underestimate")
    }
    // total mass conservation: sum of exact counts = total events
    val totalEvents = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_exact")).sum === totalEvents)
    // the sketch must be informative, not saturated: at least half the keys
    // within 2x of truth at this density (64-wide rows, ~150 keys)
    val tight = rows.count(r => r.getAs[Long]("cms_est") <= 2 * r.getAs[Long]("n_exact"))
    assert(tight * 2 >= rows.length)
  }

  test("sketches merge: half-corpus registers combine to exactly the whole-corpus sketch") {
    // THE scale property: sketch state computed per partition/shard merges
    // associatively (max for HLL registers, sum for CMS counters) into the
    // state a single pass over all data would produce. Verified exactly on
    // a doc_id-parity split of the events table.
    val events = graft.sources.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def hllRegs(rs: Seq[(String, Long)]): Map[(String, Long), Long] =
      rs.groupBy(_._1).flatMap { case (et, g) =>
        g.map(_._2).distinct.map { uid =>
          val h = java.lang.Long.parseLong(md5Hex(uid.toString).take(15), 16)
          val rest = h / 64
          val rho = if (rest == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
          (et, h % 64) -> rho
        }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      }
    val (a, b) = events.partition(_._2 % 2 == 0)
    val merged = (hllRegs(a.toSeq).toSeq ++ hllRegs(b.toSeq).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(merged === hllRegs(events.toSeq))

    def cmsCells(rs: Seq[(String, Long)]): Map[(Int, Long), Long] =
      rs.flatMap { case (_, uid) =>
        (0 until 4).map { i =>
          // r17 carve: row i = hex chars [8i, 8i+8) of ONE md5 (mirrors cmsIdxFromHash)
          (i, java.lang.Long.parseLong(md5Hex(uid.toString).substring(8 * i, 8 * i + 8), 16) % 64) -> 1L
        }
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val mergedCms = (cmsCells(a.toSeq).toSeq ++ cmsCells(b.toSeq).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(mergedCms === cmsCells(events.toSeq))
  }

  test("hll estimate lands within the expected error band of the exact count") {
    // standard error for m=64 is 1.04/sqrt(64) = 13%; allow 3 sigma
    Sketches.sketchHll(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact < 0.39,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("bloom probe matches local bit recomputation and has no false negatives") {
    def pos(uid: Long, j: Int): Long =
      java.lang.Long.parseLong(md5Hex(uid.toString).substring(3 * j, 3 * j + 3), 16)
    val ev = graft.sources.Tables.events(spark, sf)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val members = ev.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    val bits = members.map { case (t, us) =>
      t -> us.flatMap(u => (0 until 4).map(j => pos(u, j)))
    }
    val got = graft.operators.Sketches.sketchBloom(spark, sf).collect()
    assert(got.length === members.size * 20)
    got.foreach { r =>
      val (t, u) = (r.getString(0), r.getAs[Long]("probe_uid"))
      val expBloom = (0 until 4).forall(j => bits(t).contains(pos(u, j)))
      val expExact = members(t).contains(u)
      assert(r.getAs[Long]("bloom_hit") === (if (expBloom) 1L else 0L), s"($t,$u) bloom")
      assert(r.getAs[Long]("exact_hit") === (if (expExact) 1L else 0L), s"($t,$u) exact")
      // the Bloom guarantee: membership NEVER reads as absent
      if (expExact) assert(r.getAs[Long]("bloom_hit") === 1L)
    }
  }

  test("quantile sketch brackets the exact percentile within one bin width") {
    // the calib audit entry carries the exact side; the bracket property is
    // the sketch's error contract, so it is asserted there
    val rows = graft.operators.Sketches.sketchQuantileCalib(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("p50", "p90", "p99").foreach { p =>
        val est = r.getAs[Double](s"${p}_est")
        val exact = r.getAs[Double](s"${p}_exact")
        // the estimate is the containing bin's UPPER edge: never below the
        // exact discrete percentile, never more than one bin width above
        assert(est >= exact, s"$p est $est < exact $exact")
        assert(est - exact <= 16.0, s"$p est $est too far above exact $exact")
      }
      assert(r.getAs[Double]("p50_est") <= r.getAs[Double]("p90_est"))
      assert(r.getAs[Double]("p90_est") <= r.getAs[Double]("p99_est"))
    }
  }

  test("log histogram brackets the exact percentile within the 25% relative band") {
    import org.apache.spark.sql.functions._
    // exact discrete percentiles per flag (rank rule ceil(p·n), the same
    // rule the sketch applies to its cumulative bucket counts), computed
    // locally on the collected cents — lineitem at this SF is spec-sized
    val cents = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("c")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getAs[Long]("c")).sorted).toMap
    val rows = Sketches.sketchLogHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val vs = cents(flag)
      assert(r.getAs[Long]("n") === vs.length.toLong)
      Seq(50 -> "p50_est_c", 95 -> "p95_est_c", 99 -> "p99_est_c").foreach {
        case (p, cn) =>
          val est = r.getAs[Long](cn)
          val exact = vs(((vs.length.toLong * p + 99) / 100).toInt - 1)
          // the estimate is the containing bucket's UPPER edge: never
          // below the exact value, never beyond its bucket's 25% relative
          // width (lb ≥ 4·2^(e−2), width = 2^(e−2))
          assert(est >= exact, s"$flag $cn: est $est < exact $exact")
          assert(est.toDouble <= exact.toDouble * 1.25,
            s"$flag $cn: est $est breaks the relative band vs $exact")
      }
    }
  }

  test("union sketch registers equal the elementwise max of per-type registers") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val global = graft.operators.Sketches.hllRegisters(ev.select(lit("all").as("event_type"), col("user_id")))
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Long]("m_j")).toMap
    val merged = graft.operators.Sketches.hllRegisters(ev)
      .collect().groupBy(_.getAs[Long]("idx"))
      .map { case (i, rs) => i -> rs.map(_.getAs[Long]("m_j")).max }
    assert(merged === global)
    // and the reported union estimate is a sane HLL estimate of the exact
    val row = graft.operators.Sketches.sketchHllUnion(spark, sf).collect().head
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("hll_est")
    assert(math.abs(est - exact) / exact < 0.5, s"est $est vs exact $exact")
  }

  test("theta sketch: estimate tracks exact within the 1/sqrt(retained) band; merge law holds") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val rows = graft.operators.Sketches.sketchTheta(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_retained"), r.getAs[Long]("est_distinct"),
        r.getAs[Long]("exact_distinct")))
    assert(rows.nonEmpty)
    rows.foreach { case (t, nr, est, exact) =>
      assert(est === nr * 16)
      if (nr >= 20) { // enough retained hashes for the error band to mean anything
        val err = math.abs(est.toDouble - exact.toDouble) / exact.toDouble
        assert(err < 4.0 / math.sqrt(nr.toDouble), s"$t err $err with $nr retained")
      }
    }
    // merge law: retained sets from two disjoint time halves union to the whole
    val ev = Tables.events(spark, sf)
    val mid = lit("2024-01-16 00:00:00").cast("timestamp")
    val key = md5(concat_ws(":", col("user_id").cast("string"), date_format(col("ts"), "yyyy-MM-dd")))
    def retained(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), key.as("h")).where(substring(col("h"), 1, 1) === "0")
        .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    val whole = retained(ev)
    val merged = retained(ev.filter(col("ts") < mid)) union retained(ev.filter(col("ts") >= mid))
    assert(merged === whole)
  }

  test("jaccard estimate is consistent with theta sizes and brackets the exact overlap") {
    val theta = graft.operators.Sketches.sketchTheta(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_retained")).toMap
    val rows = graft.operators.Sketches.sketchJaccardCalib(spark, sf).collect()
    assert(rows.length === theta.size * (theta.size - 1) / 2)
    rows.foreach { r =>
      val (t1, t2) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("m1") === theta(t1)) // same sketch feeds both operators
      assert(r.getAs[Long]("m2") === theta(t2))
      val ni = r.getAs[Long]("n_inter")
      assert(ni <= math.min(theta(t1), theta(t2)))
      val jx = r.getAs[Double]("jacc_exact")
      assert(jx >= 0.0 && jx <= 1.0)
      if (!r.isNullAt(r.fieldIndex("jacc_est"))) {
        val je = r.getAs[Double]("jacc_est")
        assert(je >= 0.0 && je <= 1.0)
      }
    }
  }

  test("ams: exact F2 bounds hold and the estimate lands within sketch error") {
    val rows = Sketches.sketchAms(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val f2 = r.getAs[Long]("f2_exact")
      val est = r.getAs[Double]("ams_est")
      // each key contributes n_k^2 >= n_k; and F2 <= n^2 (single-key worst case)
      assert(f2 >= n && f2 <= n * n)
      // median-of-4-means-of-16 keeps the estimate within a small constant
      // factor of the truth (deterministic here — hashes are seeded)
      assert(est > 0.3 * f2 && est < 3.0 * f2, s"${r.getString(0)} est $est vs $f2")
    }
  }

  test("sketch_bloom_join: no false negatives, and the filter actually filters") {
    // grading columns live in the calib audit entry; the production entry
    // must agree with it on the shared columns
    val r = graft.operators.Sketches.sketchBloomJoinCalib(spark, sf).head
    val prod = graft.operators.Sketches.sketchBloomJoin(spark, sf).head
    assert(prod.getAs[Long]("n_fact_lines") === r.getAs[Long]("n_fact_lines"))
    assert(prod.getAs[Long]("n_pass_bloom") === r.getAs[Long]("n_pass_bloom"))
    val (nFact, nPass, nTrue, nFp) = (r.getAs[Long]("n_fact_lines"),
      r.getAs[Long]("n_pass_bloom"), r.getAs[Long]("n_true_match"),
      r.getAs[Long]("n_false_pos"))
    assert(nTrue > 0, "build side matched nothing — the probe window is dead")
    assert(nTrue <= nPass, "false negative: a true match failed the bloom test")
    assert(nFp === nPass - nTrue)
    // the pushdown is worth doing: the bloom passes a small fraction of the
    // fact side (508 build keys in 4096 bits keeps fp low at every sf)
    assert(nPass < nFact / 2, s"bloom saturated: $nPass of $nFact passed")
  }

  test("hll intersection: estimates rebuild from the register law and exact pairs reconcile") {
    import org.apache.spark.sql.functions._
    val M = 64
    val regs = graft.operators.Sketches.hllRegisters(
        graft.sources.Tables.events(spark, sf)).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("idx"), r.getAs[Long]("m_j")))
    val byType = regs.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def estOf(m: Map[Long, Long]): Double = {
      val sumScaled = m.values.map(mj => 1L << (55 - mj).toInt).sum +
        (M - m.size).toLong * (1L << 55)
      val raw = 0.709 * M * M * math.pow(2.0, 55) / sumScaled.toDouble
      val v = M - m.size
      val est = if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v) else raw
      math.floor(est * 1e6 + 0.5) / 1e6
    }
    val exactPairs = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type"))
      .groupBy(_._1).values.flatMap { g =>
        val ts = g.map(_._2).distinct.sorted
        for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = graft.operators.Sketches.sketchHllIntersection(spark, sf).collect()
    val types = byType.keySet.toSeq.sorted
    assert(rows.length === types.combinations(2).size)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      // union registers = elementwise max; all three estimates rebuild exactly
      val merged = (byType(a).keySet ++ byType(b).keySet).map { i =>
        i -> math.max(byType(a).getOrElse(i, 0L), byType(b).getOrElse(i, 0L))
      }.toMap
      val expected = math.floor(
        (estOf(byType(a)) + estOf(byType(b)) - estOf(merged)) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("inter_est") === expected)
      assert(r.getAs[Long]("n_exact") === exactPairs.getOrElse((a, b), 0L))
    }
  }
}
