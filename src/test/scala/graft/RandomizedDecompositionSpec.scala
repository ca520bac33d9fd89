package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Sketches, TextAnalysis}
import org.apache.spark.sql.functions.timestamp_seconds

/** Randomized brute-force checks for the round-12 decompositions — the
  * r11 pattern (seeded corpora, exact equality, no epsilon) applied to the
  * three subtlest new reductions:
  *  - select_quality_tiers' sort-free lattice-histogram tercile cuts vs a
  *    direct sort-based rank derivation,
  *  - q_bitmap_intersect's combinable bit_or masks vs per-user fold,
  *  - sketch_hll_intersection's inclusion–exclusion estimate vs an
  *    in-process register simulation (md5 replicated exactly).
  * Seeds are fixed so failures reproduce.
  */
class RandomizedDecompositionSpec extends SparkSpec {

  test("randomized: quality-tier cuts equal the sort-based derivation on 10 seeded corpora") {
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val langs = (0 until 1 + rnd.nextInt(3)).map(i => s"l$i")
      // text with k stop tokens out of n → iq = 100000·k div n exactly
      val docs = langs.flatMap { lang =>
        (0 until 1 + rnd.nextInt(40)).map { i =>
          val n = 1 + rnd.nextInt(12)
          val k = rnd.nextInt(n + 1)
          val text = (Seq.fill(k)("the") ++ Seq.fill(n - k)("x")).mkString(" ")
          (langs.indexOf(lang) * 1000L + i, lang, text.length.toLong, text)
        }
      }
      val got = TextAnalysis.selectQualityTiersFrom(
          docs.toDF("doc_id", "lang", "n_chars", "text"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"), r.getAs[Double]("share"))))
        .toMap
      val expected = docs.groupBy(_._2).flatMap { case (lang, g) =>
        val scores = g.map { case (_, _, _, t) =>
          val w = t.split(" ")
          100000L * w.count(_ == "the") / w.length
        }
        val n = g.size.toLong
        val desc = scores.sorted(Ordering[Long].reverse)
        val c1 = desc(((n + 2) / 3 - 1).toInt)
        val c2 = desc(((2 * n + 2) / 3 - 1).toInt)
        g.zip(scores).groupBy { case (_, iq) =>
          if (iq >= c1) "head" else if (iq >= c2) "middle" else "tail"
        }.map { case (tier, t) =>
          (lang, tier) ->
            ((t.size.toLong, t.map(_._1._3).sum, t.size.toDouble / n))
        }
      }
      assert(got === expected, s"seed=$seed")
    }
  }

  test("randomized: bitmap-intersect masks equal the per-user fold on 10 seeded corpora") {
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val types = Seq("view", "purchase", "click")
      val ev = (0 until 30 + rnd.nextInt(120)).map { i =>
        (i.toLong, 1L + rnd.nextInt(15),
          types(rnd.nextInt(types.length)), rnd.nextInt(72) * 3600L + rnd.nextInt(3600))
      }
      val df = ev.toDF("event_id", "user_id", "event_type", "sec")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("sec")).as("ts"))
      val got = Analytics.qBitmapIntersectFrom(df).collect()
        .map(r => r.getAs[Long]("n_hours_both") ->
          ((r.getAs[Long]("n_users"), r.getAs[Long]("n_users_overlapping")))).toMap
      val masks = ev.filter(e => e._3 == "view" || e._3 == "purchase")
        .groupBy(_._2).view.mapValues { g =>
          val ma = g.filter(_._3 == "view").map(e => 1L << ((e._4 / 3600) % 24)).fold(0L)(_ | _)
          val mb = g.filter(_._3 == "purchase").map(e => 1L << ((e._4 / 3600) % 24)).fold(0L)(_ | _)
          (ma, mb)
        }.toMap
      val expected = masks.values
        .groupBy { case (ma, mb) => java.lang.Long.bitCount(ma & mb).toLong }
        .view.mapValues(g => (g.size.toLong, g.count { case (ma, mb) => (ma & mb) != 0L }.toLong))
        .toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("randomized: quality-KS sup equals the per-pair brute force on 10 seeded corpora") {
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val srcs = (0 until 2 + rnd.nextInt(4)).map(i => s"s$i")
      // score ties across sources are the interesting case: draw from a
      // tiny (k, n) lattice so collisions are dense
      val docs = srcs.flatMap { src =>
        (0 until 1 + rnd.nextInt(30)).map { i =>
          val n = 1 + rnd.nextInt(5)
          val k = rnd.nextInt(n + 1)
          val text = (Seq.fill(k)("the") ++ Seq.fill(n - k)("x")).mkString(" ")
          (srcs.indexOf(src) * 1000L + i, src, text)
        }
      }
      val got = TextAnalysis.textQualityKsFrom(docs.toDF("doc_id", "source", "text"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Long]("ks_x"), r.getAs[Long]("ks_ppm")))).toMap
      val scores = docs.groupBy(_._2).view.mapValues(_.map { case (_, _, t) =>
        val w = t.split(" ")
        100000L * w.count(_ == "the") / w.length
      }).toMap
      val grid = scores.values.flatten.toSeq.distinct.sorted
      val expected = (for (Seq(a, b) <- srcs.sorted.combinations(2)) yield {
        val (na, nb) = (scores(a).size.toLong, scores(b).size.toLong)
        val ks = grid.map { x =>
          math.abs(scores(a).count(_ <= x) * nb - scores(b).count(_ <= x) * na)
        }.max
        (a, b) -> ((na, nb, ks, 1000000L * ks / (na * nb)))
      }).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("randomized: cluster-balanced selection equals the per-cell sort on 10 seeded corpora") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val dim = 4 + rnd.nextInt(5)
      val nCents = 2 + rnd.nextInt(15)
      val cents = Seq.fill(nCents)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      // cells below AND above the quota of 8: cluster sizes 1..40
      val vecs = (0 until 5 + rnd.nextInt(120)).map { i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
      }
      val got = graft.operators.Similarity
        .selectClusterBalancedFrom(vecs.toDF("vec_id", "v"), cents)
        .collect()
        .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("rank")) ->
          ((r.getAs[Long]("vec_id"), r.getAs[Long]("n_cell")))).toMap
      // brute force: same cosine fold, argmax with smaller-cid tie, md5
      // order, take 8
      def cos(a: Seq[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < b.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dot / math.sqrt(na * nb)
      }
      val assign = vecs.map { case (id, v) =>
        id -> (cents.zipWithIndex.map { case (c, ci) => (cos(v, c), -ci) }.max._2 * -1).toLong
      }
      val expected = assign.groupBy(_._2).flatMap { case (cid, members) =>
        val ordered = members.map(_._1).sortBy(id => (md5hex(id.toString), id))
        ordered.take(8).zipWithIndex.map { case (id, i) =>
          (cid, (i + 1).toLong) -> ((id, members.size.toLong))
        }
      }
      assert(got === expected, s"seed=$seed")
    }
  }

  test("randomized: window-funnel depth equals the greedy recompute under ts collisions") {
    import spark.implicits._
    val winSec = 14400L
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val types = Seq("view", "click", "purchase")
      // coarse hour lattice over ~5 window-widths: dense exact-collision
      // and exact-window-edge (tc == t1 + W) cases by construction
      val ev = (0 until 40 + rnd.nextInt(160)).map { i =>
        (i.toLong, 1L + rnd.nextInt(8),
          types(rnd.nextInt(3)), rnd.nextInt(20).toLong * 3600L)
      }
      val df = ev.toDF("event_id", "user_id", "event_type", "sec")
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_seconds(col("sec")).as("ts"))
      val got = Analytics.qWindowFunnelFrom(df).collect()
        .map(r => r.getAs[Long]("depth") -> r.getAs[Long]("n_users")).toMap
      val expected = ev.groupBy(_._2).flatMap { case (_, es) =>
        def of(t: String) = es.filter(_._3 == t).map(_._4).sorted
        val (views, clicks, purchases) = (of("view"), of("click"), of("purchase"))
        val perAnchor = views.distinct.map { t1 =>
          clicks.find(tc => tc > t1 && tc <= t1 + winSec) match {
            case None => 1L
            case Some(t2) =>
              if (purchases.exists(tp => tp > t2 && tp <= t1 + winSec)) 3L else 2L
          }
        }
        if (perAnchor.isEmpty) None else Some(perAnchor.max)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("randomized: gopher-rule flags are exact at every integer boundary") {
    import spark.implicits._
    // pool chosen to strike each boundary: 'the'/'a' (stop + short),
    // '###'/'...' (symbols, no letters), '1234' (no letters), long words
    // for the mean-length edges
    val pool = Seq("the", "a", "x", "abcd", "1234", "###", "...",
      "abcdefghij", "abcdefghijklmno")
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val docs = (0 until 30).map { i =>
        // straddle the 50-word bound tightly
        val n = 45 + rnd.nextInt(10)
        (i.toLong, Seq.fill(n)(pool(rnd.nextInt(pool.length))).mkString(" "))
      }
      val got = TextAnalysis.textGopherRulesFrom(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          Seq("n_words", "r_words", "r_avg_len", "r_stop", "r_alpha", "r_symbol", "pass")
            .map(c => r.getAs[Long](c))).toMap
      docs.foreach { case (id, t) =>
        val w = t.split(" ")
        val nw = w.length.toLong
        val sl = w.map(_.length.toLong).sum
        val rw = if (nw >= 50 && nw <= 100000) 1L else 0L
        val rl = if (3 * nw <= sl && sl <= 10 * nw) 1L else 0L
        val rs = if (w.count(x => x == "the" || x == "a") >= 2) 1L else 0L
        val ra = if (5L * w.count(_.exists(_.isLetter)) >= 4L * nw) 1L else 0L
        val sym = "#|\\.\\.\\.".r.findAllIn(t).size.toLong
        val ry = if (10L * sym <= nw) 1L else 0L
        val pass = rw & rl & rs & ra & ry
        assert(got(id) === Seq(nw, rw, rl, rs, ra, ry, pass), s"seed=$seed doc=$id")
      }
    }
  }

  test("randomized: hll intersection equals the register simulation on 5 seeded corpora") {
    import spark.implicits._
    val M = 64
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def estOf(m: Map[Long, Long]): Double = {
      val sumScaled = m.values.map(mj => 1L << (55 - mj).toInt).sum +
        (M - m.size).toLong * (1L << 55)
      val raw = 0.709 * M * M * math.pow(2.0, 55) / sumScaled.toDouble
      val v = M - m.size
      val est = if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v) else raw
      math.floor(est * 1e6 + 0.5) / 1e6
    }
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val types = (0 until 2 + rnd.nextInt(2)).map(i => s"t$i")
      val ev = types.flatMap { t =>
        (0 until 5 + rnd.nextInt(60)).map(_ => (1L + rnd.nextInt(200), t))
      }
      val got = Sketches.sketchHllIntersectionFrom(ev.toDF("user_id", "event_type"))
        .collect()
      // simulate the registers exactly: h = first 60 bits of md5(user)
      val regs = ev.distinct.groupBy(_._2).view.mapValues { g =>
        g.map(_._1).distinct.map { u =>
          val h = java.lang.Long.parseLong(md5hex(u.toString).take(15), 16)
          val idx = h % M
          val rest = h / M
          val rho = if (rest == 0) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
          (idx, rho)
        }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      }.toMap
      val exact = ev.distinct.groupBy(_._1).values.flatMap { g =>
        val ts = g.map(_._2).distinct.sorted
        for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.length === types.sorted.combinations(2).size)
      got.foreach { r =>
        val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        val merged = (regs(a).keySet ++ regs(b).keySet).map { i =>
          i -> math.max(regs(a).getOrElse(i, 0L), regs(b).getOrElse(i, 0L))
        }.toMap
        val expected = math.floor(
          (estOf(regs(a)) + estOf(regs(b)) - estOf(merged)) * 1e6 + 0.5) / 1e6
        assert(r.getAs[Double]("inter_est") === expected, s"seed=$seed pair=($a,$b)")
        assert(r.getAs[Long]("n_exact") === exact.getOrElse((a, b), 0L), s"seed=$seed")
      }
    }
  }
}
