package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("token counts are consistent (distinct ≤ whitespace ≤ regex tokens)") {
    TextAnalysis.textTokens(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("ws_tokens"))
      // letters-only corpus: regex tokens == whitespace tokens here
      assert(r.getAs[Long]("re_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("quality score is bounded in [0, 1]") {
    TextAnalysis.textQuality(spark, sf).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Double]("stop_ratio") >= 0.0 && r.getAs[Double]("stop_ratio") <= 1.0)
    }
  }

  test("langid predicts one of the five languages for every doc") {
    val langs = Set("de", "en", "es", "fr", "zh")
    val rows = TextAnalysis.textLangid(spark, sf).collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred_lang"))))
  }

  test("boilerplate ratio matches a local df recomputation") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = docs.length
    val shingles = docs.map { case (id, w) =>
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val df = shingles.flatMap(_._2).groupBy(identity).map { case (s, xs) => s -> xs.length }
    val got = TextAnalysis.textBoilerplate(spark, sf).collect()
    assert(got.length === shingles.length)
    val byId = shingles.toMap
    got.foreach { r =>
      val sh = byId(r.getAs[Long]("doc_id"))
      val boiler = sh.count(s => df(s) > 2 && df(s) * 100 > n)
      assert(r.getAs[Long]("n_shingles") === sh.size.toLong)
      assert(r.getAs[Long]("n_boiler") === boiler.toLong)
      assert(r.getAs[Double]("boiler_ratio") === boiler.toDouble / sh.size)
    }
  }

  test("doc_split is a pure function of doc_id with roughly 80/10/10 mass") {
    val rows = TextAnalysis.docSplit(spark, sf).collect()
    val n = rows.length.toDouble
    rows.foreach { r =>
      // recompute the bucket locally: first two hex chars of md5(doc_id)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(r.getAs[Long]("doc_id").toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.take(2), 16)
      assert(r.getAs[Long]("bucket") === bucket)
      val expected = if (bucket < 204) "train" else if (bucket < 230) "val" else "test"
      assert(r.getAs[String]("split") === expected)
    }
    val frac = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
  }

  test("fingerprints are 3 concatenated md5s and stable across runs") {
    val a = TextAnalysis.textFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.textFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    a.values.foreach(fp => assert(fp.length === 96 && fp.matches("[0-9a-f]+")))
  }
}
