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

  test("fingerprints are 3 concatenated md5s and stable across runs") {
    val a = TextAnalysis.textFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.textFingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    a.values.foreach(fp => assert(fp.length === 96 && fp.matches("[0-9a-f]+")))
  }
}
