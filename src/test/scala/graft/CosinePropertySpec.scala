package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based check of the native CosineSim against an independent
  * plain-Scala reference implementation, over randomized vectors —
  * including awkward magnitudes and signs. Bitwise equality, no epsilon.
  * (Uses ScalaCheck generators directly; sampling is deterministic enough
  * for coverage and keeps one Spark job per property.)
  */
class CosinePropertySpec extends SparkSpec {

  private def referenceCos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
    }
    dot / math.sqrt(na * nb)
  }

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3).map(x => (x * 1e6).round / 1e6))
      .suchThat(_.exists(_ != 0.0))

  test("cosine_sim equals the reference implementation bitwise on random vectors") {
    import spark.implicits._
    val cases = (1 to 50).flatMap { _ =>
      for (a <- vecGen.sample; b <- vecGen.sample) yield (a, b)
    }
    assert(cases.size >= 40)
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"), expr("cosine_sim(a, b)").as("c"))
    df.collect().foreach { r =>
      val expected = referenceCos(r.getSeq[Double](0), r.getSeq[Double](1))
      val actual = r.getDouble(2)
      assert(java.lang.Double.doubleToLongBits(actual) ===
        java.lang.Double.doubleToLongBits(expected),
        s"a=${r.getSeq[Double](0)} b=${r.getSeq[Double](1)}")
    }
  }

  test("cosine_sim is symmetric and bounded") {
    import spark.implicits._
    val cases = (1 to 30).flatMap { _ =>
      for (a <- vecGen.sample; b <- vecGen.sample) yield (a, b)
    }
    val df = cases.toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("ab"), expr("cosine_sim(b, a)").as("ba"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) >= -1.0 - 1e-12 && r.getDouble(0) <= 1.0 + 1e-12)
    }
  }
}
