package graft

import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkSpec {

  test("native cosine_sim is bit-identical to the fold-based formula") {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val q = e.limit(3).select(col("vec_id").as("qid"), col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        expr("cosine_sim(qv, v)").as("native"),
        expr("""aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x) /
               |sqrt(aggregate(transform(qv, x -> x * x), 0D, (acc, x) -> acc + x) *
               |     aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x))""".stripMargin).as("folded"))
    // bitwise equality, not tolerance: both accumulate left-to-right
    val diff = both.filter(col("native") =!= col("folded")).count()
    assert(diff === 0)
    assert(both.count() > 0)
  }

  test("cosine_sim returns null on length mismatch or null elements, like the fold formula") {
    val mismatch = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d)) AS c").head
    assert(mismatch.isNullAt(0))
    val nullElem = spark.sql(
      "SELECT cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS c").head
    assert(nullElem.isNullAt(0))
  }

  test("cosine_sim is registered as a SQL function via extensions") {
    val r = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
    val ortho = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head.getDouble(0)
    assert(math.abs(ortho) < 1e-15)
  }
}
