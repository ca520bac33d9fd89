package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binary metadata: chunk counts follow byte lengths") {
    Multimodal.mmBinaryMeta(spark, sf).collect().foreach { r =>
      val bytes = r.getAs[Long]("n_bytes")
      assert(r.getAs[Long]("n_chunks") === (bytes + 63) / 64)
      assert(r.getAs[String]("sha256_hex").length === 64)
    }
  }

  test("codec plumbing: frames per doc == chunk count, checksums match the reference impl") {
    val frames = Multimodal.decodeFrames(spark, sf)
    val perDoc = frames.groupBy("doc_id").count()
    val meta = Multimodal.mmBinaryMeta(spark, sf).select("doc_id", "n_chunks")
    val joined = perDoc.join(meta, "doc_id")
      .filter(col("count") =!= col("n_chunks"))
    assert(joined.count() === 0)

    // spot-check the deterministic fake codec against a locally computed doc
    val doc = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(1).collect().head
    val payload = doc.getString(1).getBytes(StandardCharsets.UTF_8)
    val expected = payload.grouped(64).map(Multimodal.FakeCodec.checksumOf).toSeq
    val actual = frames.filter(col("doc_id") === doc.getLong(0))
      .orderBy("frame_idx").collect().map(_.checksum).toSeq
    assert(actual === expected)
  }
}
