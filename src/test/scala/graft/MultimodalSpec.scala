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

  test("chunk dedup matches a local recomputation over raw payload chunks") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes(StandardCharsets.UTF_8))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    val chunks = docs.flatMap { case (id, payload) =>
      payload.grouped(64).zipWithIndex.map { case (c, i) =>
        (hex(md.digest(c)), id, i.toLong)
      }
    }
    val expected = chunks.groupBy(_._1)
      .filter { case (_, rs) => rs.map(_._2).distinct.length > 1 }
      .map { case (h, rs) =>
        val loc = rs.map { case (_, id, i) => (id, i) }.min
        h -> (rs.length.toLong, rs.map(_._2).distinct.length.toLong, loc._1, loc._2)
      }
    val got = Multimodal.mmChunkDedup(spark, sf).collect()
    assert(got.length === expected.size)
    assert(got.nonEmpty, "synthetic corpus should contain cross-doc duplicate chunks")
    got.foreach { r =>
      val (copies, ndocs, cdoc, cidx) = expected(r.getAs[String]("h"))
      assert(r.getAs[Long]("n_copies") === copies)
      assert(r.getAs[Long]("n_docs") === ndocs)
      assert(r.getAs[Long]("canonical_doc") === cdoc)
      assert(r.getAs[Long]("canonical_idx") === cidx)
    }
  }

  test("chunk dedup: empty payloads produce zero chunks (no sha256-of-empty pairs)") {
    // sequence(0, ceil(0/64)-1) = sequence(0, -1) is DESCENDING in Spark:
    // without the empty-payload guard, two empty docs would pair up on the
    // sha256 of the empty chunk — a row the DuckDB oracle (range(0,0) = no
    // rows) never emits.
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, ""), (3L, "shared-chunk"), (4L, "shared-chunk"))
      .toDF("doc_id", "text")
    val got = Multimodal.mmChunkDedupFrom(docs).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_docs") === 2)
    assert(got.head.getAs[Long]("canonical_doc") === 3L)
  }

  test("phash signatures match an in-process recompute and bucket stats are consistent") {
    def phashOf(text: String): Long = {
      val hexs = text.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
      val digits = hexs.map(c => "0123456789abcdef".indexOf(c).toLong)
      val L = digits.length.toLong
      val blocks = (0 until 8).map { i =>
        digits.slice((i * L / 8).toInt, ((i + 1) * L / 8).toInt).sum
      }
      val total = blocks.sum
      (0 until 8).map(i => if (blocks(i) * 8 > total) 1L << i else 0L).sum
    }
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = Multimodal.mmPhash(spark, sf).collect()
    assert(rows.length === texts.size)
    val byHash = rows.groupBy(_.getAs[Long]("phash"))
    rows.foreach { r =>
      assert(r.getAs[Long]("phash") === phashOf(texts(r.getAs[Long]("doc_id"))))
      val bucket = byHash(r.getAs[Long]("phash"))
      assert(r.getAs[Long]("n_same") === bucket.length.toLong)
      assert(r.getAs[Long]("canonical_id") === bucket.map(_.getAs[Long]("doc_id")).min)
    }
  }

  test("phash_near detects a re-encoded payload and ignores unrelated ones") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps going with " +
      "plenty of additional padding words so every block carries real mass"
    val corrupted = base.replace("lazy", "hazy") // byte-level near-copy
    val unrelated = "completely different content made of other words entirely " +
      "question mark exclamation various unrelated tokens for contrast here"
    val docs = Seq((1L, base), (2L, corrupted), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Multimodal.mmPhashNearFrom(docs).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Long]("hamming")))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(pairs.head._3 <= 3L)
    // corpus instantiation: shingle-level dups are NOT byte-level dups and
    // sf0.001 has no exact byte copies — the screen correctly stays silent
    // here (at sf0.1 it surfaces the corpus's exact copies at hamming 0)
    assert(Multimodal.mmPhashNear(spark, sf).count() === 0L)
    // short payloads carry no stable block structure and are excluded
    val short = Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "text")
    assert(Multimodal.mmPhashNearFrom(short).count() === 0L)
  }

  test("mm_shard_manifest: shards partition the corpus and dedup never grows bytes") {
    val rows = Multimodal.mmShardManifest(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_blobs")).sum === docs.count())
    val globalUnique = docs
      .select(org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.expr("encode(text, 'UTF-8')"), 256))
      .distinct().count()
    // content addressing makes dedup shard-local: per-shard uniques sum to
    // the GLOBAL unique count (no hash spans two shards)
    assert(rows.map(_.getAs[Long]("n_unique")).sum === globalUnique)
    rows.foreach { r =>
      assert(r.getAs[Long]("bytes_dedup") <= r.getAs[Long]("bytes_raw"))
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_blobs"))
      assert(r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 16)
    }
  }

  test("mm_components: every near-dup pair shares a canonical, untouched payloads label themselves") {
    val canon = Multimodal.mmComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(canon.size.toLong === graft.sources.Tables.documents(spark, sf).count())
    // canonical is a component MINIMUM: never above the member's own id
    canon.foreach { case (doc, c) => assert(c <= doc) }
    val pairs = Multimodal.mmPhashNear(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    pairs.foreach { case (a, b) => assert(canon(a) === canon(b)) }
    // docs in NO pair are their own canonical
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    canon.foreach { case (doc, c) => if (!touched(doc)) assert(c === doc) }
  }
}
