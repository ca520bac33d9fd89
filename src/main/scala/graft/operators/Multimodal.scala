package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.6 multimodal plumbing: treat payloads as opaque binary columns with
  * typed metadata. The testdata has no true binary column, so the payload
  * is the UTF-8 encoding of `documents.text` — the plumbing (byte lengths,
  * content hashes, chunking, batched codec boundaries) is identical to
  * what image/audio bytes would need.
  *
  * The decode/resize/frame-sample step is stubbed behind [[MultimodalCodec]]
  * (the real image/audio libs are not in this container): the Spark side —
  * schema, `mapPartitions` batching, deterministic output — is real and
  * tested; only the codec body is fake.
  */
object Multimodal {

  // --- mm_binary_meta -----------------------------------------------------
  // Byte length, sha256, first-8-byte sample (hex), 64-byte chunk count —
  // all computed on the binary payload with codegen'd expressions.
  def mmBinaryMeta(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d).select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      sha2(col("text"), 256).as("sha256_hex"),
      upper(hex(expr("encode(substring(text, 1, 8), 'UTF-8')"))).as("head_hex"),
      ceil(octet_length(col("text")) / 64.0).cast("long").as("n_chunks"))
      .orderBy("doc_id")

  val mmBinaryMetaSql: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | sha256(text) AS sha256_hex,
      | upper(hex(encode(substr(text, 1, 8)))) AS head_hex,
      | CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- mm_dedup -----------------------------------------------------------
  // Exact dedup of opaque binary payloads by content hash — the multimodal
  // twin of dedup_exact (images/audio dedup by bytes, not by text
  // normalization). Same scale shape: one hash-groupBy with map-side
  // combine; the payloads themselves never shuffle, only (hash, id) pairs.
  def mmDedup(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(sha2(expr("encode(text, 'UTF-8')"), 256).as("h"), col("doc_id"))
      .groupBy("h")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("h")

  val mmDedupSql: String =
    """SELECT sha256(text) AS h, min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Decoded-frame record produced by the codec stub. */
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int, checksum: Long)

  /** Codec boundary for opaque media payloads. A real deployment plugs in
    * an image/audio decoder here; the engine only relies on the contract
    * (bytes in → frames out, pure per record).
    */
  trait MultimodalCodec extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): Iterator[Frame]
  }

  /** Deterministic fake codec: "frames" are 64-byte chunks; width/height
    * derive from payload length, checksum is a rolling byte sum. Stands in
    * for a real decoder with the same shape and determinism guarantees.
    */
  object FakeCodec extends MultimodalCodec {
    def decode(docId: Long, payload: Array[Byte]): Iterator[Frame] =
      payload.grouped(64).zipWithIndex.map { case (chunk, i) =>
        Frame(docId, i, chunk.length, payload.length % 1024,
          chunk.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff)))
      }

    /** Reference implementation of the per-frame checksum, for specs. */
    def checksumOf(chunk: Array[Byte]): Long =
      chunk.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
  }

  /** The codec decode as a verification entry — the one deliberately
    * non-SQL-expressible operator (the driver records a rows-only check for
    * it; everything SQL-expressible has a full DuckDB oracle). Deterministic
    * output: the fake codec's frames are pure functions of the payload, and
    * `MultimodalSpec` independently recomputes the checksums.
    */
  def mmFrames(spark: SparkSession, d: String): DataFrame =
    decodeFrames(spark, d).toDF().orderBy("doc_id", "frame_idx")

  /** Run a codec over the documents' binary payloads with per-partition
    * batching (`mapPartitions`, the Scala analogue of an arrow-batched UDF):
    * the codec is instantiated once per partition, rows stream through it.
    */
  def decodeFrames(spark: SparkSession, d: String, codec: MultimodalCodec = FakeCodec): Dataset[Frame] = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => codec.decode(id, bytes) })
  }
}
