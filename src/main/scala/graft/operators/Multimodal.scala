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

  // --- mm_chunk_dedup -----------------------------------------------------
  // CHUNK-level content dedup: hash every fixed-size chunk of every payload
  // and report chunks shared across documents — the fixed-block variant of
  // content-defined-chunking dedup (what storage/backup systems and
  // multimodal-corpus pipelines use to find embedded shared content:
  // common headers, repeated segments, boilerplate bytes). Output: one row
  // per chunk content that appears in MORE than one document, with its
  // total copy count, distinct-doc count, and canonical (min) location.
  // Scale: explode is linear in payload bytes; the groupBy on chunk hash is
  // map-side combinable; only (hash, doc, idx) tuples shuffle — never the
  // payload bytes themselves.
  def mmChunkDedup(spark: SparkSession, d: String): DataFrame =
    mmChunkDedupFrom(Tables.documents(spark, d))

  /** DataFrame-in variant: `docs` needs (doc_id, text). */
  def mmChunkDedupFrom(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr("encode(text, 'UTF-8')").as("payload"))
      // Empty payloads produce ZERO chunks. Without this filter the chunk
      // count `ceil(0/64)-1 = -1` makes `sequence(0, -1)` emit a DESCENDING
      // [0, -1] (Spark sequence steps toward the stop value) — two spurious
      // sha256-of-empty chunks per empty doc, where the oracle's
      // `range(0, 0)` correctly emits none.
      .filter(expr("octet_length(payload) > 0"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, CAST(ceil(octet_length(payload)/64.0) AS INT) - 1)," +
            " i -> substring(payload, i*64 + 1, 64))")).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        sha2(col("chunk"), 256).as("h"))
      // canonical location = lexicographic min of (doc_id, chunk_idx),
      // packed into one integer (chunk_idx < 2^20 for any sane payload) so
      // the aggregate is a plain MIN in both engines
      .groupBy("h")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id") * lit(1048576L) + col("chunk_idx")).as("loc"))
      .filter(col("n_docs") > 1)
      .select(col("h"), col("n_copies"), col("n_docs"),
        (col("loc") / lit(1048576L)).cast("long").as("canonical_doc"),
        (col("loc") % lit(1048576L)).as("canonical_idx"))
      .orderBy("h")

  val mmChunkDedupSql: String =
    """WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |f AS (SELECT doc_id, n, text,
      |        CAST(unnest(range(0, CAST(ceil(n/64.0) AS BIGINT))) AS BIGINT) AS chunk_idx
      |      FROM p),
      |c AS (SELECT doc_id, chunk_idx, sha256(substr(text, CAST(chunk_idx*64 + 1 AS INT), 64)) AS h FROM f),
      |g AS (SELECT h, count(*) AS n_copies, count(DISTINCT doc_id) AS n_docs,
      |        min(doc_id*1048576 + chunk_idx) AS loc
      |      FROM c GROUP BY h HAVING count(DISTINCT doc_id) > 1)
      |SELECT h, n_copies, n_docs, loc//1048576 AS canonical_doc, loc%1048576 AS canonical_idx
      |FROM g ORDER BY h""".stripMargin

  // --- mm_phash -----------------------------------------------------------
  // Perceptual-hash-shaped near-dup blocking for opaque payloads: an 8-bit
  // block signature — payload split into 8 byte-ranges, each block's mass
  // (sum of hex-digit values, a pure function of the bytes) compared to
  // the payload mean via the cross-multiplied 8·block > total test (no
  // division), bit set where the block is above average. Payloads that
  // differ by small local edits keep most block means and land in the
  // same bucket — the aHash construction real image pipelines use on
  // pixel grids, applied at the byte layer the fake codec exposes.
  // Requires ≥ 4 payload bytes so all 8 hex-digit blocks are non-empty
  // (shorter payloads are dropped; the corpus minimum is 48 bytes).
  // Scale shape: signature extraction is a PURE MAP over the scan via the
  // native `phash_blocks` kernel — the composable `aggregate(sequence(…))`
  // formulation materializes an O(bytes) position array per block per row
  // (measured 5.8s vs the kernel's sub-second at sf0.1) and survives as
  // the oracle + NativeKernelSpec's equality check. The groupBy is over
  // ≤ 256 signature keys, map-side combinable; the bucket table joins
  // back AQE-planned (256 rows — broadcast from observed size). Payload
  // bytes never shuffle.
  def mmPhash(spark: SparkSession, d: String): DataFrame = {
    val phash = (1 until 8).foldLeft(
      when(element_at(col("bs"), 1) * 8 > col("total"), 1L).otherwise(0L)) { (acc, i) =>
      acc + when(element_at(col("bs"), i + 1) * 8 > col("total"), lit(1L << i)).otherwise(lit(0L))
    }
    val sig = Tables.documents(spark, d)
      .select(col("doc_id"), expr("phash_blocks(text)").as("bs"))
      .filter(col("bs").isNotNull)
      .withColumn("total", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
      .select(col("doc_id"), phash.as("phash"))
    val buckets = sig.groupBy("phash")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_same"))
    sig.join(buckets, Seq("phash"))
      .select("doc_id", "phash", "canonical_id", "n_same")
      .orderBy("doc_id")
  }

  val mmPhashSql: String = {
    val blocks = (0 until 8).map { i =>
      s"""  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range((($i * hl) // 8) + 1, ((${i + 1} * hl) // 8) + 1),
         |      p -> CAST(strpos('0123456789abcdef', substring(hexs, CAST(p AS INT), 1)) - 1 AS BIGINT))),
         |    (a, x) -> a + x) AS b$i""".stripMargin
    }.mkString(",\n")
    val totalExpr = (0 until 8).map(i => s"b$i").mkString(" + ")
    val phashExpr = (0 until 8).map(i =>
      s"(CASE WHEN b$i * 8 > total THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH hx AS (SELECT doc_id, lower(hex(encode(text))) AS hexs FROM documents),
       |hx2 AS (SELECT doc_id, hexs, CAST(length(hexs) AS BIGINT) AS hl
       |        FROM hx WHERE length(hexs) >= 8),
       |b AS (SELECT doc_id,
       |$blocks
       | FROM hx2),
       |t AS (SELECT doc_id, b0, b1, b2, b3, b4, b5, b6, b7,
       |        $totalExpr AS total FROM b),
       |sig AS (SELECT doc_id, CAST($phashExpr AS BIGINT) AS phash FROM t),
       |g AS (SELECT phash, min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS n_same
       |      FROM sig GROUP BY 1)
       |SELECT doc_id, sig.phash, canonical_id, n_same
       |FROM sig JOIN g ON sig.phash = g.phash ORDER BY doc_id""".stripMargin
  }

  // --- mm_phash_near ------------------------------------------------------
  // NEAR-duplicate media detection: re-encoded / slightly-corrupted copies
  // of the same payload share most of their content mass, so their 64-bit
  // perceptual hashes differ in only a few bits. Fingerprint: 64 block
  // masses from the native phash_blocks64 kernel (computed in the scan's
  // project list — no explode), each bit = block mass above the payload
  // mean, packed into 4 × 16-bit chunk ints. Candidate generation is the
  // dedup_simhash blocking scheme: hamming ≤ 3 over 64 bits forces at
  // least one of the 4 chunks to be bit-identical (pigeonhole), so an
  // equi-join per chunk finds every qualifying pair while only hashing
  // |docs|·4 rows; a per-bucket cap drops degenerate buckets (a constant
  // payload pattern hashing half the corpus into one chunk value) exactly
  // as the LSH family does. Verification is bit_count(xor) on the chunk
  // ints. Payloads under 32 bytes carry no stable block structure and are
  // excluded by both engines (kernel returns null / SQL length filter).
  //
  // Corpus contract: the testdata's NEAR-duplicates are SHINGLE-level
  // (shared word n-grams), not byte-level — re-shuffled text moves every
  // block boundary, so those pairs sit ≥11 bits apart and are correctly
  // NOT reported; the corpus's exact byte copies (present from sf0.1 up)
  // surface at hamming 0. The oracle pins both behaviors. Detection of
  // genuinely re-encoded payloads (identical bytes ± a few flips) is
  // proven via `mmPhashNearFrom` in MultimodalSpec on a synthetic
  // corrupted copy — the ds_flatline pattern for failure modes the small
  // SFs don't contain.
  private val PhashHammingMax = 3L
  private val PhashBucketCap = 100L

  def mmPhashNear(spark: SparkSession, d: String): DataFrame =
    mmPhashNearFrom(Tables.documents(spark, d))

  def mmPhashNearFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = docs
      .select(col("doc_id"), expr("phash_blocks64(text)").as("bs"))
      .filter(col("bs").isNotNull)
      .withColumn("total", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
    val packed = sig.select(col("doc_id") +: (0 until 4).map { j =>
      (0 until 16).map(b =>
        when(element_at(col("bs"), 16 * j + b + 1) * 64 > col("total"),
          lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as(s"k$j")
    }: _*)
    val chunks = packed.select(col("doc_id"),
      explode(expr("transform(sequence(0, 3), c -> struct(c as c, element_at(array(k0, k1, k2, k3), c + 1) as ck))")).as("x"),
      col("k0"), col("k1"), col("k2"), col("k3"))
      .select(col("doc_id"), col("x.c").as("c"), col("x.ck").as("ck"),
        col("k0"), col("k1"), col("k2"), col("k3"))
    val sized = chunks
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("c", "ck")))
      .filter(col("bsz") <= PhashBucketCap)
    val a = sized.select(col("c") :: col("ck") :: col("doc_id").as("da") ::
      (0 until 4).map(j => col(s"k$j").as(s"a$j")).toList: _*)
    val b = sized.select(col("c") :: col("ck") :: col("doc_id").as("db") ::
      (0 until 4).map(j => col(s"k$j").as(s"b$j")).toList: _*)
    a.join(b, Seq("c", "ck")).filter(col("da") < col("db"))
      .select(col("da") :: col("db") ::
        (0 until 4).flatMap(j => Seq(col(s"a$j"), col(s"b$j"))).toList: _*).distinct()
      .withColumn("hamming",
        expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + bit_count(a2 ^ b2) + bit_count(a3 ^ b3)").cast("long"))
      .filter(col("hamming") <= PhashHammingMax)
      .select("da", "db", "hamming")
      .orderBy("da", "db")
  }

  val mmPhashNearSql: String = {
    val blocks = (0 until 64).map { i =>
      s"""  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range((($i * hl) // 64) + 1, ((${i + 1} * hl) // 64) + 1),
         |      p -> CAST(strpos('0123456789abcdef', substring(hexs, CAST(p AS INT), 1)) - 1 AS BIGINT))),
         |    (a, x) -> a + x) AS b$i""".stripMargin
    }.mkString(",\n")
    val totalExpr = (0 until 64).map(i => s"b$i").mkString(" + ")
    val fpExpr = (0 until 64).map(i =>
      s"(CASE WHEN b$i * 64 > total THEN '1' ELSE '0' END)").mkString(" || ")
    s"""WITH hx AS (SELECT doc_id, lower(hex(encode(text))) AS hexs FROM documents),
       |hx2 AS (SELECT doc_id, hexs, CAST(length(hexs) AS BIGINT) AS hl
       |        FROM hx WHERE length(hexs) >= 64),
       |b AS (SELECT doc_id,
       |$blocks
       | FROM hx2),
       |t AS (SELECT *, $totalExpr AS total FROM b),
       |fp AS (SELECT doc_id, $fpExpr AS fp FROM t),
       |ch AS (SELECT doc_id, fp, c, substr(fp, CAST(c*16 + 1 AS INT), 16) AS ck
       |       FROM fp, range(0, 4) r(c)),
       |ok AS (SELECT c, ck FROM ch GROUP BY 1, 2 HAVING count(*) <= $PhashBucketCap),
       |bb AS (SELECT ch.* FROM ch JOIN ok USING (c, ck)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db, a.fp AS fa, b2.fp AS fb
       |         FROM bb a JOIN bb b2 ON a.c = b2.c AND a.ck = b2.ck AND a.doc_id < b2.doc_id)
       |SELECT da, db,
       | CAST(len(list_filter(range(1, 65), i -> substr(fa, CAST(i AS INT), 1) <> substr(fb, CAST(i AS INT), 1))) AS BIGINT) AS hamming
       |FROM cand
       |WHERE CAST(len(list_filter(range(1, 65), i -> substr(fa, CAST(i AS INT), 1) <> substr(fb, CAST(i AS INT), 1))) AS BIGINT) <= $PhashHammingMax
       |ORDER BY da, db""".stripMargin
  }

  // --- mm_components ------------------------------------------------------
  // Canonical-media assignment: connected components over the perceptual
  // near-dup pairs — the clustering step that turns mm_phash_near's PAIR
  // report into the keep/drop decision an image dedup pipeline actually
  // applies (a re-encode chain a↔b↔c is ONE asset even when a and c sit
  // beyond the pairwise hamming cut). Runs the SAME min-label propagation
  // engine as dedup_components (Graph.connectedComponentsFrom — per round
  // one density-bounded node-keyed shuffle); the corpus appears once, in
  // the final left join that assigns untouched payloads to themselves.
  def mmComponents(spark: SparkSession, d: String): DataFrame = {
    val pairs = mmPhashNear(spark, d).select("da", "db")
    Tables.documents(spark, d).select(col("doc_id"))
      .join(Graph.connectedComponentsFrom(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))
      .orderBy("doc_id")
  }

  val mmComponentsSql: String = {
    val tail =
      s"""SELECT da, db,
         | CAST(len(list_filter(range(1, 65), i -> substr(fa, CAST(i AS INT), 1) <> substr(fb, CAST(i AS INT), 1))) AS BIGINT) AS hamming
         |FROM cand
         |WHERE CAST(len(list_filter(range(1, 65), i -> substr(fa, CAST(i AS INT), 1) <> substr(fb, CAST(i AS INT), 1))) AS BIGINT) <= $PhashHammingMax
         |ORDER BY da, db""".stripMargin
    val replaced = mmPhashNearSql.replace(tail,
      s""",
         |np AS (SELECT da, db FROM cand
         |  WHERE CAST(len(list_filter(range(1, 65), i -> substr(fa, CAST(i AS INT), 1) <> substr(fb, CAST(i AS INT), 1))) AS BIGINT) <= $PhashHammingMax),
         |e AS (SELECT da AS a, db AS b FROM np UNION SELECT db, da FROM np),
         |reach(a, b) AS (SELECT a, b FROM e UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         |cn AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY 1)
         |SELECT d.doc_id, least(coalesce(c.mn, d.doc_id), d.doc_id) AS canonical_id
         |FROM documents d LEFT JOIN cn c USING (doc_id)
         |ORDER BY doc_id""".stripMargin)
    require(replaced != mmPhashNearSql,
      "mm_components oracle: tail replacement did not match mmPhashNearSql")
    replaced.replaceFirst("^WITH ", "WITH RECURSIVE ")
  }

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

  /** The codec decode as a verification entry. The operator itself is the
    * designated non-SQL `mapPartitions` op (a real codec cannot run in SQL),
    * but the FAKE codec's output is fully SQL-expressible, so it still gets
    * a DuckDB oracle ([[mmFramesSql]]): frames are 64-byte chunks and the
    * rolling `acc*31 + byte` checksum is a `list_reduce` fold with explicit
    * mod-2^64 wraparound (HUGEINT accumulator) to mirror JVM Long overflow.
    * `MultimodalSpec` additionally recomputes the checksums in-process.
    */
  def mmFrames(spark: SparkSession, d: String): DataFrame =
    decodeFrames(spark, d).toDF().orderBy("doc_id", "frame_idx")

  /** Oracle for [[mmFrames]] over the fake codec. Uses character ops as byte
    * ops, which is exact here: the synthetic corpus is pure ASCII (verified:
    * octet_length(encode(text)) = length(text) for every row at every SF);
    * the Spark side operates on real UTF-8 bytes either way.
    */
  val mmFramesSql: String =
    """WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
      |f AS (SELECT doc_id, n, text,
      |        CAST(unnest(range(0, CAST(ceil(n/64.0) AS BIGINT))) AS INT) AS frame_idx
      |      FROM p),
      |g AS (SELECT doc_id, n, frame_idx, substr(text, frame_idx*64 + 1, 64) AS chunk FROM f),
      |c AS (SELECT doc_id, frame_idx,
      |        CAST(length(chunk) AS INT) AS width,
      |        CAST(n % 1024 AS INT) AS height,
      |        list_reduce(
      |          list_prepend(0::HUGEINT, list_transform(range(1, length(chunk)+1), k -> ord(substr(chunk, CAST(k AS INT), 1))::HUGEINT)),
      |          (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS cs
      |      FROM g)
      |SELECT doc_id, frame_idx, width, height,
      |  CAST(CASE WHEN cs >= 9223372036854775808::HUGEINT THEN cs - 18446744073709551616::HUGEINT ELSE cs END AS BIGINT) AS checksum
      |FROM c ORDER BY doc_id, frame_idx""".stripMargin

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

  // --- mm_cdc_chunks --------------------------------------------------------
  // Content-DEFINED chunk dedup (the LBFS/gear-CDC boundary rule every
  // storage dedup system uses — Muthitacharoen et al. SOSP 2001):
  // mm_chunk_dedup's fixed 64-byte grid loses every shared chunk after one
  // inserted byte shifts the grid, while content-defined boundaries (cut
  // where the trailing-8-char window hash ≡ 0 mod 32) re-align immediately
  // — the shift-resistance that makes chunk-level dedup work on mutated
  // payloads. Per source: docs, chars, chunks, distinct chunks, duplicated
  // -chunk ppm and average chunk length — the capacity table that prices a
  // CDC store for the corpus. NULL payloads are addressed as zero-byte
  // blobs (mm_shard_manifest's rule): one md5("") chunk.
  // Exactness: boundaries and chunk digests are md5-hex string facts — no
  // floats anywhere; ppm/avg are integer divisions. Scale shape: the
  // per-position window hashing runs in the native `cdc_chunk_hashes`
  // kernel IN THE SCAN's project list (one buffer pass per doc — the
  // composable per-character explode is the ORACLE's price, not ours);
  // the only corpus-sized exchange is the distinct on chunk hashes —
  // corpus bytes ÷ 32 narrow rows, the irreducible chunk-index shuffle —
  // and the report is |sources| rows.
  def mmCdcChunks(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("source"), col("doc_id"),
        coalesce(col("text"), lit("")).as("t"))
    val perSrcDocs = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("t")).cast("long")).as("n_chars"))
    val perSrcChunks = docs
      .select(col("source"), explode(expr("cdc_chunk_hashes(t)")).as("ch"))
      .groupBy("source").agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("ch")).as("n_distinct"))
    perSrcDocs.join(perSrcChunks, Seq("source"))
      .withColumn("dup_ppm", expr("(n_chunks - n_distinct) * 1000000 div n_chunks"))
      .withColumn("avg_chunk_len", expr("n_chars div n_chunks"))
      .orderBy("source")
  }

  val mmCdcChunksSql: String =
    """WITH dn AS (SELECT doc_id, source, coalesce(text, '') AS t,
      |  length(coalesce(text, '')) AS n FROM documents),
      |cuts AS (SELECT doc_id, p
      | FROM dn, UNNEST(generate_series(8, n - 1)) AS u(p)
      | WHERE CAST('0x' || substr(md5(substr(t, CAST(p AS INT) - 7, 8)), 1, 4) AS INTEGER) % 32 = 0),
      |starts AS (SELECT doc_id, 1 AS s FROM dn
      |           UNION ALL SELECT doc_id, CAST(p + 1 AS INT) FROM cuts),
      |bounds AS (SELECT doc_id, s,
      |  lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt FROM starts),
      |chunks AS (SELECT dn.source,
      |  md5(substr(dn.t, b.s, coalesce(b.nxt, dn.n + 1) - b.s)) AS ch
      | FROM bounds b JOIN dn ON dn.doc_id = b.doc_id),
      |cs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(count(DISTINCT ch) AS BIGINT) AS n_distinct FROM chunks GROUP BY 1),
      |ds AS (SELECT source, count(*) AS n_docs,
      |  CAST(sum(length(t)) AS BIGINT) AS n_chars FROM dn GROUP BY 1)
      |SELECT ds.source, n_docs, n_chars, n_chunks, n_distinct,
      | (n_chunks - n_distinct) * 1000000 // n_chunks AS dup_ppm,
      | n_chars // n_chunks AS avg_chunk_len
      |FROM ds JOIN cs USING (source) ORDER BY source""".stripMargin

  // --- mm_shard_manifest ---------------------------------------------------
  // Content-addressed shard placement — the blob-store layout decision for
  // a multimodal corpus: shard = first byte of the payload's sha256 mod 16,
  // so EVERY copy of identical content lands in the same shard and dedup
  // becomes shard-LOCAL (a 1000-executor dedup never exchanges blobs across
  // shards — the property content addressing buys that round-robin
  // placement cannot). The manifest is the capacity-planning table: per
  // shard, blob count, raw bytes, unique-content count, and bytes after
  // dedup. One (shard, hash)-distinct is the linear term (hashes, never
  // payloads, shuffle); the final groupBys land on 16 keys.
  // NULL-payload rule (ADVICE r9): a NULL text would hash to a NULL shard
  // and silently vanish from the equi-join/groupBy in BOTH engines,
  // undercounting the manifest. A manifest must PARTITION the corpus, so
  // NULL payloads are addressed as zero-byte blobs (hash of the empty
  // string, 0 bytes) — the same cell a genuinely empty document lands in,
  // which is exactly what a blob store would hold for either.
  def mmShardManifest(spark: SparkSession, d: String): DataFrame = {
    val b = Tables.documents(spark, d).select(
      sha2(expr("encode(coalesce(text, ''), 'UTF-8')"), 256).as("h"),
      coalesce(octet_length(col("text")), lit(0)).cast("long").as("bytes"))
      .withColumn("shard", conv(substring(col("h"), 1, 2), 16, 10).cast("long") % 16)
    val uniq = b.select("shard", "h", "bytes").distinct()
      .groupBy("shard")
      .agg(count(lit(1)).as("n_unique"), sum(col("bytes")).as("bytes_dedup"))
    b.groupBy("shard")
      .agg(count(lit(1)).as("n_blobs"), sum(col("bytes")).as("bytes_raw"))
      .join(uniq, Seq("shard"))
      .orderBy("shard")
  }

  val mmShardManifestSql: String =
    """WITH b AS (SELECT sha256(coalesce(text, '')) AS h,
      |  CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS bytes FROM documents),
      |s AS (SELECT CAST(CAST('0x' || substr(h, 1, 2) AS INTEGER) % 16 AS BIGINT) AS shard,
      |  h, bytes FROM b),
      |u AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_unique,
      |  CAST(sum(bytes) AS BIGINT) AS bytes_dedup
      | FROM (SELECT DISTINCT shard, h, bytes FROM s) GROUP BY 1)
      |SELECT s.shard, CAST(count(*) AS BIGINT) AS n_blobs,
      | CAST(sum(s.bytes) AS BIGINT) AS bytes_raw, u.n_unique, u.bytes_dedup
      |FROM s JOIN u USING (shard)
      |GROUP BY s.shard, u.n_unique, u.bytes_dedup
      |ORDER BY shard""".stripMargin
}
