package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-permutation MinHash signature over a document string — the
  * whole signature in ONE map-side pass per document.
  *
  * The composable formulation (shingle explode → 16 substring(md5(...))
  * columns → 16 `min` aggregates) is semantically identical but pays a
  * corpus-wide explode plus a full aggregate SHUFFLE just to get one row
  * per doc back. At 100 TB that shuffle moves (shingles × 16 hex words)
  * for no reason: the signature is a pure function of the document, so it
  * belongs in the scan's project list. This expression computes it there —
  * no explode, no aggregate exchange; the md5 math is the hot loop and
  * runs on the raw shingle stream (min is duplicate-insensitive).
  *
  * Exactness contract (hash-verified against the DuckDB oracle): space-trim
  * then regex split with limit -1 — exactly Spark's `split(trim(text),
  * "\\s+")`; shingle = three words joined by single spaces (`concat_ws`);
  * perm k = the (k%4)-th 8-hex-char word of md5("k/4|" || shingle),
  * lowercase; min = byte-wise comparison over fixed-width lowercase hex,
  * identical to UTF8String/DuckDB string min. Documents with fewer than 3
  * words yield NULL (the composable path filters them before shingling).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // heavy lifting in a static kernel; the generated code stays inside
      // whole-stage codegen (one static call, no interpreted fallback)
      s"""
         |${ev.value} = graft.functions.MinHashKernel.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native distinct word-3-shingle set of a document — another pure per-doc
  * function that belongs in the scan's project list: `explode(shingle_set
  * (text))` yields exactly the rows of `explode(all-shingles).distinct()`
  * WITHOUT the corpus-wide distinct exchange (dedup happens inside the row
  * it belongs to). First-occurrence order; downstream consumers are set
  * ops (sizes, equijoins, document frequencies), so order is irrelevant —
  * DedupSpec still asserts per-doc set equality with the composable
  * formulation. NULL for documents with fewer than 3 words (the
  * composable path filters those before shingling).
  */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.shingleSet($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Native 64-bit SimHash over a document string, as the 4 × 16-bit chunk
  * keys the blocking join uses — one map-side pass per document.
  *
  * The composable formulation (token explode → groupBy(doc, token) counts →
  * 64 weighted SUM aggregates) is exact but pays a corpus-wide explode and
  * an aggregate exchange for what is a pure function of the document.
  * Iterating raw token OCCURRENCES and adding ±1 per bit is integer-exact
  * and order-insensitive, so it equals the count-weighted sums bit for bit
  * (asserted per doc in DedupSpec); the DuckDB oracle still verifies the
  * operator end-to-end. Splitting matches `split(trim(text), "\\s+")`
  * exactly (see [[TextKernelUtil.splitWords]]) — including the single empty
  * token an all-space document yields.
  */
/** Native [top-bigram-count, top-trigram-count] of a document's word
  * stream — the repetition signal as a pure per-doc function in the scan's
  * project list.
  *
  * The composable formulation (n-gram explode → groupBy(doc, gram) counts →
  * per-doc max → join back) is exact but pays TWO corpus-sized (doc, gram)
  * shuffles for what never needs to leave the row. The kernel counts grams
  * in one open-hash pass per document (memory bounded by the doc's distinct
  * grams, the same bound the aggregate's hash table had — just per-row and
  * short-lived). Only the top COUNT is returned, so ties need no
  * tie-break. 0 where the doc has fewer than n words, matching the
  * composable path's left-join + coalesce(0). Word splitting and the
  * single-space gram join match `split(trim(text), "\\s+")` + `concat_ws`
  * exactly (asserted per doc vs the composable formulation in
  * NativeKernelSpec, including on adversarial whitespace/unicode).
  */
case class TopNgramCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "top_ngram_counts"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.topNgramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.topNgramCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): TopNgramCounts =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Native top-token count: the highest occurrence count of any single
  * whitespace token — the repetition signal text_quality_gate's topn rule
  * reads. The composable formulation
  * `aggregate(transform(array_distinct(w), t -> size(filter(w, x -> x = t))), …)`
  * is O(distinct · words) per document; the kernel is one hash-count pass.
  * Token stream is EXACTLY `split(trim(text), "\\s+")` (trailing empties
  * kept, a lone empty token for blank text), matching the composable
  * column and the DuckDB oracle's regexp_split_to_array.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "top_token_count"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.topTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.MinHashKernel.topTokenCount($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** Fused per-document gate statistics — the nine integer text signals the
  * curation stack shares (text_quality, text_quality_gate,
  * text_gopher_rules, text_tokens, pipeline_curate, and the shared
  * quality-score projection), computed in ONE tokenize pass plus ONE
  * char-class pass. Layout (array<long>, fixed):
  *
  *   [0] nw      — whitespace token count (`split(trim(text), "\\s+")`)
  *   [1] sumlen  — Σ token length (code points, = Spark `length`)
  *   [2] stopn   — tokens ∈ {'the','a'}
  *   [3] topn    — max single-token occurrence count ([[TopTokenCount]])
  *   [4] dtok    — distinct token count
  *   [5] alphan  — tokens containing an ASCII letter (`x rlike '[a-zA-Z]'`)
  *   [6] symn    — non-overlapping `'#|\.\.\.'` matches on the raw text
  *   [7] nsym    — chars of lower(text) matching `[^a-z0-9\s]`
  *   [8] retok   — `[a-z]+|[0-9]+|[^a-z0-9\s]` matches on lower(text)
  *
  * Why a kernel: the composable formulations pay three interpreted
  * higher-order functions (transform/aggregate/filter never enter
  * whole-stage codegen) plus two regexp_extract_all calls that
  * MATERIALIZE an array per match just to take its size — measured 6.1s
  * for text_quality_gate at sf1 vs ~2s for kernel-free peers; each signal
  * here is the exact integer the composable column produces
  * (NativeKernelSpec pins all nine element-for-element, including the
  * lone-empty-token blank document, surrogate pairs, and the '#'/'...'
  * alternation edges). Pure function of one document — computes in the
  * scan's project list at any corpus size.
  */
case class GateStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gate_stats"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.gateStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.MinHashKernel.gateStats($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): GateStats =
    copy(child = newChild)
}

/** Native per-doc duplicated-5-gram counters: `gram_dup_stats(text)` →
  * `array(n_grams, dup_occ, dup_distinct)` — the three counters
  * text_dup_ngram_frac's Gopher repetition rule reports, fused into one
  * tokenize + one within-doc hash-count pass. Why a kernel (r13 verdict
  * #6): the counters are a pure function of ONE document (the grouping key
  * of the "LM-counting" formulation was (doc_id, gram)), so the
  * explode→(doc, gram) shuffle→two-level rollup plan shuffled the entire
  * gram stream (sf1: 2.3s, and BINARY md5 keys only bought 14%) to compute
  * what a scan-side projection computes with zero exchanges. Null for docs
  * with fewer than 5 tokens — the `size(w) >= 5` gate both engines apply.
  * The composable formulation survives as the DuckDB oracle and as
  * RandomizedDecompositionSpec's per-doc sliding-window brute force.
  */
case class GramDupStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_dup_stats"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.gramDupStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.gramDupStats($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramDupStats =
    copy(child = newChild)
}

/** Native per-doc term-frequency table: `term_counts(text)` →
  * `array<struct<t: string, c: bigint>>`, one entry per DISTINCT
  * whitespace token with its in-doc count (first-occurrence order —
  * consumers explode and re-aggregate/re-sort, so order carries no
  * semantics). Why a kernel (r14, the sf1 weak set): text_top_terms and
  * text_keywords built per-doc tf with explode → groupBy(doc_id, t) —
  * a full corpus-token shuffle (~7.6M rows at sf1) to group by a key that
  * starts with doc_id, the same shape gram_dup_stats already eliminated
  * for text_dup_ngram_frac. With tf computed in the scan projection, the
  * exploded rows are ALREADY one-per-(doc, term): the df aggregate
  * map-side-combines to vocabulary-size partials and the only remaining
  * corpus-row exchange is the per-doc top-k window. The explode+groupBy
  * formulation survives as the DuckDB oracle and the spec reference.
  */
case class TermCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "term_counts"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.termCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.MinHashKernel.termCounts($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** Native per-doc BIGRAM-frequency table: `bigram_counts(text)` →
  * `array<struct<wp: string, w: string, c: bigint>>`, one entry per
  * DISTINCT adjacent-token pair with its in-doc count (first-occurrence
  * order — order carries no semantics). Empty array for docs with < 2
  * tokens, NULL for NULL text. Why a kernel (r14 verdict #5, the last
  * sf1 text entry > 2.5x): text_bigram_lm shipped every bigram OCCURRENCE
  * (7.5M rows at sf1) into the count shuffle and the score join, and the
  * HOF pair branch re-evaluated per consumer. With per-doc pair counts in
  * the scan projection the exploded rows are one-per-(doc, distinct pair)
  * — the corpus count table map-side-combines from those partials and the
  * score join carries the per-doc multiplicity as a weight column instead
  * of repeated rows. Same shape as [[TermCounts]], which eliminated this
  * for the unigram side.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("wp", StringType, nullable = false),
    StructField("w", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_counts"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.bigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.MinHashKernel.bigramCounts($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

/** Native per-doc DSIR feature vector: `dsir_bucket_counts(text, n)` →
  * `array<bigint>` of length n where slot b counts the doc's tokens whose
  * md5 FIRST BYTE mod n is b — exactly the hashed-unigram bucket rule
  * select_dsir's composable formulation spells as
  * (hexdigit1·16 + hexdigit2) % n (the first two hex chars ARE the first
  * digest byte). Why a kernel (r14 verdict #9): the explode → per-(doc,
  * lang, bucket) groupBy materialized every token occurrence into the
  * aggregate and shipped ~n rows per doc through an exchange; with the
  * vector formed in the scan projection the global bucket table is ONE
  * fully combinable 2n-sum aggregate and the per-doc weight is a
  * dot_i64 against the literal-injected score vector — nothing leaves
  * the scan but one row per doc. `n` must be a foldable literal (plan
  * state, enforced at analysis time — the bpe_token_count contract).
  * NULL for NULL text; an all-whitespace doc counts its single empty
  * token, matching the \s+ split contract.
  */
case class DsirBucketCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if !right.foldable =>
      TypeCheckResult.TypeCheckFailure(
        "dsir_bucket_counts bucket count must be a foldable literal")
    case (StringType, IntegerType) =>
      // eval the foldable literal HERE (r15 advice): a null, zero, or
      // negative count otherwise passes analysis and surfaces as a
      // per-task `% 0` ArithmeticException / negative-array-size inside
      // every executor instead of one clean analysis-time error
      right.eval(null) match {
        case n: java.lang.Integer if n > 0 => TypeCheckResult.TypeCheckSuccess
        case bad => TypeCheckResult.TypeCheckFailure(
          s"dsir_bucket_counts bucket count must be a positive int literal, got $bad")
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dsir_bucket_counts expects (string, int literal), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "dsir_bucket_counts"

  @transient private lazy val nBuckets: Int =
    right.eval(null).asInstanceOf[Int]

  override def nullSafeEval(text: Any, nIgnored: Any): Any =
    MinHashKernel.dsirBucketCounts(text.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.MinHashKernel.dsirBucketCounts($t, $nBuckets);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirBucketCounts =
    copy(left = newLeft, right = newRight)
}

/** Native 8-block perceptual-hash block sums over a payload's UTF-8 bytes
  * (see `Multimodal.mmPhash`) — per-row hex-digit mass per block, the pure
  * map the composable formulation pays 8 `aggregate(sequence(...))` calls
  * for (each of which MATERIALIZES an O(bytes) position array per row).
  * Digit d (0-based, 2·len total) is the high (d even) or low (d odd)
  * nibble of byte d/2; block b covers digits [b·L/8, (b+1)·L/8) — exactly
  * the 1-based inclusive substring ranges of the SQL formulation. NULL for
  * payloads under 4 bytes (blocks would be empty).
  */
case class PhashBlocks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "phash_blocks"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.phashBlocks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.phashBlocks($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PhashBlocks =
    copy(child = newChild)
}

/** 64-block variant of [[PhashBlocks]] — the fingerprint resolution needed
  * for NEAR-duplicate detection (64 above-mean bits → hamming distance),
  * vs the 8-block exact-bucket form. Null for payloads under 32 bytes.
  */
case class PhashBlocks64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "phash_blocks64"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.phashBlocksN(input.asInstanceOf[UTF8String], 64)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.phashBlocksN($c, 64);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PhashBlocks64 =
    copy(child = newChild)
}

object MinHashKernel {
  private val NumPerms = 16
  private val WordsPerHash = 4
  private val Seeds = NumPerms / WordsPerHash
  // tokenizer + digest helpers shared with TextWindowKernel (ADVICE r10:
  // one implementation of the split(trim(text), "\\s+") contract)
  import TextKernelUtil.{digests, splitWords}

  private def md5Hex(md: java.security.MessageDigest, s: String): String =
    TextKernelUtil.toHex(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** 64-bit simhash as 4 × 16-bit chunk ints (see [[SimHash64]]). */
  def simhash(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    val md = digests.get()
    val acc = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val hex = md5Hex(md, words(i))
      var j = 0
      while (j < 4) {
        val cj = Integer.parseInt(hex.substring(j * 4, j * 4 + 4), 16)
        var r = 0
        while (r < 16) {
          acc(j * 16 + r) += (((cj >> (15 - r)) & 1) * 2 - 1)
          r += 1
        }
        j += 1
      }
      i += 1
    }
    val keys = new Array[Int](4)
    var j = 0
    while (j < 4) {
      var k = 0
      var r = 0
      while (r < 16) {
        if (acc(j * 16 + r) > 0) k |= 1 << (15 - r)
        r += 1
      }
      keys(j) = k
      j += 1
    }
    new GenericArrayData(keys.toIndexedSeq)
  }

  /** Distinct 3-shingles in first-occurrence order; null when < 3 words. */
  def shingleSet(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    if (words.length < 3) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - 3) {
      seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** [top bigram count, top trigram count] over the word stream; 0 for
    * n-grams the doc is too short to form (see [[graft.functions.TopNgramCounts]]). */
  def topNgramCounts(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    def top(n: Int): Long = {
      if (words.length < n) return 0L
      val m = new java.util.HashMap[String, Integer]()
      val sb = new java.lang.StringBuilder()
      var best = 0
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val c = m.merge(sb.toString, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > best) best = c
        i += 1
      }
      best.toLong
    }
    new GenericArrayData(Array[Any](top(2), top(3)))
  }

  /** Null (not an empty array) when the doc has < 3 words. */
  def compute(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    if (words.length < 3) return null
    val md = digests.get()
    val mins = new Array[String](NumPerms)
    var i = 0
    while (i <= words.length - 3) {
      val shingle = words(i) + " " + words(i + 1) + " " + words(i + 2)
      var seed = 0
      while (seed < Seeds) {
        val hex = md5Hex(md, s"$seed|$shingle")
        var j = 0
        while (j < WordsPerHash) {
          val k = seed * WordsPerHash + j
          val w = hex.substring(j * 8, j * 8 + 8)
          if (mins(k) == null || w.compareTo(mins(k)) < 0) mins(k) = w
          j += 1
        }
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)).toIndexedSeq)
  }

  /** Highest occurrence count of any single token (see [[TopTokenCount]]). */
  def topTokenCount(text: UTF8String): Long = {
    val words = splitWords(text)
    val counts = new java.util.HashMap[String, Int](words.length * 2)
    var mx = 0
    var i = 0
    while (i < words.length) {
      val c = counts.merge(words(i), 1, (a, b) => a + b)
      if (c > mx) mx = c
      i += 1
    }
    mx.toLong
  }

  /** Fused nine-signal gate statistics (see [[GateStats]] for the layout
    * and the exact-parity contract of every element). */
  def gateStats(text: UTF8String): ArrayData = {
    val words = TextKernelUtil.splitWords(text)
    var sumlen = 0L; var stopn = 0L; var alphan = 0L; var topn = 0L
    val counts = new java.util.HashMap[String, Int](words.length * 2)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      sumlen += w.codePointCount(0, w.length)
      if (w == "the" || w == "a") stopn += 1
      var j = 0
      var hasAlpha = false
      while (!hasAlpha && j < w.length) {
        val c = w.charAt(j)
        hasAlpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        j += 1
      }
      if (hasAlpha) alphan += 1
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > topn) topn = c
      i += 1
    }
    // symn: leftmost non-overlapping '#|\.\.\.' matches on the RAW text —
    // '#' and '...' start with different chars, so first-char dispatch is
    // exactly the regex alternation's leftmost-match scan
    val s = text.toString
    var symn = 0L
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '#') { symn += 1; i += 1 }
      else if (c == '.' && i + 2 < s.length &&
        s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') { symn += 1; i += 3 }
      else i += 1
    }
    // nsym / retok: one code-point scan of lower(text) — UTF8String's own
    // toLowerCase, the exact string Spark's lower() hands the regex. Java
    // regex \s is the ASCII set [ \t\n\x0B\f\r]; [a-z]/[0-9] are ASCII, so
    // any other code point (incl. a surrogate pair, which the regex engine
    // also steps as ONE code point) is a single symbol/token match.
    val lo = text.toLowerCase.toString
    var nsym = 0L; var retok = 0L
    var prevClass = -1 // 0 letter-run, 1 digit-run, 2 whitespace, 3 symbol
    i = 0
    while (i < lo.length) {
      val cp = lo.codePointAt(i)
      val cls =
        if (cp >= 'a' && cp <= 'z') 0
        else if (cp >= '0' && cp <= '9') 1
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
          cp == '\f' || cp == '\r') 2
        else 3
      if (cls == 3) { nsym += 1; retok += 1 }
      else if (cls == 0 && prevClass != 0) retok += 1
      else if (cls == 1 && prevClass != 1) retok += 1
      prevClass = cls
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(words.length.toLong, sumlen, stopn, topn,
      counts.size.toLong, alphan, symn, nsym, retok))
  }

  /** Fused per-doc duplicated-5-gram counters (see [[GramDupStats]]):
    * (n_grams, dup_occ, dup_distinct) over the doc's consecutive 5-token
    * windows, each gram rendered exactly as `concat_ws(' ', slice(w,i,5))`.
    * All words are joined ONCE and grams are substrings of that rendering
    * (one char copy per gram, no per-gram concat chain). Null when the doc
    * has fewer than 5 tokens — the caller's `size(w) >= 5` gate. */
  def gramDupStats(text: UTF8String): ArrayData = {
    val ws = TextKernelUtil.splitWords(text)
    val n = ws.length
    if (n < 5) return null
    val starts = new Array[Int](n + 1)
    var total = 0
    var i = 0
    while (i < n) { total += ws(i).length; i += 1 }
    val sb = new java.lang.StringBuilder(total + n)
    i = 0
    while (i < n) {
      starts(i) = sb.length()
      sb.append(ws(i))
      sb.append(' ') // trailing space trimmed via starts(i+5) - 1
      i += 1
    }
    starts(n) = sb.length()
    val full = sb.toString
    val counts = new java.util.HashMap[String, Int]((n - 4) * 2)
    i = 0
    while (i + 5 <= n) {
      counts.merge(full.substring(starts(i), starts(i + 5) - 1), 1, (a, b) => a + b)
      i += 1
    }
    var dupOcc = 0L; var dupDist = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c >= 2) { dupOcc += c; dupDist += 1 }
    }
    new GenericArrayData(Array((n - 4).toLong, dupOcc, dupDist))
  }

  /** Per-doc (term, count) table in first-occurrence order (see
    * [[TermCounts]]): one tokenize pass + one hash count. */
  def termCounts(text: UTF8String): ArrayData = {
    val ws = TextKernelUtil.splitWords(text)
    val counts = new java.util.LinkedHashMap[String, Long](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      counts.merge(ws(i), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc (prev-token, token, count) table in first-occurrence order
    * (see [[BigramCounts]]): one tokenize pass + one hash count. The map
    * key joins the pair with ' ' — tokens come from a \s+ split so they
    * contain no whitespace, making the single space an unambiguous
    * separator to split back on. */
  def bigramCounts(text: UTF8String): ArrayData = {
    val ws = TextKernelUtil.splitWords(text)
    if (ws.length < 2) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[String, Long](ws.length * 2)
    var i = 0
    while (i + 1 < ws.length) {
      counts.merge(ws(i) + " " + ws(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      val sp = k.indexOf(' ')
      out(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(k.substring(0, sp)),
        UTF8String.fromString(k.substring(sp + 1)),
        e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-doc DSIR bucket-count vector (see [[DsirBucketCounts]]): one
    * tokenize pass; bucket = (first md5 digest byte) % n. */
  def dsirBucketCounts(text: UTF8String, n: Int): ArrayData = {
    val ws = TextKernelUtil.splitWords(text)
    val counts = new Array[Long](n)
    val md = TextKernelUtil.digests.get()
    var i = 0
    while (i < ws.length) {
      md.reset()
      val d = md.digest(ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      counts((d(0) & 0xff) % n) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** 8-block hex-digit mass over the string's UTF-8 bytes (see
    * [[PhashBlocks]]); null for payloads under 4 bytes. */
  def phashBlocks(text: UTF8String): ArrayData = phashBlocksN(text, 8)

  /** n-block hex-digit mass; block b covers digits [b·L/n, (b+1)·L/n).
    * Null when the payload has fewer digits than blocks (some blocks would
    * be empty and the above-mean bit test loses meaning). */
  def phashBlocksN(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val nDigits = bytes.length * 2L
    if (nDigits < n) return null
    val sums = new Array[Long](n)
    var b = 0
    while (b < n) {
      var d = (b * nDigits / n).toInt
      val end = ((b + 1) * nDigits / n).toInt
      var acc = 0L
      while (d < end) {
        val v = bytes(d >> 1) & 0xff
        acc += (if ((d & 1) == 0) v >>> 4 else v & 0xf)
        d += 1
      }
      sums(b) = acc
      b += 1
    }
    new GenericArrayData(sums)
  }
}
