package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing statistics (Schleimer–Wilkerson–Aiken, k=4 w=8) over a
  * document string — `[n_grams, n_windows, n_fp]` in ONE map-side pass.
  *
  * The composable formulation (`transform(sequence(...), i ->
  * md5(concat_ws(' ', slice(w, i, 4))))` then `transform(..., j ->
  * array_min(slice(g, j, 8)))` then `array_distinct`) is semantically
  * identical but materializes THREE O(n)-element arrays per row through
  * interpreted higher-order lambdas, and `slice` copies its window on every
  * step — O(n·w) allocation for what is an O(n) sliding minimum. The kernel
  * joins the token stream once into a byte buffer, md5s each gram as a
  * buffer slice (zero window-string allocations), and runs the textbook
  * monotonic-deque sliding minimum. Exactness: gram = lowercase-hex
  * md5 of `concat_ws(' ', slice(w, i, k))`, window min = lexicographic
  * (byte-wise) string min — identical to `array_min` over hex strings and
  * to the DuckDB oracle's `list_min`; NativeKernelSpec asserts per-doc
  * equality with the composable formulation.
  */
case class WinnowStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_stats"

  override def nullSafeEval(input: Any): Any =
    TextWindowKernel.winnowStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextWindowKernel.winnowStats($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

/** Native distinct 16-token-window md5 set of a document — the
  * `array_distinct(transform(sequence(...), i -> unhex(md5(concat_ws(' ',
  * slice(w, i, 16))))))` column of the substring-dedup gram table as one
  * buffer pass (16-byte binary keys, first-occurrence order). NULL for
  * documents with fewer than 16 tokens — exactly the rows the composable
  * path's `size(w) >= 16` filter dropped before exploding.
  */
case class WindowMd5Set(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_md5_set"

  override def nullSafeEval(input: Any): Any =
    TextWindowKernel.windowMd5Set(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextWindowKernel.windowMd5Set($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowMd5Set =
    copy(child = newChild)
}

/** Native per-document character statistics — `[n_chars, n_distinct,
  * collision]` (count of code points, distinct code points, Σc² over
  * per-character counts) in ONE pass over the string.
  *
  * The composable formulation (`slice(split(text, ''), 1, length(text))`
  * then `aggregate(transform(array_distinct(cs), ch ->
  * size(filter(cs, x -> x = ch))²))`) is semantically identical but
  * materializes an n-element array of single-char strings per row and
  * re-scans it once per distinct character through interpreted
  * higher-order lambdas — O(k·n) boxed comparisons for what is an O(n)
  * counting pass (measured 4.7s exec at sf0.1 vs 0.2s for this kernel).
  * NativeKernelSpec asserts per-doc equality with the composable
  * formulation.
  */
case class CharCollision(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_collision"

  override def nullSafeEval(input: Any): Any =
    TextWindowKernel.charCollision(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextWindowKernel.charCollision($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCollision =
    copy(child = newChild)
}

/** Native content-defined chunking — the ordered md5 hex digests of the
  * chunks produced by cutting after every character position p (W ≤ p < n)
  * whose trailing-W-character window hash clears the boundary test
  * (first 16 md5 bits ≡ 0 mod 32 — expected chunk length 32, the
  * LBFS/gear-CDC boundary rule that makes chunking SHIFT-RESISTANT:
  * inserting one byte re-chunks only the window it touches, unlike
  * mm_chunk_dedup's fixed 64-byte grid where one insertion shifts every
  * later chunk).
  *
  * The composable formulation (explode `sequence(W, n−1)`, window =
  * `substr(text, p−7, 8)`, cut iff `conv(substr(md5(w),1,4),16,10) % 32
  * = 0`, then lead-window chunk reassembly) is semantically identical but
  * materializes one row per CHARACTER of the corpus through the shuffle.
  * The kernel does the per-position hashing in one buffer pass in the
  * scan's project list: UTF-8-encode once with per-code-point byte
  * offsets, md5 each window and each chunk as buffer slices. Positions
  * are CODE POINTS (matching Spark `substring`/DuckDB `substr`
  * character semantics, never UTF-16 units or bytes); hex digests are
  * lowercase — identical to both engines' `md5()`. NULL input → NULL;
  * empty string → the single md5("") chunk, exactly like the composable
  * path's `coalesce` tail.
  */
case class CdcChunkHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(input: Any): Any =
    TextWindowKernel.cdcChunkHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextWindowKernel.cdcChunkHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

/** All SubstrW-token window digests WITH their 1-based positions:
  * `window_md5_idx(text)` → `array<struct<idx: bigint, g: binary>>` —
  * the per-position stream dedup_substring_apply matches against the
  * duplicated-window dim. The composable `transform(sequence(...), i ->
  * struct(i, unhex(md5(concat_ws(' ', slice(w, i, W))))))` is an
  * interpreted lambda chain that re-concats every window (O(n·W)
  * allocation, outside whole-stage codegen — measured 3.0s at sf1);
  * the kernel md5s buffer slices of ONE rejoined byte buffer, exactly
  * like [[WindowMd5Set]] but keeping positions and duplicates. NULL for
  * docs under SubstrW tokens (the `size(w) >= W` gate).
  */
case class WindowMd5Idx(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("g", BinaryType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "window_md5_idx"

  override def nullSafeEval(input: Any): Any =
    TextWindowKernel.windowMd5Idx(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextWindowKernel.windowMd5Idx($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowMd5Idx =
    copy(child = newChild)
}

object TextWindowKernel {
  private val WinnowK = 4
  private val WinnowW = 8
  private val SubstrW = 16
  private val CdcW = 8
  private val CdcMod = 32

  // tokenizer + digest helpers shared with MinHashKernel (ADVICE r10:
  // one implementation of the split(trim(text), "\\s+") contract)
  import TextKernelUtil.{digests, splitWords}

  /** Single-space rejoined UTF-8 buffer + per-token start offsets (one
    * sentinel past the end): the W-token window starting at token i is the
    * byte range [starts(i), starts(i+W) - 1) — identical bytes to
    * `concat_ws(' ', slice(w, i+1, W))`. */
  private def joinBuffer(words: Array[String]): (Array[Byte], Array[Int]) = {
    val n = words.length
    val utf = new Array[Array[Byte]](n)
    var total = 0
    var i = 0
    while (i < n) {
      utf(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      total += utf(i).length + 1
      i += 1
    }
    val buf = new Array[Byte](total)
    val starts = new Array[Int](n + 1)
    var off = 0
    i = 0
    while (i < n) {
      starts(i) = off
      System.arraycopy(utf(i), 0, buf, off, utf(i).length)
      off += utf(i).length
      buf(off) = ' '
      off += 1
      i += 1
    }
    starts(n) = off
    (buf, starts)
  }

  private def md5HexOf(md: java.security.MessageDigest,
      buf: Array[Byte], off: Int, len: Int): String = {
    md.reset()
    md.update(buf, off, len)
    TextKernelUtil.toHex(md.digest())
  }

  /** `[n_grams, n_windows, n_fp]` (see [[WinnowStats]]). */
  def winnowStats(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    val nGrams = math.max(words.length - (WinnowK - 1), 0)
    if (nGrams == 0) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val (buf, starts) = joinBuffer(words)
    val md = digests.get()
    val grams = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = md5HexOf(md, buf, starts(i), starts(i + WinnowK) - 1 - starts(i))
      i += 1
    }
    val nWindows = math.max(nGrams - (WinnowW - 1), 0)
    if (nWindows == 0) return new GenericArrayData(Array[Any](nGrams.toLong, 0L, 0L))
    // sliding lexicographic minimum over w=8 grams: monotonic deque of
    // candidate indices, ascending by value — O(n) total
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail) live candidates
    val fp = new java.util.HashSet[String]()
    i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)).compareTo(grams(i)) >= 0) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - WinnowW) head += 1
      if (i >= WinnowW - 1) fp.add(grams(deque(head)))
      i += 1
    }
    new GenericArrayData(Array[Any](nGrams.toLong, nWindows.toLong, fp.size().toLong))
  }

  /** `[n_chars, n_distinct, collision]` (see [[CharCollision]]): code-point
    * counts — matching Spark `length()`/`split(text, '')` and DuckDB
    * `length()`/`substr()` semantics, which all index characters, never
    * UTF-16 units or bytes. */
  def charCollision(text: UTF8String): ArrayData = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val cur = counts.get(cp)
      if (cur == null) counts.put(cp, Array(1L)) else cur(0) += 1L
    }
    var coll = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next()(0); coll += c * c }
    new GenericArrayData(Array[Any](n, counts.size().toLong, coll))
  }

  /** Ordered chunk md5 hex digests under the W=8 / mod-32 boundary rule
    * (see [[CdcChunkHashes]]). */
  def cdcChunkHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    // per-code-point byte offsets into the UTF-8 encoding: code point i
    // (0-based) spans bytes [byteOff(i), byteOff(i+1))
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var n = 0
    var i = 0
    while (i < s.length) { i += Character.charCount(s.codePointAt(i)); n += 1 }
    val byteOff = new Array[Int](n + 1)
    i = 0
    var cp = 0
    var boff = 0
    while (i < s.length) {
      byteOff(cp) = boff
      val c = s.codePointAt(i)
      boff += (if (c < 0x80) 1 else if (c < 0x800) 2
               else if (c < 0x10000) 3 else 4)
      i += Character.charCount(c)
      cp += 1
    }
    byteOff(n) = boff
    val md = TextKernelUtil.digests.get()
    // 1-based chunk start positions: 1, then cut+1 for every boundary cut
    // after position p ∈ [W, n−1] (never after the last character)
    val starts = new java.util.ArrayList[Int]()
    starts.add(1)
    var p = CdcW
    while (p <= n - 1) {
      md.reset()
      md.update(bytes, byteOff(p - CdcW), byteOff(p) - byteOff(p - CdcW))
      val d = md.digest()
      if ((((d(0) & 0xff) << 8 | (d(1) & 0xff)) % CdcMod) == 0) starts.add(p + 1)
      p += 1
    }
    val out = new Array[AnyRef](starts.size())
    var j = 0
    while (j < starts.size()) {
      val a = starts.get(j) - 1
      val b = if (j + 1 < starts.size()) starts.get(j + 1) - 1 else n
      md.reset()
      md.update(bytes, byteOff(a), byteOff(b) - byteOff(a))
      out(j) = UTF8String.fromString(TextKernelUtil.toHex(md.digest()))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 16-byte md5 digests of 16-token windows, first-occurrence
    * order; null when the document has fewer than 16 tokens (see
    * [[WindowMd5Set]]). */
  /** Every window digest with its 1-based position (see [[WindowMd5Idx]]). */
  def windowMd5Idx(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    if (words.length < SubstrW) return null
    val (buf, starts) = joinBuffer(words)
    val md = digests.get()
    val out = new Array[Any](words.length - SubstrW + 1)
    var i = 0
    while (i <= words.length - SubstrW) {
      md.reset()
      md.update(buf, starts(i), starts(i + SubstrW) - 1 - starts(i))
      out(i) = new GenericInternalRow(Array[Any]((i + 1).toLong, md.digest()))
      i += 1
    }
    new GenericArrayData(out)
  }

  def windowMd5Set(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    if (words.length < SubstrW) return null
    val (buf, starts) = joinBuffer(words)
    val md = digests.get()
    val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer]()
    var i = 0
    while (i <= words.length - SubstrW) {
      md.reset()
      md.update(buf, starts(i), starts(i + SubstrW) - 1 - starts(i))
      seen.add(java.nio.ByteBuffer.wrap(md.digest()))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().array(); j += 1 }
    new GenericArrayData(out)
  }
}
