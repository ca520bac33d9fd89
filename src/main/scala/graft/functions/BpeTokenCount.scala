package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native iterated-BPE tokenizer application: `bpe_token_count(text,
  * merges)` → the document's token count after applying an ORDERED merge
  * list (the rules `TextAnalysis.bpeTrainedMerges` learns, one top-pair
  * per training round) to every whitespace word.
  *
  * Semantics (the contract the generated DuckDB oracle's unrolled
  * merge-mask rounds replicate, and BpeTokensSpec pins on adversarial
  * input): words are the repo-wide `split(trim(text), "\\s+")`; a word
  * starts as its code-point sequence; each merge rule `"l r"` (tokens
  * space-joined — tokens cannot contain whitespace) is applied IN
  * PRIORITY ORDER as one full left-to-right pass replacing adjacent
  * token pairs (l, r) with the concatenation l+r, leftmost-first and
  * non-overlapping within the pass (after a replacement the cursor moves
  * past the new token). Later rules see the tokens earlier rules built,
  * so multi-character tokens compose across rounds — real BPE (Sennrich
  * et al. 2016), not the single-level pair table this replaces (r13
  * verdict #5). A length-0 word (the empty token an all-whitespace
  * document yields) contributes 0 tokens.
  *
  * Why a kernel: the per-word merge loop is sequential state no
  * built-in higher-order function expresses without an interpreted
  * lambda chain per round; here the whole R-round application is one
  * fused loop inside whole-stage codegen. The merge list must be
  * FOLDABLE (literal-injected trained state, the pq_encode codebook
  * contract, enforced at ANALYSIS time): parsed once per plan,
  * referenced from generated code.
  */
case class BpeTokenCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // Foldability is part of the signature, not just an execution-time
    // require(): a non-literal merge table must fail ANALYSIS with a
    // readable error, not blow an opaque executor exception when the lazy
    // val first evaluates (r13 ADVICE).
    case (StringType, ArrayType(StringType, _)) if !right.foldable =>
      TypeCheckResult.TypeCheckFailure(
        "bpe_token_count merge list must be a foldable literal (trained state is plan-injected)")
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects (string, array<string> literal), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val merges: Array[Array[String]] =
    BpeKernel.parseMerges(right)

  override def nullSafeEval(text: Any, mIgnored: Any): Any =
    BpeKernel.count(text.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeKernel.count($t, $mRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeTokenCount =
    copy(left = newLeft, right = newRight)
}

/** Per-WORD variant returning the token sequence itself:
  * `bpe_tokens(word, merges)` → `array<string>` of the word's tokens
  * after the ordered merge list. This is the training-loop primitive —
  * round r counts adjacent pairs of `bpe_tokens(w, merges[0..r-1])` over
  * the word-frequency table — and the equality witness BpeTokensSpec
  * sums against [[BpeTokenCount]].
  */
case class BpeTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) if !right.foldable =>
      TypeCheckResult.TypeCheckFailure(
        "bpe_tokens merge list must be a foldable literal (trained state is plan-injected)")
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects (string, array<string> literal), got ($l, $r)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val merges: Array[Array[String]] =
    BpeKernel.parseMerges(right)

  override def nullSafeEval(word: Any, mIgnored: Any): Any =
    BpeKernel.tokensArray(word.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeKernel.tokensArray($t, $mRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeTokens =
    copy(left = newLeft, right = newRight)
}

object BpeKernel {
  /** Parse the foldable `array<string>` of space-joined `"l r"` rules into
    * ordered (l, r) pairs, once per plan. */
  def parseMerges(right: Expression): Array[Array[String]] = {
    require(right.foldable, "bpe merge list must be a literal")
    val a = right.eval(null).asInstanceOf[ArrayData]
    (0 until a.numElements()).map { i =>
      val s = a.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      require(sp > 0 && sp < s.length - 1, s"malformed merge rule '$s' (expected 'l r')")
      Array(s.substring(0, sp), s.substring(sp + 1))
    }.toArray
  }

  /** One word → its token sequence after the ordered merge list: start at
    * code points, then one leftmost-first non-overlapping pass per rule. */
  def tokenize(w: String, merges: Array[Array[String]]): Array[String] = {
    if (w.isEmpty) return Array.empty
    var toks = charTokens(w)
    var r = 0
    while (r < merges.length && toks.length >= 2) {
      toks = applyMerge(toks, merges(r)(0), merges(r)(1))
      r += 1
    }
    toks
  }

  /** One leftmost-first non-overlapping merge pass (also the driver-side
    * training loop's per-round step — ONE implementation so train and
    * encode cannot diverge). */
  def applyMerge(toks: Array[String], l: String, rt: String): Array[String] = {
    // count survivors first, then fill — one pass, no growable buffer
    var j = 0; var outLen = 0
    while (j < toks.length) {
      if (j + 1 < toks.length && toks(j) == l && toks(j + 1) == rt) j += 2
      else j += 1
      outLen += 1
    }
    if (outLen == toks.length) return toks
    val out = new Array[String](outLen)
    j = 0; var o = 0
    while (j < toks.length) {
      if (j + 1 < toks.length && toks(j) == l && toks(j + 1) == rt) {
        out(o) = toks(j) + toks(j + 1); j += 2
      } else { out(o) = toks(j); j += 1 }
      o += 1
    }
    out
  }

  /** The initial code-point tokenization (round 0). */
  def charTokens(w: String): Array[String] = {
    val L = w.length
    val toks = new Array[String](w.codePointCount(0, L))
    var i = 0; var k = 0
    while (i < L) {
      val n = Character.charCount(w.codePointAt(i))
      toks(k) = w.substring(i, i + n)
      i += n; k += 1
    }
    toks
  }

  def tokensArray(word: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val toks = tokenize(word.toString, merges)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Whole-document token count: Σ tokens per whitespace word. */
  def count(text: UTF8String, merges: Array[Array[String]]): Long = {
    val ws = TextKernelUtil.splitWords(text)
    var total = 0L
    var i = 0
    while (i < ws.length) { total += tokenize(ws(i), merges).length; i += 1 }
    total
  }
}
