package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenizer application: `bpe_token_count(text, merges)` →
  * the document's token count after greedily applying a learned merge
  * TABLE (the top-K pair table `text_bpe_pairs` trains) to every
  * whitespace word.
  *
  * Semantics (the contract both the DuckDB oracle's `list_reduce` fold
  * and NativeKernelSpec's HOF reference replicate position-for-position):
  * words are the repo-wide `split(trim(text), "\\s+")`; within a word,
  * scan left to right — if the 2-character pair starting at the cursor is
  * in the merge set, it becomes ONE token and the cursor advances 2,
  * otherwise the character is its own token and the cursor advances 1.
  * Greedy first-match (not merge-priority iteration): with a single-level
  * char-pair table the two differ only on overlapping pairs, where
  * leftmost-first is the deterministic choice both engines can express
  * as a pure fold. Characters are code points (Spark `substring` /
  * DuckDB `substr` semantics); a length-0 word (the empty token an
  * all-whitespace document yields) contributes 0.
  *
  * Why a kernel: the fold formulation builds an interpreted
  * struct-per-character lambda chain (the embed_gram_matrix 17x-cliff
  * shape) over every character of the corpus — the kernel is one fused
  * loop inside whole-stage codegen. The merge table must be FOLDABLE
  * (literal-injected trained state, the pq_encode codebook contract):
  * parsed once per plan, referenced from generated code.
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
        "bpe_token_count merge table must be a foldable literal (trained state is plan-injected)")
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects (string, array<string> literal), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val merges: java.util.HashSet[String] = {
    require(right.foldable, "bpe_token_count merge table must be a literal")
    val a = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String]()
    (0 until a.numElements()).foreach(i => s.add(a.getUTF8String(i).toString))
    s
  }

  override def nullSafeEval(text: Any, mIgnored: Any): Any =
    BpeKernel.count(text.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", merges, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeKernel.count($t, $mRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BpeTokenCount =
    copy(left = newLeft, right = newRight)
}

object BpeKernel {
  /** Greedy leftmost-first pair merge over one word, by code point. */
  private def countWord(w: String, merges: java.util.HashSet[String]): Long = {
    var cnt = 0L
    var j = 0
    val L = w.length
    while (j < L) {
      val c1 = Character.charCount(w.codePointAt(j))
      if (j + c1 < L &&
          merges.contains(w.substring(j, j + c1 + Character.charCount(w.codePointAt(j + c1))))) {
        j += c1 + Character.charCount(w.codePointAt(j + c1))
      } else {
        j += c1
      }
      cnt += 1L
    }
    cnt
  }

  def count(text: UTF8String, merges: java.util.HashSet[String]): Long = {
    val ws = TextKernelUtil.splitWords(text)
    var total = 0L
    var i = 0
    while (i < ws.length) { total += countWord(ws(i), merges); i += 1 }
    total
  }
}
