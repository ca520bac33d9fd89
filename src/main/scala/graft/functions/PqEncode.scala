package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native product-quantization encoder: `pq_encode(v, codebook)` → the
  * 8 subspace codes of vector `v` (argmin squared-L2 over each subspace's
  * codewords, smaller code on ties).
  *
  * The composable formulation (`least` over 16 (d2, code) structs per
  * subspace, each d2 a sum of 8 squared `element_at` diffs) is semantically
  * identical but builds a ~1000-node expression tree that dominates the PQ
  * family's runtime (ann_pq/ann_refine/ann_recall each paid ~3-4s of it at
  * sf0.1); the kernel runs the same arithmetic as three tight loops. The
  * codebook argument must be FOLDABLE (it is literal-injected quantizer
  * state, KBs — the same collect-once contract as the IVF centroids); it
  * is evaluated once per plan and referenced from generated code, never
  * re-evaluated per row.
  *
  * Exactness: per-codeword d2 accumulates left-to-right over subspace dims
  * (the composable `reduce(_ + _)` order); strict `<` keeps the smaller
  * code on ties, exactly the struct-least tie rule. NativeKernelSpec
  * asserts code-for-code equality against the composable formulation.
  */
case class PqEncode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "pq_encode"

  // the literal codebook, parsed once per expression instance
  @transient private lazy val codebook: Array[Array[Array[Double]]] = {
    require(right.foldable, "pq_encode codebook must be a literal")
    val sub = right.eval(null).asInstanceOf[ArrayData]
    (0 until sub.numElements()).map { s =>
      val words = sub.getArray(s)
      (0 until words.numElements()).map { c =>
        words.getArray(c).toDoubleArray()
      }.toArray
    }.toArray
  }

  override def nullSafeEval(v: Any, cbIgnored: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the folded codebook literal is referenced once; the per-row code is
    // one static kernel call, inside whole-stage codegen
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $cbRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqKernel {
  /** Subspace codes of `v` under `cb` (cb(s)(c) = codeword c of subspace
    * s); d2 accumulates left-to-right, strict `<` keeps the smaller code
    * on ties — bit-identical to the struct-least composable formulation. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val x = v.toDoubleArray()
    val out = new Array[Int](cb.length)
    var s = 0
    while (s < cb.length) {
      val words = cb(s)
      val subDim = words(0).length
      val base = s * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < words.length) {
        val w = words(c)
        var d2 = 0.0
        var i = 0
        while (i < subDim) {
          val diff = x(base + i) - w(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}
