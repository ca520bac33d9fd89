package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native integer dot product over two `array<bigint>` columns — the
  * codegen'd replacement for `aggregate(zip_with(a, b, (x,y) -> x*y), 0L,
  * (acc,x) -> acc+x)`, the hot inner loop of int8-quantized ANN scoring
  * (`ann_quantized`, and its leg of `ann_recall`). Higher-order functions
  * run their lambdas interpreted per element; this generates one fused
  * Java loop (the `cosine_sim` story, integer edition).
  *
  * Exactness: integer addition is associative — any order gives the same
  * exact sum — so kernel and fold agree bit-for-bit by arithmetic, not by
  * matched association order. Null contract matches the fold it replaces:
  * a length mismatch (zip_with pads with null) or any null element makes
  * the fold null, so this returns null in those cases too.
  */
case class DotI64(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 expects (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_i64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

/** Native positionwise-equality count over two `array<string>` columns —
  * the codegen'd replacement for `size(filter(zip_with(sa, sb, (x,y) ->
  * x = y), v -> v))`, the signature-agreement counter in the LSH verify
  * joins (`dedup_minhash_lsh`'s estimate, `dedup_incremental`'s and the
  * persisted-index probe's screens).
  *
  * Semantics of the composable form, preserved exactly: zip_with pads the
  * shorter array with nulls, `x = y` is null when either side is null,
  * and `filter(v -> v)` keeps only TRUE — so the count is over positions
  * below min(len) where both elements are non-null and equal; mismatched
  * lengths and null elements reduce the count, they do not null the
  * result.
  */
case class EqCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"eq_count expects (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) &&
        x.getUTF8String(i) == y.getUTF8String(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getUTF8String($i).equals($b.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): EqCount =
    copy(left = newLeft, right = newRight)
}

/** Native upper-triangle outer product over one `array<bigint>` column —
  * the codegen'd replacement for the nested
  * `flatten(transform(sequence(1, n), i -> transform(sequence(i, n), j ->
  * struct(i, j, q[i]*q[j]))))` that builds the Gram-matrix contribution of
  * one row (`embed_gram_matrix`): n(n+1)/2 products in row-major (i ≤ j)
  * order as ONE flat long array. The composable form allocates 2080
  * STRUCTS per row through interpreted lambdas (measured 2.0s exec at
  * sf0.1); this is one fused loop writing a primitive array, and the
  * (pos → i, j) mapping is attached AFTER aggregation by a report-sized
  * literal join, so the whole per-row path stays in whole-stage codegen.
  *
  * Exactness: integer multiplication — identical products in either
  * formulation; order is the row-major enumeration both formulations and
  * the oracle's unnest share. Null contract: null array → null; a null
  * ELEMENT nulls every product it touches in the composable form, so here
  * the whole result is null (the quantization transform upstream never
  * emits null elements — defensive only).
  */
case class OuterUpperI64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"outer_upper_i64 expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "outer_upper_i64"

  override def nullSafeEval(input: Any): Any =
    ArrayKernelUtil.outerUpperI64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ArrayKernelUtil.outerUpperI64($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OuterUpperI64 =
    copy(child = newChild)
}

object ArrayKernelUtil {
  /** Flat row-major upper triangle q_i·q_j (1 ≤ i ≤ j ≤ n); null on any
    * null element (see [[OuterUpperI64]]). */
  def outerUpperI64(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var k = 0
    while (k < n) { if (arr.isNullAt(k)) return null; k += 1 }
    val q = arr.toLongArray()
    val out = new Array[Long](n * (n + 1) / 2)
    var p = 0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) { out(p) = q(i) * q(j); p += 1; j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
