package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) materializes the
  * product array per row and walks lambda closures; this expression is
  * a single fused loop over the two unsafe arrays, generated into
  * whole-stage codegen. Semantics are the identical sequential left
  * fold in double, so results are bit-equal to the HOF form (and to the
  * DuckDB oracle's `list_inner_product` — verified in CORRECTNESS).
  *
  * This is the similarity kernel of the engine: at 2M candidate pairs ×
  * 64 dims per partition it is the difference between allocation-bound
  * and FLOP-bound execution.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // dimension mismatch yields NULL — the same answer the HOF form
  // (zip_with null-pads the shorter array) gives. Truncating to
  // min(length) would return a confidently wrong partial dot for e.g.
  // a corpus mixing two embedding-model versions; NULL surfaces the
  // data bug instead of masking it. A null ELEMENT likewise yields
  // NULL (the HOF's null-propagating sum) instead of getDouble's
  // silent 0.0 contribution — and the per-element branch is emitted
  // ONLY when the static element type admits nulls, so null-free
  // schemas keep the tight two-term loop.
  override def nullable: Boolean = true

  // plan-constant; lazy so the interpreted path doesn't re-derive it
  // (and allocate) per row
  @transient private lazy val mayHaveNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElements
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullBreak = if (mayHaveNullElements) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullBreak
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Validate-and-narrow for embedding vectors: asserts every element is
  * non-null ONCE, and re-types `array<double>` (nullable elements — the
  * parquet default) to `array<double>` with `containsNull = false`.
  *
  * Why it exists: [[DotProduct]] emits a per-element null branch only
  * when the static element type admits nulls. Candidate-join kernels
  * evaluate O(pairs) dot products per row pair, so a null check there
  * costs per PAIR; this expression moves it to vector-preparation time
  * — O(rows) — and the narrowed type lets every downstream kernel
  * compile the tight two-term loop. A null component throws (same loud
  * policy as `hyperplane_bucket` / `nearest_cells`: silently zeroing a
  * vector slot mis-scores every pair it touches). Valid data passes
  * through by reference — no copy. Already-dense inputs skip the scan
  * entirely (statically).
  */
case class DenseDoubleArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dense_double_array expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val needScan: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (needScan) {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"dense_double_array: null vector component at index $i")
        i += 1
      }
    }
    arr
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val err = "\"dense_double_array: null vector component at index \""
      val guard = if (needScan) {
        s"""
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i))
           |    throw new IllegalArgumentException($err + $i);
           |}
         """.stripMargin
      } else ""
      s"""
         |$guard
         |${ev.value} = $a;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DenseDoubleArray =
    copy(child = c)
  override def prettyName: String = "dense_double_array"
}

object DenseDoubleArray {
  def apply(v: Column): Column =
    GraftSqlBridge.column(DenseDoubleArray(GraftSqlBridge.expression(v)))
}
