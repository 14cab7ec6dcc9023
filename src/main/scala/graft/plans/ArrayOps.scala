package graft.plans

import graft.signal.Signal
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.bridge.{toColumn, toExpr}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Catalyst-native expressions for the similarity hot path (SURVEY §7.3
  * tier (b): custom Expression where built-ins interpret lambdas).
  *
  * `zip_with`+`aggregate` HOFs evaluate one boxed lambda call per
  * element; for a 64-float dot product inside an O(n·k) candidate scan
  * that interpretation dominates. These expressions compile to a tight
  * primitive loop inside WholeStageCodegen.
  */

/** dot(a, b) over two array<float|double|long> columns → double (long
  * elements accumulate in double — exact as long as every partial sum
  * stays under 2^53, which the ×2^20 quantization guarantees for
  * ≤64-dim vectors). Mismatched lengths use the shorter prefix; null
  * input → null.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
        ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot needs array<float|double|long> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    def get(arr: ArrayData, e: Expression, i: Int): Double = elemType(e) match {
      case FloatType => arr.getFloat(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case _ => arr.getDouble(i)
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(a, left, i) * get(b, right, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression, idx: String): String = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case LongType => s"(double) $arr.getLong($idx)"
        case _ => s"$arr.getDouble($idx)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left, i)} * ${get(b, right, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

/** WADA blind SNR (graft.signal.Signal.wadaSnr) as an expression:
  * no Scala-UDF encoder round-trip — ArrayData in, double out.
  * Interpreted eval only (the table interpolation isn't worth
  * hand-written codegen; the loop cost dominates either way).
  */
case class WadaSnrExpr(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wada_snr needs array<float|double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    Signal.wadaSnr(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arrCls = classOf[ArrayData].getName
      s"${ev.value} = graft.plans.WadaSnrExpr.evalArray(($arrCls) $c, " +
        s"${child.dataType.asInstanceOf[ArrayType].elementType == FloatType});"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wada_snr"
}

object WadaSnrExpr {
  /** Called from generated code. */
  def evalArray(arr: ArrayData, isFloat: Boolean): Double = {
    val out = new Array[Double](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    Signal.wadaSnr(out)
  }
}

/** Count of common elements of two SORTED array<long> columns — the
  * exact-verify core of the prefix-filtered pair joins
  * ([[graft.dedup.Dedup.ngramJaccardPairsPrefix]] /
  * `containmentPairs`). As a Scala UDF this boxed every element of
  * both shingle arrays per candidate pair (sf10 containment: 31M
  * candidates × ~300 longs ≈ 10¹⁰ boxed-Long allocations — measured
  * as ~80% of the operator's wall); as a native expression the merge
  * loop runs on primitive `ArrayData.getLong` inside WholeStageCodegen
  * with zero allocation. Inputs MUST be sorted ascending (the shingle
  * arrays are by construction); unsorted inputs silently undercount.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs array<long> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** Column-level API + SQL registration for the native expressions. */
object ArrayOps {

  def sorted_intersect_count(a: Column, b: Column): Column =
    toColumn(SortedIntersectCount(toExpr(a), toExpr(b)))

  def array_dot(a: Column, b: Column): Column =
    toColumn(ArrayDotProduct(toExpr(a), toExpr(b)))

  /** Codegen'd cosine from three native dots. */
  def array_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    array_dot(a, b) / (sqrt(array_dot(a, a)) * sqrt(array_dot(b, b)))
  }

  def wada_snr_native(c: Column): Column = toColumn(WadaSnrExpr(toExpr(c)))

  /** Register `array_dot` / `wada_snr` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wada_snr", exprs => WadaSnrExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_ids", exprs => BottomKIds(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min", exprs => CountMinAgg(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_order", exprs => ZOrderExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "script_counts", exprs => ScriptCountsExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fold_diacritics", exprs => FoldDiacriticsExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
  }
}
