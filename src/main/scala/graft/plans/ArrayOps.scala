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

/** ×2^20 round-half-away-from-zero quantizer: array<float> →
  * array<long> on the exact grid every similarity oracle replays
  * (`CAST(round(CAST(x AS DOUBLE) * 1048576.0, 0) AS BIGINT)`). The
  * products are exactly representable doubles, so `x + 0.5` floored
  * (x ≥ 0) / `x - 0.5` ceiled equals round() in both engines. A
  * per-row primitive loop inside WholeStageCodegen — this pass runs
  * corpus-sized in every quantized-cosine dedup path, where the
  * Scala-UDF form paid a Seq[Float] boxing round-trip per row.
  */
case class QuantizeExpr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_1m needs array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble * 1048576.0d
      out(i) = (if (x >= 0) x + 0.5d else x - 0.5d).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $v.getFloat($i) * 1048576.0D;
         |  $out[$i] = (long) ($x >= 0 ? $x + 0.5D : $x - 0.5D);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantize_1m"
}

/** Sign-random-projection LSH bucket ids, one per hash table:
  * quantize the vector to the ×2^20 HALF_UP grid, dot it against
  * `bits` integer hyperplanes per table (rows t·bits+i of the shared
  * plane grid, embedded flattened at `(t·bits+i)·dimCap + j`), and
  * set bit i of table t's bucket when the EXACT long dot is ≥ 0 — no
  * float sign decision anywhere, so bucket ids stay engine-portable.
  * Replaces the Scala-UDF form, which paid per-row Seq[Float] boxing
  * AND re-derived every plane component by hashing (XXH64 per (i, j)
  * per row); here the planes are plan metadata computed once.
  * Vectors longer than `dimCap` fail loudly — widen the cap at the
  * call site rather than silently truncating the projection.
  */
case class SignLshExpr(
    child: Expression,
    planes: Array[Long],
    tables: Int,
    bits: Int,
    dimCap: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh needs array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n > dimCap) throw new IllegalArgumentException(
      s"sign_lsh: vector has $n dims > plane cap $dimCap — raise dimCap")
    val q = new Array[Long](n)
    var j = 0
    while (j < n) {
      val x = v.getFloat(j).toDouble * 1048576.0d
      q(j) = (if (x >= 0) x + 0.5d else x - 0.5d).toLong
      j += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        val base = (t * bits + i) * dimCap
        var s = 0L
        j = 0
        while (j < n) { s += q(j) * planes(base + j); j += 1 }
        if (s >= 0L) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "long[]")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |if ($n > $dimCap) throw new IllegalArgumentException(
         |  "sign_lsh: vector has " + $n + " dims > plane cap $dimCap — raise dimCap");
         |long[] $q = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  double $x = (double) $v.getFloat($j) * 1048576.0D;
         |  $q[$j] = (long) ($x >= 0 ? $x + 0.5D : $x - 0.5D);
         |}
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    int $base = ($t * $bits + $i) * $dimCap;
         |    long $s = 0L;
         |    for (int $j = 0; $j < $n; $j++) { $s += $q[$j] * $pl[$base + $j]; }
         |    if ($s >= 0L) $bucket |= (1L << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_lsh"
}

/** Johnson–Lindenstrauss integer projection (the randomProject core):
  * y_i = Σ_j q(x_j)·planes[i·dimCap + j] over the ×2^20 HALF_UP
  * quantized vector — [[SignLshExpr]] WITHOUT the drop to sign bits,
  * sharing its embedded-plane/exact-integer discipline. Same
  * bounds: |term| < 2^41, 64-dim sums < 2^47 — exact longs on any
  * engine.
  */
case class JlProjectExpr(
    child: Expression,
    planes: Array[Long],
    outDims: Int,
    dimCap: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jl_project needs array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n > dimCap) throw new IllegalArgumentException(
      s"jl_project: vector has $n dims > plane cap $dimCap — raise dimCap")
    val q = new Array[Long](n)
    var j = 0
    while (j < n) {
      val x = v.getFloat(j).toDouble * 1048576.0d
      q(j) = (if (x >= 0) x + 0.5d else x - 0.5d).toLong
      j += 1
    }
    val out = new Array[Long](outDims)
    var i = 0
    while (i < outDims) {
      val base = i * dimCap
      var s = 0L
      j = 0
      while (j < n) { s += q(j) * planes(base + j); j += 1 }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("jlPlanes", planes, "long[]")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      s"""
         |int $n = $v.numElements();
         |if ($n > $dimCap) throw new IllegalArgumentException(
         |  "jl_project: vector has " + $n + " dims > plane cap $dimCap — raise dimCap");
         |long[] $q = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  double $x = (double) $v.getFloat($j) * 1048576.0D;
         |  $q[$j] = (long) ($x >= 0 ? $x + 0.5D : $x - 0.5D);
         |}
         |long[] $out = new long[$outDims];
         |for (int $i = 0; $i < $outDims; $i++) {
         |  int $base = $i * $dimCap;
         |  long $s = 0L;
         |  for (int $j = 0; $j < $n; $j++) { $s += $q[$j] * $pl[$base + $j]; }
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "jl_project"
}

/** PQ / k-means encoder: per subspace `s`, the argmin code over `k`
  * codebook entries of the identical-order squared-L2 chain (strict
  * `<`, so ties go to the smallest code — the Lloyd-assignment
  * contract every oracle replays). The codebook ships flattened
  * (`((s·k)+c)·sd + j`) inside the expression — m·k·sd doubles of
  * plan metadata, broadcast with the task binary — and the whole
  * encode runs as a primitive loop inside WholeStageCodegen: the
  * corpus-sized encode pass previously paid a Scala-UDF Seq[Float]
  * boxing round-trip per row (the dominant cost of pqBuild/ivfBuild
  * after their Lloyd training went sample-bounded).
  *
  * IVF assignment is the m=1 special case (one subspace spanning the
  * full dimension, k=nLists): element 0 of the result is the list id.
  */
case class PqEncodeExpr(
    child: Expression,
    flat: Array[Double],
    m: Int,
    k: Int,
    sd: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vbase = s * sd
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cbase = (s * k + c) * sd
        var d = 0.0
        var j = 0
        while (j < sd) {
          val t = v.getFloat(vbase + j).toDouble - flat(cbase + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val cbase = ctx.freshName("cbase")
      val vbase = ctx.freshName("vbase")
      s"""
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $vbase = $s * $sd;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $cbase = ($s * $k + $c) * $sd;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      double $t = (double) $v.getFloat($vbase + $j) - $cb[$cbase + $j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Single-pass text normalizer — the
  * [[graft.text.TextAnalysis.normalizedText]] contract (lowercase,
  * strip the four ASCII punctuation ranges, collapse whitespace runs
  * to one space, trim) as ONE compiled byte loop instead of two full
  * regex passes + lower + trim. This key pass runs corpus-sized in
  * every normalized-dedup path (exactNormalized, softDedupWeights,
  * decontamination). ASCII inputs take the byte loop; any non-ASCII
  * byte falls back to the EXACT builtin composition (UTF8String
  * toLowerCase → the same two java.util.regex patterns → trim), so
  * results are byte-identical on every input — NormalizeTextSpec pins
  * equality against the composed form, and the md5-keyed oracles
  * replay unchanged.
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.evalNorm(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.NormalizeTextExpr.evalNorm($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeTextExpr {
  // the exact patterns of the composed form (TextAnalysis.normalizedText)
  private val punct = java.util.regex.Pattern.compile("[!-/:-@\\[-`{-~]")
  private val ws = java.util.regex.Pattern.compile("\\s+")

  private def isPunct(c: Int): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  // java.util.regex \s without UNICODE_CHARACTER_CLASS: [ \t\n\x0B\f\r]
  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** Called from generated code. */
  def evalNorm(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = u.numBytes()
    // ASCII probe + fast path: one pass, output can only shrink
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if (u.getByte(i) < 0) ascii = false
      i += 1
    }
    if (!ascii) {
      // exact builtin composition for non-ASCII inputs
      val lowered = u.toLowerCase.toString
      val s = ws.matcher(punct.matcher(lowered).replaceAll("")).replaceAll(" ")
      return org.apache.spark.unsafe.types.UTF8String.fromString(s).trim()
    }
    val out = new Array[Byte](n)
    var w = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val b = u.getByte(i)
      val c = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      if (isWs(c)) pendingSpace = true
      else if (!isPunct(c)) {
        if (pendingSpace && w > 0) { out(w) = ' '; w += 1 }
        pendingSpace = false
        out(w) = c
        w += 1
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out, 0, w)
  }
}

/** Column-level API + SQL registration for the native expressions. */
object ArrayOps {

  /** Native one-pass normalizer (see [[NormalizeTextExpr]]). */
  def normalize_text(c: Column): Column = toColumn(NormalizeTextExpr(toExpr(c)))

  /** Native ×2^20 quantizer (see [[QuantizeExpr]]). */
  def quantize_1m(v: Column): Column = toColumn(QuantizeExpr(toExpr(v)))

  /** Native multi-table sign-LSH buckets (see [[SignLshExpr]]);
    * `planes` is the flattened (tables·bits)×dimCap integer grid.
    */
  def sign_lsh_buckets(
      v: Column, planes: Array[Long], tables: Int, bits: Int, dimCap: Int): Column =
    toColumn(SignLshExpr(toExpr(v), planes, tables, bits, dimCap))

  /** Native JL integer projection (see [[JlProjectExpr]]). */
  def jl_project(
      v: Column, planes: Array[Long], outDims: Int, dimCap: Int): Column =
    toColumn(JlProjectExpr(toExpr(v), planes, outDims, dimCap))

  /** Native PQ encode: array<float> → array<int> of `m` codes under
    * `codebooks(s)(c)(d)`. The codebook snapshot is flattened at call
    * time, so later mutation of the caller's arrays cannot leak in.
    */
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sd = codebooks(0)(0).length
    val flat = new Array[Double](m * k * sd)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(s)(c), 0, flat, (s * k + c) * sd, sd)
        c += 1
      }
      s += 1
    }
    toColumn(PqEncodeExpr(toExpr(v), flat, m, k, sd))
  }

  /** Native k-means assignment (IVF): the m=1 PQ-encode special case —
    * argmin centroid index over the full dimension, smallest-index
    * ties.
    */
  def kmeans_assign(v: Column, centroids: Array[Array[Double]]): Column =
    pq_encode(v, Array(centroids)).getItem(0)

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
