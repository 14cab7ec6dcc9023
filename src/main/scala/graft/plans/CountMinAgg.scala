package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count-Min sketch as a native Catalyst aggregate: a depth×width grid
  * of counters where every row increments one cell per hash row, and a
  * key's frequency estimate is the MIN of its depth cells — an upper
  * bound that over-counts only on collisions (Cormode & Muthukrishnan
  * '05).
  *
  * Why this shape at 100 TB: exact per-key counts of a high-cardinality
  * column (URLs, shingles, user ids) shuffle the full key set; the
  * sketch buffer is a CONSTANT depth×width longs (2 KiB at 4×64)
  * regardless of cardinality, merge is cell-wise add (commutative,
  * associative — partial aggregation and AQE re-partitioning cannot
  * change the result), and the finished sketch is a single row you
  * broadcast into the next pass to estimate any key's count without
  * touching the corpus again (q_sketch_cms_estimate does exactly that).
  *
  * Unlike Spark's built-in count_min_sketch (opaque binary, internal
  * Murmur3), the hash rows here are pairwise-independent
  * `((a_d · x' + b_d) mod p) mod width` with published constants,
  * p = 2^31−1 and x' = x & (2^31−1) — every product stays under 2^62,
  * so the whole sketch replays integer-exactly in any engine with
  * 64-bit arithmetic (the DuckDB oracle rebuilds the grid cell by
  * cell).
  *
  * Determinism: the grid is a pure function of the multiset of inputs;
  * no RNG, no iteration order, no float.
  */
case class CountMinAgg(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType || depthExpr.dataType != IntegerType ||
      widthExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "count_min(key, depth, width) needs (long, int, int), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else if (!depthExpr.foldable || !widthExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "count_min(key, depth, width): depth and width must be literals")
    else {
      val d = depthExpr.eval().asInstanceOf[Int]
      val w = widthExpr.eval().asInstanceOf[Int]
      if (d < 1 || d > CountMinAgg.A.length)
        TypeCheckResult.TypeCheckFailure(
          s"count_min depth must be in [1, ${CountMinAgg.A.length}], got $d")
      else if (w < 1)
        TypeCheckResult.TypeCheckFailure(s"count_min width must be >= 1, got $w")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Int]
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinAgg.cell(x, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), depthExpr = newChildren(1),
      widthExpr = newChildren(2))
}

object CountMinAgg {
  /** Per-row hash constants (a_d odd, b_d arbitrary, both < 2^31 so
    * a·x' + b < 2^62 + 2^31 — exact in a long AND in DuckDB BIGINT).
    */
  val A: Array[Long] = Array(1103515245L, 1299721L, 16777619L, 1000003L,
    69069L, 1664525L)
  val B: Array[Long] = Array(12345L, 54321L, 2531011L, 8675309L,
    362437L, 1013904223L)
  val P: Long = 2147483647L // 2^31 - 1
  val Mask: Long = 2147483647L

  /** Cell index of key x in hash row d: ((a_d·(x & mask) + b_d) mod p)
    * mod width. Public so point-estimate queries replay it.
    */
  def cell(x: Long, d: Int, width: Int): Int =
    (((A(d) * (x & Mask) + B(d)) % P) % width).toInt

  /** Column face: the flattened depth×width counter grid (row-major:
    * index = d·width + cell).
    */
  def countMin(key: Column, depth: Int, width: Int): Column =
    toColumn(
      CountMinAgg(toExpr(key), Literal(depth), Literal(width))
        .toAggregateExpression())

  /** SQL fragment for h_d(key) over a long column — the same
    * arithmetic as [[cell]], usable in both Spark SQL and the DuckDB
    * oracle.
    */
  def cellSql(keyCol: String, d: Int, width: Int): String =
    s"((${A(d)} * ($keyCol & $Mask) + ${B(d)}) % $P) % $width"
}
