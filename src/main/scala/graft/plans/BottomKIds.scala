package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic per-group bottom-k sampler as a NATIVE Catalyst
  * aggregate (SURVEY §7.3 tier (b): the third kind of Catalyst
  * extension this engine ships, alongside scalar expressions
  * [[ArrayDotProduct]] and the whole-operator plan
  * [[graft.plans.TopKPerKey]]).
  *
  * Semantics: of a group's ids, keep the k whose salted md5
  * `md5(salt + ":" + id)` sorts LOWEST (ties broken by the id string),
  * returned as an array sorted by (hash, id) ascending. Because the
  * selection key is a pure function of (salt, id), the sample is a
  * uniform-without-replacement draw that is reproducible across
  * engines, partitionings, and retries — the same property
  * graft.text.Sampling exploits for Bernoulli sampling, here in
  * exact-k per-group form (reference analog: the per-channel video
  * cap, channel_crawler.py:116-124, made deterministic).
  *
  * Why an aggregate and not a window: row_number() over
  * (PARTITION BY g ORDER BY hash) shuffles and SORTS every row of
  * every group only to discard all but k. This aggregate carries a
  * bounded k-element heap through partial aggregation — map-side
  * combine caps every partial buffer at k, so the shuffle moves
  * O(groups × k) bytes instead of the corpus, and nothing is ever
  * globally sorted. At 100 TB that is the difference between a
  * full-corpus sort and a metadata-sized exchange.
  *
  * The buffer is a max-heap (scala PriorityQueue, natural (String,
  * String) tuple order) holding the k smallest seen: an incoming id
  * replaces the heap head iff it sorts below it; merge folds the
  * smaller heap into the larger. update/merge/eval are all O(log k)
  * per element.
  */
case class BottomKIds(
    child: Expression,
    saltExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]] {

  override def children: Seq[Expression] = Seq(child, saltExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bottom_k_ids"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType || saltExpr.dataType != StringType ||
      kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "bottom_k_ids(id, salt, k) needs (string, string, int), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else if (!saltExpr.foldable || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bottom_k_ids(id, salt, k): salt and k must be literals")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("bottom_k_ids needs k >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val salt: String =
    saltExpr.eval().asInstanceOf[UTF8String].toString
  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
    mutable.PriorityQueue.empty[(String, String)]

  override def update(
      buf: mutable.PriorityQueue[(String, String)],
      input: InternalRow): mutable.PriorityQueue[(String, String)] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[UTF8String].toString
      val t = (DigestUtils.md5Hex(salt + ":" + id), id)
      if (buf.size < k) buf.enqueue(t)
      else if (Ordering[(String, String)].lt(t, buf.head)) {
        buf.dequeue(); buf.enqueue(t)
      }
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(String, String)],
      b: mutable.PriorityQueue[(String, String)]): mutable.PriorityQueue[(String, String)] = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.foreach { t =>
      if (into.size < k) into.enqueue(t)
      else if (Ordering[(String, String)].lt(t, into.head)) {
        into.dequeue(); into.enqueue(t)
      }
    }
    into
  }

  override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
    new GenericArrayData(
      buf.toArray.sorted.map(t => UTF8String.fromString(t._2)))

  override def serialize(buf: mutable.PriorityQueue[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, id) => out.writeUTF(h); out.writeUTF(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readUTF(), in.readUTF())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), saltExpr = newChildren(1), kExpr = newChildren(2))
}

object BottomKIds {
  /** Column face: deterministic k-sample of `id` (any type; cast to
    * string by the caller for cross-engine stability) per group.
    */
  def bottomKIds(id: Column, salt: String, k: Int): Column =
    toColumn(
      BottomKIds(
        toExpr(id),
        Literal(UTF8String.fromString(salt), StringType),
        Literal(k)
      ).toAggregateExpression())
}
