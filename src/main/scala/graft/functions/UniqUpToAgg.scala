package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Bounded distinct set for `uniq_upto(key, n)`: at most `cap = n + 1`
  * stored keys. Once the set holds n + 1 keys the true distinct count
  * is proven > n and inserts become no-ops — the state can never shrink
  * or un-prove, so the reported `min(size, n + 1)` is correct under ANY
  * add/merge interleaving: a final size < cap means no insert was ever
  * dropped (drops only happen at cap, and cap persists), so the set is
  * the exact distinct set; a final size = cap means the true count is
  * ≥ cap. */
final class BoundedDistinctSet(val cap: Int) {
  val keys = new java.util.HashSet[java.lang.Long]()

  def add(k: Long): Unit = if (keys.size < cap) { keys.add(k); () }

  def merge(other: BoundedDistinctSet): Unit = {
    val it = other.keys.iterator()
    while (it.hasNext && keys.size < cap) { keys.add(it.next()); () }
  }
}

/** `uniq_upto(key, n)`: EXACT distinct count while it is ≤ n, else
  * n + 1 — the ClickHouse `uniqUpTo(N)(col)` idiom, which Spark has no
  * native form of (`count(DISTINCT …)` shuffles every distinct key;
  * `approx_count_distinct` never answers exactly). The use case is
  * "did this group exceed N distinct?" gating (fan-out caps, abuse
  * thresholds, small-cardinality reporting) where per-group state must
  * stay bounded: each partition carries at most n + 1 longs per group
  * however large the corpus, partials merge associatively, and the
  * answer is exact in the only range anyone reads it in. */
case class UniqUpToAgg(
    child: Expression,
    nExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedDistinctSet] {

  private lazy val n: Int = nExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"uniq_upto key must be BIGINT, got ${child.dataType.catalogString}")
    else if (nExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("uniq_upto n must be INT")
    else if (!nExpr.foldable)
      TypeCheckResult.TypeCheckFailure("uniq_upto n must be a literal")
    else if (nExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("uniq_upto n must be >= 1")
    else if (nExpr.eval().asInstanceOf[Int] > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        "uniq_upto n must be <= 2^20 (the state bound is the point)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, nExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UniqUpToAgg =
    copy(child = newChildren(0), nExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): BoundedDistinctSet =
    new BoundedDistinctSet(n + 1)

  override def update(
      buffer: BoundedDistinctSet, input: InternalRow): BoundedDistinctSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: BoundedDistinctSet,
      other: BoundedDistinctSet): BoundedDistinctSet = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: BoundedDistinctSet): Any =
    buffer.keys.size.toLong

  override def serialize(buffer: BoundedDistinctSet): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.keys.size * 8)
    bb.putInt(buffer.cap)
    bb.putInt(buffer.keys.size)
    val it = buffer.keys.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedDistinctSet = {
    val bb = ByteBuffer.wrap(bytes)
    val set = new BoundedDistinctSet(bb.getInt)
    val sz = bb.getInt
    var i = 0
    while (i < sz) { set.keys.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "uniq_upto"
}

/** SQL registration + Column API for [[UniqUpToAgg]], same pattern as
  * [[topk]]. Integral keys widen to BIGINT; anything else fails
  * analysis (see [[topk.builders]] for the rationale). */
object uniqupto {
  import org.apache.spark.sql.catalyst.expressions.Cast

  private def widenIntegral(e: Expression): Expression =
    if (e.resolved && Seq(ByteType, ShortType, IntegerType)
        .contains(e.dataType)) Cast(e, LongType)
    else e

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "uniq_upto" -> { es => UniqUpToAgg(widenIntegral(es(0)), es(1)) })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.register(spark, builders)

  def uniqUpTo(key: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("uniq_upto", key,
      org.apache.spark.sql.functions.lit(n))
}
