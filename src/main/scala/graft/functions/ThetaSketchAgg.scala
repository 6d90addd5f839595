package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch: the k SMALLEST distinct
  * hash values seen. The bounded analog of a theta sketch — ClickHouse
  * `uniqTheta`'s substrate — with the properties the set-algebra tier
  * needs:
  *
  *  - bounded: at most k longs per group per partition, ever;
  *  - mergeable: union-then-trim is associative and commutative, and
  *    trim can never change which elements WOULD survive a different
  *    merge order (the k smallest of a multiset union are
  *    order-independent), so any partial/merge tree yields the
  *    identical sketch;
  *  - exact below capacity: while the true distinct count ≤ k the
  *    sketch IS the distinct hash set, so set operations
  *    (intersect/union sizes) computed on two sketches are exact;
  *  - estimating above capacity: with u_k = (k-th smallest)/2^60,
  *    N̂ = (k−1)/u_k (the classic KMV estimator — property-tested).
  */
final class KmvSketch(val cap: Int) {
  val keys = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit =
    if (keys.size < cap) { keys.add(h); () }
    else if (h < keys.last) { if (keys.add(h)) { keys.pollLast(); () } }

  def merge(o: KmvSketch): Unit = {
    val it = o.keys.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** `theta_sketch(key, k)`: the sketch as a SORTED ascending
  * `array<bigint>` — a deterministic value (the k smallest distinct
  * hashes have one canonical form), so sketches are comparable across
  * engines and the DuckDB oracle can replay the exact regime
  * bit-for-bit. Set algebra then runs on the ARRAYS with builtin
  * array functions — ClickHouse's `uniqThetaIntersect`/`Union`/`Not`
  * shape — touching only ≤ k·groups values however large the corpus:
  * the whole point vs q47's exact bitmap algebra, whose exchange
  * carries one row per distinct member. */
case class ThetaSketchAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"theta_sketch key must be BIGINT, got ${child.dataType.catalogString}")
    else if (kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("theta_sketch k must be INT")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("theta_sketch k must be a literal")
    else if (kExpr.eval().asInstanceOf[Int] < 2)
      TypeCheckResult.TypeCheckFailure("theta_sketch k must be >= 2")
    else if (kExpr.eval().asInstanceOf[Int] > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        "theta_sketch k must be <= 2^20 (the state bound is the point)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(buffer: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvSketch, other: KmvSketch): KmvSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KmvSketch): Any = {
    val arr = new Array[Any](buffer.keys.size)
    val it = buffer.keys.iterator() // TreeSet: ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: KmvSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.keys.size * 8)
    bb.putInt(buffer.cap)
    bb.putInt(buffer.keys.size)
    val it = buffer.keys.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val sk = new KmvSketch(bb.getInt)
    val sz = bb.getInt
    var i = 0
    while (i < sz) { sk.keys.add(bb.getLong); i += 1 }
    sk
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "theta_sketch"
}

/** SQL registration + Column API for [[ThetaSketchAgg]], plus the KMV
  * estimator as a column form over a sketch array. */
object thetasketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.functions._

  private def widenIntegral(e: Expression): Expression =
    if (e.resolved && Seq(ByteType, ShortType, IntegerType)
        .contains(e.dataType)) Cast(e, LongType)
    else e

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "theta_sketch" -> { es => ThetaSketchAgg(widenIntegral(es(0)), es(1)) })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.register(spark, builders)

  def thetaSketch(key: Column, k: Int): Column =
    call_function("theta_sketch", key, lit(k))

  /** KMV distinct estimate from a sketch array built with capacity k:
    * exact size below capacity; (k−1)/u_k above, u_k = kth/2^60. */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(sketch, k).cast("double") / lit(math.pow(2, 60))))
}
