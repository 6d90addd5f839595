package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Space-Saving frequent-items summary (Metwally/Agrawal/El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", 2005) with the mergeable-summaries merge rule (Agarwal et
  * al., "Mergeable Summaries", PODS 2012 — Space-Saving and
  * Misra-Gries summaries are isomorphic and mergeable with an
  * error-floor for absent keys).
  *
  * State is a bounded map key → (count, err): at most `capacity`
  * entries regardless of input size. Guarantees, with n = rows seen:
  *  - every key with true frequency > n/capacity is present;
  *  - for present keys, true ≤ count ≤ true + n/capacity, and
  *    count − err ≤ true (err is the possible overcount);
  *  - if the summary never evicted (distinct keys ≤ capacity across
  *    all partials), counts are EXACT and err = 0.
  */
final class SpaceSavingSummary(val capacity: Int) {
  /** key → Array(count, err); arrays are mutated in place on update. */
  val counts = new java.util.HashMap[Long, Array[Long]]()

  /** Amortized eviction support, standing in for the published
    * Stream-Summary's count-bucket list: a cached floor count plus a
    * queue of keys that sat at that floor when it was last scanned.
    * Evictions pop the queue (skipping entries whose count has moved
    * on) and only rescan when it drains; on the long-tail streams the
    * sketch exists for, one O(capacity) scan serves a batch of
    * evictions instead of every single one. */
  private var floorCount = 0L
  private var floorKeys: java.util.ArrayDeque[java.lang.Long] = null

  /** Smallest count in the summary — the eviction floor. 0 unless full. */
  private def minEntry(): (Long, Array[Long]) = {
    var mk = 0L
    var mv: Array[Long] = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (mv == null || e.getValue()(0) < mv(0)) { mk = e.getKey; mv = e.getValue }
    }
    (mk, mv)
  }

  private def refillFloorKeys(): Unit = {
    floorCount = Long.MaxValue
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c < floorCount) floorCount = c
    }
    if (floorKeys == null) floorKeys = new java.util.ArrayDeque[java.lang.Long]()
    val es = counts.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      if (e.getValue()(0) == floorCount) floorKeys.add(e.getKey)
    }
  }

  /** Pop a currently-at-floor entry, rescanning only when the cached
    * queue is stale-drained. */
  private def evictMin(): (Long, Array[Long]) = {
    while (true) {
      if (floorKeys == null || floorKeys.isEmpty) refillFloorKeys()
      val k = floorKeys.poll()
      val v = counts.get(k)
      // skip keys whose count moved past the cached floor (or that a
      // merge replaced) since the scan
      if (v != null && v(0) == floorCount) return (k.longValue(), v)
    }
    throw new IllegalStateException("unreachable")
  }

  def update(key: Long): Unit = update(key, 1L)

  /** Weighted increment (w > 0) — the ClickHouse `topKWeighted` form.
    * Identical to w unit updates collapsed into one step: a displaced
    * newcomer inherits the eviction floor as possible overcount, then
    * adds its whole weight. All [[SpaceSavingSummary]] guarantees hold
    * with n = total WEIGHT seen. */
  def update(key: Long, w: Long): Unit = {
    val cur = counts.get(key)
    if (cur != null) cur(0) += w
    else if (counts.size < capacity) counts.put(key, Array(w, 0L))
    else {
      // evict a min-count entry; the newcomer inherits its count as
      // possible overcount (the classic Space-Saving step)
      val (mk, mv) = evictMin()
      counts.remove(mk)
      counts.put(key, Array(mv(0) + w, mv(0)))
    }
  }

  /** Merges/deserialization mutate counts wholesale — drop the cache. */
  private def invalidateFloor(): Unit = { floorKeys = null; floorCount = 0L }

  /** Mergeable-summaries rule: a key absent from a FULL summary may
    * have been evicted with up to floor(min count) occurrences — add
    * that floor to both count and err for the side it's missing from,
    * then keep the top `capacity` merged entries. */
  def merge(other: SpaceSavingSummary): Unit = {
    val floorSelf = if (counts.size >= capacity) minEntry()._2(0) else 0L
    val floorOther =
      if (other.counts.size >= other.capacity) other.minEntry()._2(0) else 0L
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else counts.put(e.getKey,
        Array(e.getValue()(0) + floorSelf, e.getValue()(1) + floorSelf))
    }
    // keys we held that the other (full) summary may have evicted
    if (floorOther > 0) {
      val self = counts.entrySet().iterator()
      while (self.hasNext) {
        val e = self.next()
        if (!other.counts.containsKey(e.getKey)) {
          e.getValue()(0) += floorOther
          e.getValue()(1) += floorOther
        }
      }
    }
    if (counts.size > capacity) {
      val sorted = sortedEntries()
      counts.clear()
      sorted.take(capacity).foreach { case (k, cv) => counts.put(k, cv) }
    }
    invalidateFloor()
  }

  /** (count desc, key asc) — the deterministic output order. */
  def sortedEntries(): Seq[(Long, Array[Long])] = {
    import scala.jdk.CollectionConverters._
    counts.entrySet().asScala.toSeq
      .map(e => (e.getKey.longValue(), e.getValue))
      .sortBy { case (k, cv) => (-cv(0), k) }
  }
}

/** `topk_sketch(key, capacity, k)`: bounded-state approximate top-k —
  * the ClickHouse `topK(k)(col)` idiom as a first-class Catalyst
  * aggregate. Each partition builds a capacity-bounded
  * [[SpaceSavingSummary]] (map-side partial), partials merge
  * associatively, and the final summary emits the k heaviest keys as
  * `array<struct<item, cnt, err>>` sorted (cnt desc, item asc).
  *
  * The 100 TB story is the state bound: an exact top-k needs a full
  * groupBy(key) shuffle of every distinct key; this ships one
  * `capacity`-entry summary per partition regardless of input size —
  * the same reason ClickHouse offers topK next to ORDER BY count(*)
  * LIMIT k. With capacity ≥ distinct-key count the result is exact
  * (and the driver gate pins exactly that contract; the ScalaTest
  * property suite exercises the eviction path under skew).
  */
case class TopKSketchAgg(
    child: Expression,
    capacityExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Int]
  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_sketch key must be BIGINT, got ${child.dataType.catalogString}")
    else if (capacityExpr.dataType != IntegerType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_sketch capacity and k must be INT")
    else if (!capacityExpr.foldable || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "topk_sketch capacity and k must be literals")
    else if (capacityExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("topk_sketch capacity must be >= 1")
    else if (kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("topk_sketch k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketchAgg =
    copy(child = newChildren(0), capacityExpr = newChildren(1),
      kExpr = newChildren(2))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(
      buffer: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: SpaceSavingSummary,
      other: SpaceSavingSummary): SpaceSavingSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingSummary): Any =
    new GenericArrayData(buffer.sortedEntries().take(k).map {
      case (key, cv) => InternalRow(key, cv(0), cv(1))
    })

  // wire order is irrelevant (deserialize rebuilds the map; merge and
  // eval are order-independent) — iterate the map directly, no sort
  override def serialize(buffer: SpaceSavingSummary): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.counts.size * 24)
    bb.putInt(buffer.capacity)
    bb.putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val summary = new SpaceSavingSummary(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      summary.counts.put(bb.getLong, Array(bb.getLong, bb.getLong))
      i += 1
    }
    summary
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "topk_sketch"
}

/** `topk_weighted_sketch(key, weight, capacity, k)`: the ClickHouse
  * `topKWeighted(k)(col, weight)` idiom — [[SpaceSavingSummary]] with
  * weighted increments, so "top keys by summed BIGINT weight" (revenue,
  * bytes, token counts) ships the same one bounded `capacity`-entry
  * summary per partition per group instead of a full groupBy(key)
  * shuffle of every distinct key. Exactness contract and merge rule are
  * [[TopKSketchAgg]]'s with n = total weight. Rows with NULL key, NULL
  * weight, or weight <= 0 are skipped (Space-Saving's guarantees need
  * positive increments; ClickHouse's weight is unsigned by type). */
case class TopKWeightedSketchAgg(
    child: Expression,
    weightExpr: Expression,
    capacityExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Int]
  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_weighted_sketch key must be BIGINT, got ${child.dataType.catalogString}")
    else if (weightExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_weighted_sketch weight must be BIGINT, got ${weightExpr.dataType.catalogString}")
    else if (capacityExpr.dataType != IntegerType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_weighted_sketch capacity and k must be INT")
    else if (!capacityExpr.foldable || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "topk_weighted_sketch capacity and k must be literals")
    else if (capacityExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("topk_weighted_sketch capacity must be >= 1")
    else if (kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("topk_weighted_sketch k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] =
    Seq(child, weightExpr, capacityExpr, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKWeightedSketchAgg =
    copy(child = newChildren(0), weightExpr = newChildren(1),
      capacityExpr = newChildren(2), kExpr = newChildren(3))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("w", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(capacity)

  override def update(
      buffer: SpaceSavingSummary, input: InternalRow): SpaceSavingSummary = {
    val v = child.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null && w.asInstanceOf[Long] > 0L)
      buffer.update(v.asInstanceOf[Long], w.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: SpaceSavingSummary,
      other: SpaceSavingSummary): SpaceSavingSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: SpaceSavingSummary): Any =
    new GenericArrayData(buffer.sortedEntries().take(k).map {
      case (key, cv) => InternalRow(key, cv(0), cv(1))
    })

  override def serialize(buffer: SpaceSavingSummary): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.counts.size * 24)
    bb.putInt(buffer.capacity)
    bb.putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val summary = new SpaceSavingSummary(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      summary.counts.put(bb.getLong, Array(bb.getLong, bb.getLong))
      i += 1
    }
    summary
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKWeightedSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKWeightedSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "topk_weighted_sketch"
}

/** SQL registration + Column API for [[TopKSketchAgg]], same pattern as
  * [[vectors]]: one registry entry serves SQL and DataFrame users. */
object topk {
  // Widen ONLY a resolved integral key: byte/short/int → long is
  // lossless convenience, while a DOUBLE or STRING key must reach
  // checkInputDataTypes un-cast and FAIL analysis — an unconditional
  // Cast would truncate doubles and null strings silently, making the
  // 'key must be BIGINT' branch unreachable. Unresolved children
  // (dataType would throw) stay un-cast and resolve or fail later.
  private def widenIntegral(e: Expression): Expression =
    if (e.resolved && Seq(ByteType, ShortType, IntegerType)
        .contains(e.dataType)) Cast(e, LongType)
    else e

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "topk_sketch" -> { es => TopKSketchAgg(widenIntegral(es(0)), es(1), es(2)) },
    "topk_weighted_sketch" -> { es =>
      TopKWeightedSketchAgg(widenIntegral(es(0)), widenIntegral(es(1)),
        es(2), es(3)) })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.register(spark, builders)

  def topkSketch(key: org.apache.spark.sql.Column, capacity: Int,
      k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("topk_sketch", key,
      org.apache.spark.sql.functions.lit(capacity),
      org.apache.spark.sql.functions.lit(k))

  def topkWeighted(key: org.apache.spark.sql.Column,
      weight: org.apache.spark.sql.Column, capacity: Int,
      k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("topk_weighted_sketch",
      key, weight,
      org.apache.spark.sql.functions.lit(capacity),
      org.apache.spark.sql.functions.lit(k))
}
