package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries frequent-candidates summary (Misra/Gries, "Finding
  * repeated elements", 1982) with the mergeable-summaries reduce rule
  * (Agarwal/Cormode/Huang/Phillips/Wei/Yi, "Mergeable Summaries",
  * PODS 2012, §3): combine counters by summation, then subtract the
  * (capacity+1)-th largest count from every counter and drop the
  * non-positive ones.
  *
  * The PODS'12 theorem is the load-bearing guarantee: under ARBITRARY
  * merge trees (Spark's partial → shuffle → final aggregation order is
  * nondeterministic), every prune subtracts some δ from all counters
  * while at least capacity+1 counters held ≥ δ, so the total mass
  * removed per prune is ≥ δ·(capacity+1) and Σδ ≤ W/(capacity+1)
  * where W is the total weight seen. Hence for every key:
  *
  *   true(key) − W/(capacity+1)  ≤  count(key)  ≤  true(key)
  *
  * and in particular EVERY key with true weight > W/(capacity+1) is
  * present in the summary — merge-order-independently. That
  * completeness bound is what makes a fixed, corpus-independent
  * capacity gateable: a second exact pass over the (bounded,
  * broadcastable) candidate set recovers the EXACT deterministic set
  * {key : true(key)·T > W} for any threshold factor T ≤ capacity,
  * whatever order the partials merged in. See
  * [[graft.operators.Analytics.q32ApproxTopK]] for the two-pass gate.
  *
  * Implementation detail: the map is allowed to grow to 2·capacity
  * between prunes, so the O(capacity) prune amortizes to O(1) per
  * distinct key instead of running on every eviction (each prune
  * removes at least capacity entries on a unique-heavy tail). The
  * summary therefore holds at most 2·capacity entries at any moment —
  * still corpus-independent.
  */
final class MgSummary(val capacity: Int) {
  /** key → Array(count); the array is mutated in place. */
  val counts = new java.util.HashMap[Long, Array[Long]]()

  def update(key: Long, w: Long): Unit = {
    // zero is a no-op; NEGATIVE weight is rejected LOUDLY: the
    // completeness bound is stated against total weight W, and a
    // consumer computing W = sum(w) over a stream with refunds would
    // hold a smaller W than the positive mass this summary saw — a
    // key could then clear W/(capacity+1) without being guaranteed
    // present. Silently skipping (the display-surface topKWeighted
    // convention) is not safe where the bound is load-bearing.
    require(w >= 0L, s"mg_candidates weight must be >= 0, got $w")
    if (w == 0L) return
    val cur = counts.get(key)
    if (cur != null) cur(0) += w
    else {
      counts.put(key, Array(w))
      if (counts.size > 2 * capacity) prune()
    }
  }

  /** PODS'12 reduce: subtract the (capacity+1)-th largest count from
    * every counter, drop non-positives. Survivors have count strictly
    * above that order statistic, so at most `capacity` remain. */
  private def prune(): Unit = {
    val n = counts.size
    if (n <= capacity) return
    val arr = new Array[Long](n)
    var i = 0
    val it = counts.values().iterator()
    while (it.hasNext) { arr(i) = it.next()(0); i += 1 }
    java.util.Arrays.sort(arr)
    val delta = arr(n - capacity - 1) // (capacity+1)-th largest
    val es = counts.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      e.getValue()(0) -= delta
      if (e.getValue()(0) <= 0L) es.remove()
    }
  }

  /** Merge = counter summation + the same reduce; the bound composes
    * because a merge is just the union stream's summary (PODS'12). */
  def merge(other: MgSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0)
      else {
        counts.put(e.getKey, Array(e.getValue()(0)))
        if (counts.size > 2 * capacity) prune()
      }
    }
  }

  /** Candidate keys, ascending — deterministic wire/output shape (the
    * SET itself is merge-order-dependent beyond the guaranteed heavy
    * keys; consumers must re-verify, see the class doc). */
  def sortedKeys(): Array[Long] = {
    val out = new Array[Long](counts.size)
    var i = 0
    val it = counts.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** `mg_candidates(key, weight, capacity)`: bounded-state heavy-hitter
  * CANDIDATE generation — emits the [[MgSummary]] key set as
  * `array<bigint>` (≤ 2·capacity items). Unlike
  * [[TopKSketchAgg]] (the ClickHouse `topK` display surface, whose
  * per-key counts are overestimates with merge-order-dependent error),
  * this surface promises exactly one thing, and promises it under any
  * merge order: every key whose true summed weight exceeds
  * W/(capacity+1) is in the array. Pair it with a bounded exact
  * recount of the candidates to get a deterministic guaranteed-heavy-
  * hitters operator at fixed capacity — the 100 TB shape, since the
  * per-partition state never depends on corpus cardinality. */
case class MgCandidatesAgg(
    child: Expression,
    weightExpr: Expression,
    capacityExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_candidates key must be BIGINT, got ${child.dataType.catalogString}")
    else if (weightExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_candidates weight must be BIGINT, got ${weightExpr.dataType.catalogString}")
    else if (capacityExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("mg_candidates capacity must be INT")
    else if (!capacityExpr.foldable)
      TypeCheckResult.TypeCheckFailure("mg_candidates capacity must be a literal")
    else if (capacityExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("mg_candidates capacity must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, weightExpr, capacityExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgCandidatesAgg =
    copy(child = newChildren(0), weightExpr = newChildren(1),
      capacityExpr = newChildren(2))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val k = child.eval(input)
    val w = weightExpr.eval(input)
    if (k != null && w != null)
      buffer.update(k.asInstanceOf[Long], w.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MgSummary, other: MgSummary): MgSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MgSummary): Any =
    new GenericArrayData(buffer.sortedKeys())

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.counts.size * 16)
    bb.putInt(buffer.capacity)
    bb.putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue()(0))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val summary = new MgSummary(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      summary.counts.put(bb.getLong, Array(bb.getLong))
      i += 1
    }
    summary
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgCandidatesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgCandidatesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "mg_candidates"
}

object heavyhitters {
  private def widenIntegral(e: Expression): Expression =
    if (e.resolved && Seq(ByteType, ShortType, IntegerType)
        .contains(e.dataType)) Cast(e, LongType)
    else e

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq("mg_candidates" -> { es =>
      MgCandidatesAgg(widenIntegral(es(0)), widenIntegral(es(1)), es(2)) })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.register(spark, builders)

  def mgCandidates(key: org.apache.spark.sql.Column,
      weight: org.apache.spark.sql.Column,
      capacity: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("mg_candidates", key, weight,
      org.apache.spark.sql.functions.lit(capacity))
}
