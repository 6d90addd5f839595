package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019) — the true mergeable substrate of
  * ClickHouse `quantileTDigest`, complementing q50's GK summary:
  *
  *  - bounded: ≤ ~2δ centroids after compression plus a fixed-size
  *    ingest buffer, whatever the input size — the per-partition /
  *    per-group state an executor ships is O(δ);
  *  - mergeable: merging digests = feeding one's centroids into the
  *    other and re-compressing. Centroid SETS are not bit-identical
  *    across merge orders (inherent to t-digest — unlike
  *    [[KmvSketch]], compression is history-dependent), so the
  *    merge-order property the spec pins is the PUBLISHED one: every
  *    quantile estimate stays inside the k1 rank-error envelope
  *    (cluster weight ≤ ~4·n·q(1−q)/δ) for ANY partition/merge tree;
  *  - accurate at the tails: the k1 scale function
  *    k(q) = δ/(2π)·asin(2q−1) concentrates centroids near q→0/1,
  *    which is why t-digest is the serving-layer sketch for p99s.
  *
  * The gate (q50b) therefore never hashes raw estimates: like q50, it
  * emits the EXACT integer quantiles plus a rank-window boolean the
  * oracle asserts TRUE — the cross-engine-stable contract for an
  * approximate structure.
  */
final class TDigest(val compression: Double) {
  private[functions] var means = new Array[Double](0)
  private[functions] var weights = new Array[Long](0)
  private[functions] var total = 0L

  private val bufCap = math.max(64, (4 * compression).toInt)
  private var bufM = new Array[Double](bufCap)
  private var bufW = new Array[Long](bufCap)
  private var bufN = 0

  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  def add(x: Double, w: Long = 1L): Unit = {
    if (bufN == bufCap) compress()
    bufM(bufN) = x; bufW(bufN) = w; bufN += 1
    if (x < min) min = x
    if (x > max) max = x
  }

  def mergeIn(o: TDigest): Unit = {
    o.compress()
    var i = 0
    while (i < o.means.length) { add(o.means(i), o.weights(i)); i += 1 }
    if (o.min < min) min = o.min
    if (o.max > max) max = o.max
  }

  def centroidCount: Int = { compress(); means.length }

  private def scale(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
  private def invScale(k: Double): Double = {
    val kc = math.max(-compression / 4, math.min(compression / 4, k))
    (math.sin(2 * math.Pi * kc / compression) + 1) / 2
  }

  /** Fold the buffer into the centroid list: one sorted merge pass,
    * emitting a new centroid whenever absorbing the next point would
    * push the cluster past the k1 q-limit. Deterministic given the
    * (mean, weight) multiset being merged. */
  def compress(): Unit = {
    if (bufN == 0) return
    val n = means.length + bufN
    val pairs = new Array[(Double, Long)](n)
    var i = 0
    while (i < means.length) { pairs(i) = (means(i), weights(i)); i += 1 }
    var j = 0
    while (j < bufN) { pairs(i + j) = (bufM(j), bufW(j)); j += 1 }
    java.util.Arrays.sort(pairs, Ordering.by((p: (Double, Long)) => p._1))
    var tot = 0L
    i = 0
    while (i < n) { tot += pairs(i)._2; i += 1 }
    val outM = new scala.collection.mutable.ArrayBuffer[Double](n)
    val outW = new scala.collection.mutable.ArrayBuffer[Long](n)
    var wSoFar = 0L
    var curM = pairs(0)._1
    var curW = pairs(0)._2
    var qLimit = invScale(scale(0.0) + 1)
    i = 1
    while (i < n) {
      val (m, w) = pairs(i)
      val projQ = (wSoFar + curW + w).toDouble / tot
      if (projQ <= qLimit) {
        // weighted-mean absorb
        curM += (m - curM) * w / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW
        wSoFar += curW
        qLimit = invScale(scale(wSoFar.toDouble / tot) + 1)
        curM = m; curW = w
      }
      i += 1
    }
    outM += curM; outW += curW
    means = outM.toArray
    weights = outW.toArray
    total = tot
    bufN = 0
  }

  /** Quantile by cumulative-midpoint interpolation, min/max-anchored
    * at the edges (the standard t-digest read-out). */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val index = q * total
    val firstMid = weights(0) / 2.0
    if (index <= firstMid)
      return min + (if (firstMid > 0) index / firstMid * (means(0) - min) else 0.0)
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val mid = cum + weights(i) / 2.0
      val nextMid = cum + weights(i) + weights(i + 1) / 2.0
      if (index < nextMid) {
        val frac = (index - mid) / (nextMid - mid)
        return means(i) + frac * (means(i + 1) - means(i))
      }
      cum += weights(i)
      i += 1
    }
    val lastMid = cum + weights(n - 1) / 2.0
    val denom = total - lastMid
    if (denom > 0)
      means(n - 1) + (index - lastMid) / denom * (max - means(n - 1))
    else means(n - 1)
  }
}

/** `tdigest_quantiles(x, array(q…), δ)` → `array<double>`: per-group
  * t-digest of x evaluated at the requested quantile levels. Bounded
  * per-partition state (O(δ)), associatively mergeable partials —
  * the serving-layer quantile aggregate for 100 TB corpora where even
  * the (group, distinct-value) table of q50's exact side is too wide
  * to ship. */
case class TDigestAgg(
    child: Expression,
    quantilesExpr: Expression,
    compressionExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  private lazy val qs: Array[Double] = {
    val arr = quantilesExpr.eval().asInstanceOf[ArrayData]
    arr.toDoubleArray()
  }
  private lazy val delta: Double = compressionExpr.eval() match {
    case d: java.lang.Double => d
    case i: java.lang.Integer => i.toDouble
    case other => other.asInstanceOf[Number].doubleValue()
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val numeric = child.dataType.isInstanceOf[NumericType]
    if (!numeric)
      TypeCheckResult.TypeCheckFailure(
        s"tdigest_quantiles needs a numeric column, got ${child.dataType.catalogString}")
    else if (!quantilesExpr.foldable ||
        !quantilesExpr.dataType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckFailure(
        "tdigest_quantiles levels must be a literal array<double>")
    else if (!compressionExpr.foldable)
      TypeCheckResult.TypeCheckFailure("tdigest_quantiles δ must be a literal")
    else {
      val d = compressionExpr.eval().asInstanceOf[Number].doubleValue()
      if (d < 10 || d > 10000)
        TypeCheckResult.TypeCheckFailure(
          "tdigest_quantiles δ must be in [10, 10000] (the state bound is the point)")
      else if (qs.exists(q => q < 0 || q > 1))
        TypeCheckResult.TypeCheckFailure("quantile levels must be in [0, 1]")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def children: Seq[Expression] = Seq(child, quantilesExpr, compressionExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren(0), quantilesExpr = newChildren(1),
      compressionExpr = newChildren(2))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigest = new TDigest(delta)

  private lazy val toDouble: Any => Double = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      v => v.asInstanceOf[Number].longValue().toDouble
    case d: DecimalType =>
      v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(toDouble(v))
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TDigest): Any =
    new GenericArrayData(qs.map(buffer.quantile))

  override def serialize(buffer: TDigest): Array[Byte] = {
    buffer.compress()
    val n = buffer.means.length
    val bb = ByteBuffer.allocate(8 + 8 + 8 + 4 + n * 16)
    bb.putDouble(buffer.compression)
    bb.putDouble(buffer.min)
    bb.putDouble(buffer.max)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buffer.means(i)); bb.putLong(buffer.weights(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val td = new TDigest(bb.getDouble)
    val mn = bb.getDouble
    val mx = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val m = bb.getDouble; val w = bb.getLong
      td.add(m, w)
      i += 1
    }
    if (mn < td.min) td.min = mn
    if (mx > td.max) td.max = mx
    td
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "tdigest_quantiles"
}

/** SQL registration + Column API for [[TDigestAgg]]. */
object tdigest {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "tdigest_quantiles" -> { es => TDigestAgg(es(0), es(1), es(2)) })

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.register(spark, builders)

  def tdigestQuantiles(x: Column, levels: Seq[Double], delta: Double): Column =
    call_function("tdigest_quantiles", x,
      array(levels.map(lit): _*), lit(delta))
}
