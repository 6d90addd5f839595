package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector-distance expressions with whole-stage codegen.
  *
  * Re-expresses the ClickHouse distance functions the reference leans on
  * (`search.py:24` builds `L2Distance(column, features) AS score`) as
  * first-class Spark expressions: the distance loop is emitted straight
  * into the generated Java of the enclosing WholeStageCodegen stage — no
  * UDF boxing, no per-row closure dispatch, no Array[Float] allocation.
  * At 100 TB this is the difference between a scan-speed knn and a
  * serialization-bound one.
  *
  * Inputs: two `array<float>` / `array<double>` columns (mixed ok);
  * math is done in double. Null-intolerant (null in → null out).
  */
abstract class VectorBinaryFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"${prettyName} expects array<float|double>, got ${other.catalogString}")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments")
  }

  @inline private def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  /** Dimension check shared by the interpreted paths: ClickHouse raises
    * on mismatched array sizes (`L2Distance` et al.), and silently
    * folding over min(n) would return a plausible wrong distance for a
    * corrupt/mis-dimensioned embedding — fail loudly instead. */
  protected final def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$prettyName: array size mismatch: $n vs ${b.numElements()}")
    n
  }

  /** Sequential left-to-right fold — same evaluation order as the
    * generated code and as a single-threaded engine, so results are
    * bit-reproducible across partitions/plans. */
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    fold(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemType(left), elemType(right))

  /** Java accessor snippet for element i of an array<float|double>. */
  protected def acc(v: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $v.getFloat($i)"
    case _ => s"$v.getDouble($i)"
  }

  /** Loop body contract: declare accumulators before the loop, update per
    * element (xa/xb bound to the two doubles), produce result expr. */
  protected def genInit(ctx: CodegenContext): (String, String => String, String)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val (init, body, result) = genInit(ctx)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: array size mismatch: "
         |    + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |$init
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = ${acc(a, i, elemType(left))};
         |  double $xb = ${acc(b, i, elemType(right))};
         |  ${body(s"$xa, $xb")}
         |}
         |${ev.value} = $result;
       """.stripMargin
    })
}

/** sqrt(sum((a-b)^2)) — ClickHouse `L2Distance`. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "l2_distance"
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double = {
    var s = 0.0; var i = 0
    val n = checkedLen(a, b)
    val lf = lt == FloatType; val rf = rt == FloatType
    while (i < n) {
      val x = (if (lf) a.getFloat(i).toDouble else a.getDouble(i)) -
        (if (rf) b.getFloat(i).toDouble else b.getDouble(i))
      s += x * x; i += 1
    }
    math.sqrt(s)
  }
  protected def genInit(ctx: CodegenContext): (String, String => String, String) = {
    val s = ctx.freshName("s"); val d = ctx.freshName("d")
    (s"double $s = 0.0;",
      args => { val Array(xa, xb) = args.split(", ")
        s"double $d = $xa - $xb; $s += $d * $d;" },
      s"Math.sqrt($s)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sum((a-b)^2) — ClickHouse `L2SquaredDistance`. */
case class L2SquaredDistance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "l2_squared_distance"
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double = {
    var s = 0.0; var i = 0
    val n = checkedLen(a, b)
    val lf = lt == FloatType; val rf = rt == FloatType
    while (i < n) {
      val x = (if (lf) a.getFloat(i).toDouble else a.getDouble(i)) -
        (if (rf) b.getFloat(i).toDouble else b.getDouble(i))
      s += x * x; i += 1
    }
    s
  }
  protected def genInit(ctx: CodegenContext): (String, String => String, String) = {
    val s = ctx.freshName("s"); val d = ctx.freshName("d")
    (s"double $s = 0.0;",
      args => { val Array(xa, xb) = args.split(", ")
        s"double $d = $xa - $xb; $s += $d * $d;" },
      s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sum(a*b) — ClickHouse `dotProduct` / inner product. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "dot_product"
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double = {
    var s = 0.0; var i = 0
    val n = checkedLen(a, b)
    val lf = lt == FloatType; val rf = rt == FloatType
    while (i < n) {
      s += (if (lf) a.getFloat(i).toDouble else a.getDouble(i)) *
        (if (rf) b.getFloat(i).toDouble else b.getDouble(i))
      i += 1
    }
    s
  }
  protected def genInit(ctx: CodegenContext): (String, String => String, String) = {
    val s = ctx.freshName("s")
    (s"double $s = 0.0;",
      args => { val Array(xa, xb) = args.split(", ")
        s"$s += $xa * $xb;" },
      s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 1 - dot/(|a||b|) — ClickHouse `cosineDistance`. */
case class CosineDistance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "cosine_distance"
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = checkedLen(a, b)
    val lf = lt == FloatType; val rf = rt == FloatType
    while (i < n) {
      val xa = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val xb = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += xa * xb; na += xa * xa; nb += xb * xb; i += 1
    }
    1.0 - dot / math.sqrt(na * nb)
  }
  protected def genInit(ctx: CodegenContext): (String, String => String, String) = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    (s"double $dot = 0.0; double $na = 0.0; double $nb = 0.0;",
      args => { val Array(xa, xb) = args.split(", ")
        s"$dot += $xa * $xb; $na += $xa * $xa; $nb += $xb * $xb;" },
      s"1.0 - $dot / Math.sqrt($na * $nb)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** sum(|a-b|) — ClickHouse `L1Distance`. */
case class L1Distance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "l1_distance"
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double = {
    var s = 0.0; var i = 0
    val n = checkedLen(a, b)
    val lf = lt == FloatType; val rf = rt == FloatType
    while (i < n) {
      s += math.abs((if (lf) a.getFloat(i).toDouble else a.getDouble(i)) -
        (if (rf) b.getFloat(i).toDouble else b.getDouble(i)))
      i += 1
    }
    s
  }
  protected def genInit(ctx: CodegenContext): (String, String => String, String) = {
    val s = ctx.freshName("s")
    (s"double $s = 0.0;",
      args => { val Array(xa, xb) = args.split(", ")
        s"$s += Math.abs($xa - $xb);" },
      s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** max(|a-b|) — ClickHouse `LinfDistance`. */
case class LinfDistance(left: Expression, right: Expression) extends VectorBinaryFold {
  override def prettyName: String = "linf_distance"
  protected def fold(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType): Double = {
    var s = 0.0; var i = 0
    val n = checkedLen(a, b)
    val lf = lt == FloatType; val rf = rt == FloatType
    while (i < n) {
      val d = math.abs((if (lf) a.getFloat(i).toDouble else a.getDouble(i)) -
        (if (rf) b.getFloat(i).toDouble else b.getDouble(i)))
      if (d > s) s = d
      i += 1
    }
    s
  }
  protected def genInit(ctx: CodegenContext): (String, String => String, String) = {
    val s = ctx.freshName("s"); val d = ctx.freshName("d")
    (s"double $s = 0.0;",
      args => { val Array(xa, xb) = args.split(", ")
        s"double $d = Math.abs($xa - $xb); if ($d > $s) $s = $d;" },
      s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** v / |v|₂ — ClickHouse `L2Normalize`. One pass computes the norm,
  * a second divides — inside ONE expression, so the norm can't be
  * re-inlined per element the way a `transform(v, x -> x / l2_norm(v))`
  * formulation collapses to. Zero vector → zero vector (no NaNs). */
case class L2Normalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val f = isFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = if (norm == 0.0) 0.0 else x / norm
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sqrt(sum(a^2)) — ClickHouse `L2Norm`. Unary, codegen'd. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_norm"
  override def dataType: DataType = DoubleType
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = a.numElements(); val f = isFloat
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    math.sqrt(s)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val getter = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = $getter; $s += $x * $x;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Symmetric per-vector int8 quantization: scale = max|x| / 127, byte
  * i = round-away-from-zero(x_i / scale) ∈ [-127, 127], packed into a
  * BINARY cell of exactly n bytes — 4× fewer scan bytes than
  * array<float>, 8× fewer than the float64 arrays the reference's
  * ingest writes (process.py:46; its own bfloat16 experiment,
  * images/results_ridgeback_bfloat16.png, is the same cost lever).
  * All-zero vectors quantize to all-zero bytes. The rounding is
  * away-from-zero explicitly (NOT Math.round's floor(x+0.5), which
  * rounds negative halves toward zero) so a DuckDB `round()` twin is
  * bit-identical.
  *
  * Interpreted (CodegenFallback, like [[L2Normalize]]): this runs in
  * the write-once quantized-ingest path, not the per-query scan. */
case class Int8Pack(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "int8_pack"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val f = isFloat
    var mx = 0.0
    var i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > mx) mx = ax
      i += 1
    }
    val s = mx / 127.0
    val out = new Array[Byte](n)
    if (s != 0.0) {
      i = 0
      while (i < n) {
        val x = (if (f) a.getFloat(i).toDouble else a.getDouble(i)) / s
        // away-from-zero: |x/s| <= 127 by construction, no clamp needed
        out(i) = (if (x >= 0) x + 0.5 else x - 0.5).toByte
        i += 1
      }
    }
    out
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Cosine distance between an [[Int8Pack]]-quantized BINARY vector and
  * a full-precision array<float|double> query. Cosine is invariant to
  * the per-vector positive scale, so the packed bytes are read
  * DIRECTLY — no dequantize multiply, no scale column in the scan —
  * and the result equals cosine_distance(scale·bytes, query) exactly.
  * Same codegen'd fold shape as [[CosineDistance]]: the byte loop is
  * emitted into the enclosing WholeStageCodegen stage. */
case class CosineDistanceI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "cosine_distance_i8"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, array<float|double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  private def isFloatQ: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[ArrayData]
    val n = a.length
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$prettyName: size mismatch: $n bytes vs ${b.numElements()} components")
    val f = isFloatQ
    var su = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      val xa = a(i).toDouble
      val xb = if (f) b.getFloat(i).toDouble else b.getDouble(i)
      su += xa * xb; sa += xa * xa; sb += xb * xb
      i += 1
    }
    1.0 - su / math.sqrt(sa * sb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val su = ctx.freshName("su")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val getB =
        if (isFloatQ) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.length;
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: size mismatch: "
         |    + $n + " bytes vs " + $b.numElements() + " components");
         |}
         |double $su = 0.0; double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = (double) $a[$i];
         |  double $xb = $getB;
         |  $su += $xa * $xb; $sa += $xa * $xa; $sb += $xb * $xb;
         |}
         |${ev.value} = 1.0 - $su / Math.sqrt($sa * $sb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** L2 distance between an [[Int8Pack]]-quantized BINARY vector and a
  * full-precision array<float|double> query, dequantizing INSIDE the
  * codegen'd loop via the stored per-vector scale: sqrt(Σ (scale·bᵢ −
  * qᵢ)²). Unlike cosine the scale does not cancel for L2, so it rides
  * as the second argument — one double per row, read from the same
  * quantized store [[graft.operators.VectorSearch.ensureQuantized]]
  * writes. Completes the quantized serving surface for v1's metric the
  * way [[CosineDistanceI8]] does for v2's. */
case class L2DistanceI8(first: Expression, second: Expression,
                        third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "l2_distance_i8"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, DoubleType | FloatType,
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, double, array<float|double>), got " +
            s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  private def scaleIsFloat: Boolean = second.dataType == FloatType
  private def isFloatQ: Boolean = third.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, m: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val s = if (scaleIsFloat) m.asInstanceOf[Float].toDouble
      else m.asInstanceOf[Double]
    val b = r.asInstanceOf[ArrayData]
    val n = a.length
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$prettyName: size mismatch: $n bytes vs ${b.numElements()} components")
    val f = isFloatQ
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = s * a(i).toDouble -
        (if (f) b.getFloat(i).toDouble else b.getDouble(i))
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, sc, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val getB =
        if (isFloatQ) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.length;
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: size mismatch: "
         |    + $n + " bytes vs " + $b.numElements() + " components");
         |}
         |double $s = (double) $sc;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $s * (double) $a[$i] - $getB;
         |  $acc += $d * $d;
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** argmin over a trained codebook: the id of the centroid with the
  * smallest L2² distance to the input vector (ties → smallest cid;
  * null vector → null, coalesced by the caller — the
  * [[graft.operators.Ann.nearestCentroid]] contract).
  *
  * The codebook rides as two REFERENCE OBJECTS (`cids`, row-major
  * `cents`), not as literal expressions: the earlier `least(struct(
  * l2², cid), ...)` fold emitted k inlined distance loops into one
  * generated method, which crossed Janino's 64 KB method limit at
  * k≈a few hundred (observed: a sort stage at k=64×sf1 context, and
  * the whole projection at d9's k=625) and dropped the ENTIRE
  * projection to interpreted evaluation — a silent ~10× on the
  * hottest map in the ANN family. Here the generated code is a
  * constant-size double loop whatever k, so assignment stays inside
  * WholeStageCodegen at any codebook size; the distance accumulation
  * order (sequential over dims) and the tie rule are bit-identical to
  * the replaced fold.
  *
  * The NaN guard mirrors `least`'s total order (NaN sorts greatest,
  * equal-NaN ties fall to min cid): a finite distance always beats a
  * NaN best, a NaN candidate never wins, all-NaN keeps the first
  * (smallest) cid. Unreachable with finite embeddings; kept so the
  * swap is observationally exact. */
case class NearestCentroid(child: Expression, cids: Array[Long],
                           cents: Array[Double])
    extends UnaryExpression {
  require(cids.nonEmpty, "nearest_centroid: empty codebook")
  require(cids.forall(_ != -1L),
    "nearest_centroid: cid -1 is reserved as the null sentinel")
  require(cents.length % cids.length == 0,
    s"nearest_centroid: ${cents.length} centroid doubles not divisible " +
      s"by k=${cids.length}")
  private val k = cids.length
  private val dim = cents.length / k

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector has ${v.numElements()} components, codebook $dim")
    val f = isFloat
    var best = -1L
    var bestD = Double.NaN
    var j = 0
    while (j < k) {
      var s = 0.0
      val off = j * dim
      var i = 0
      while (i < dim) {
        val x = (if (f) v.getFloat(i).toDouble else v.getDouble(i)) -
          cents(off + i)
        s += x * x
        i += 1
      }
      if (best == -1L || s < bestD ||
          (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(s))) {
        bestD = s; best = cids(j)
      }
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val getV = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val upd = ctx.freshName("upd")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException("$prettyName: vector has "
         |    + $v.numElements() + " components, codebook $dim");
         |}
         |long $best = -1L;
         |double $bestD = Double.NaN;
         |for (int $j = 0; $j < $k; $j++) {
         |  double $s = 0.0;
         |  int $off = $j * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = $getV - $centsRef[$off + $i];
         |    $s += $x * $x;
         |  }
         |  boolean $upd = ($best == -1L) || ($s < $bestD) || (Double.isNaN($bestD) && !Double.isNaN($s));
         |  if ($upd) { $bestD = $s; $best = $cidsRef[$j]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  /* Case-class equality over Array fields is reference identity, which
   * would make two structurally identical nearest_centroid expressions
   * compare unequal — defeating expression canonicalization,
   * subexpression elimination and exchange reuse. Compare (and hash)
   * the codebook CONTENTS instead. */
  override def equals(other: Any): Boolean = other match {
    case nc: NearestCentroid =>
      nc.child == child &&
        java.util.Arrays.equals(nc.cids, cids) &&
        java.util.Arrays.equals(nc.cents, cents)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Integer.valueOf(java.util.Arrays.hashCode(cids)),
      Integer.valueOf(java.util.Arrays.hashCode(cents)))

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Two-level (coarse→fine) cell id — the codegen'd assignment loop for
  * [[graft.operators.SemCells.TwoLevel]]: argmin over the kc coarse
  * centroids (dense ranks 0..kc−1, first-wins ties = min rank), then
  * argmin over the winner region's fine-book slice (fid ties to the
  * smaller fid), returning rank·stride + fid. A region with an EMPTY
  * book (unseen at train time) yields fid 0 — the region's single
  * implicit cell, never a dropped row.
  *
  * Books ride the expression as flat reference objects (the
  * [[NearestCentroid]] discipline): constant-size generated code at
  * any k, per-row cost (kc + kf_region)·dim fused multiply-adds. The
  * interpreted alternative (per-row struct array + higher-order
  * array_min lambda) measured ~10× slower at the 2.2M-vector stress
  * point — HOF lambdas don't participate in whole-stage codegen.
  *
  * `fineOff`/`fineCnt` are per-rank offsets/counts into `fine`, in
  * units of VECTORS (× dim for doubles). */
case class TwoLevelCell(child: Expression, coarse: Array[Double],
    fineOff: Array[Int], fineCnt: Array[Int], fine: Array[Double],
    stride: Long) extends UnaryExpression {
  private val kc = fineOff.length
  require(kc > 0, "two_level_cell: empty coarse book")
  require(fineCnt.length == kc, "two_level_cell: offsets/counts mismatch")
  require(coarse.length % kc == 0,
    s"two_level_cell: ${coarse.length} coarse doubles not divisible by kc=$kc")
  private val dim = coarse.length / kc
  require(fine.length % math.max(1, dim) == 0,
    "two_level_cell: fine doubles not divisible by dim")

  override def prettyName: String = "two_level_cell"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector has ${v.numElements()} components, books $dim")
    val f = isFloat
    def d2(cents: Array[Double], off: Int): Double = {
      var s = 0.0; var i = 0
      while (i < dim) {
        val x = (if (f) v.getFloat(i).toDouble else v.getDouble(i)) -
          cents(off + i)
        s += x * x; i += 1
      }
      s
    }
    var best = -1; var bestD = Double.NaN
    var j = 0
    while (j < kc) {
      val s = d2(coarse, j * dim)
      if (best == -1 || s < bestD ||
          (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(s))) {
        bestD = s; best = j
      }
      j += 1
    }
    var bf = 0; var bfD = Double.NaN; var found = false
    var t = 0
    while (t < fineCnt(best)) {
      val s = d2(fine, (fineOff(best) + t) * dim)
      if (!found || s < bfD ||
          (java.lang.Double.isNaN(bfD) && !java.lang.Double.isNaN(s))) {
        bfD = s; bf = t; found = true
      }
      t += 1
    }
    best.toLong * stride + bf
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[]")
      val fineRef = ctx.addReferenceObj("fine", fine, "double[]")
      val offRef = ctx.addReferenceObj("fineOff", fineOff, "int[]")
      val cntRef = ctx.addReferenceObj("fineCnt", fineCnt, "int[]")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val off = ctx.freshName("off")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val bf = ctx.freshName("bf"); val bfD = ctx.freshName("bfD")
      val found = ctx.freshName("found")
      val getV = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException("$prettyName: vector has "
         |    + $v.numElements() + " components, books $dim");
         |}
         |int $best = -1;
         |double $bestD = Double.NaN;
         |for (int $j = 0; $j < $kc; $j++) {
         |  double $s = 0.0;
         |  int $off = $j * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = $getV - $coarseRef[$off + $i];
         |    $s += $x * $x;
         |  }
         |  if ($best == -1 || $s < $bestD || (Double.isNaN($bestD) && !Double.isNaN($s))) {
         |    $bestD = $s; $best = $j;
         |  }
         |}
         |int $bf = 0;
         |double $bfD = Double.NaN;
         |boolean $found = false;
         |for (int $t = 0; $t < $cntRef[$best]; $t++) {
         |  double $s = 0.0;
         |  int $off = ($offRef[$best] + $t) * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = $getV - $fineRef[$off + $i];
         |    $s += $x * $x;
         |  }
         |  if (!$found || $s < $bfD || (Double.isNaN($bfD) && !Double.isNaN($s))) {
         |    $bfD = $s; $bf = $t; $found = true;
         |  }
         |}
         |${ev.value} = ((long) $best) * ${stride}L + $bf;
       """.stripMargin
    })

  /* Content-based equality/hash over the array fields — the
   * NearestCentroid rule (canonicalization, CSE, exchange reuse). */
  override def equals(other: Any): Boolean = other match {
    case tc: TwoLevelCell =>
      tc.child == child && tc.stride == stride &&
        java.util.Arrays.equals(tc.coarse, coarse) &&
        java.util.Arrays.equals(tc.fineOff, fineOff) &&
        java.util.Arrays.equals(tc.fineCnt, fineCnt) &&
        java.util.Arrays.equals(tc.fine, fine)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, java.lang.Long.valueOf(stride),
      Integer.valueOf(java.util.Arrays.hashCode(coarse)),
      Integer.valueOf(java.util.Arrays.hashCode(fineOff)),
      Integer.valueOf(java.util.Arrays.hashCode(fineCnt)),
      Integer.valueOf(java.util.Arrays.hashCode(fine)))

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Fused sign-bit LSH bucket + multi-probe hint for ONE random-
  * hyperplane table: a single pass over the vector computes every
  * plane's dot product, packs the sign bits into the bucket id, and
  * tracks the plane with the smallest |margin| — the one bit whose
  * flip is the likeliest alternative bucket (multi-probe LSH, Lv et
  * al., VLDB 2007). Returns `(bucket ^ (1 << argmin)) << 32 | bucket`:
  * the caller unpacks home = `packed & 0xFFFFFFFF` and probe =
  * `packed >>> 32` with plain codegen'd bit ops, so the expression is
  * evaluated ONCE per (row, table) even though two memberships derive
  * from it.
  *
  * The planes ride the expression as one flat reference array
  * (planeCount × dim, row-major — the [[NearestCentroid]] discipline):
  * generated code is constant-size at any plane count and the whole
  * map stays inside whole-stage codegen. Ties in |margin| resolve to
  * the LOWEST plane index (strict `<` update), matching the oracle's
  * first-match CASE chain. */
case class SignBucketProbe(child: Expression, planesFlat: Array[Double],
                           planeCount: Int)
    extends UnaryExpression {
  require(planeCount > 0 && planeCount <= 31,
    s"sign_bucket_probe: plane count $planeCount outside [1, 31]")
  require(planesFlat.nonEmpty && planesFlat.length % planeCount == 0,
    s"sign_bucket_probe: ${planesFlat.length} plane doubles not divisible " +
      s"by planeCount=$planeCount")
  private val dim = planesFlat.length / planeCount

  override def prettyName: String = "sign_bucket_probe"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"$prettyName: vector has ${v.numElements()} components, planes $dim")
    val f = isFloat
    var bkt = 0L
    var bestM = Double.MaxValue
    var bestP = 0
    var p = 0
    while (p < planeCount) {
      var s = 0.0
      val off = p * dim
      var i = 0
      while (i < dim) {
        s += (if (f) v.getFloat(i).toDouble else v.getDouble(i)) *
          planesFlat(off + i)
        i += 1
      }
      if (s >= 0) bkt |= (1L << p)
      val m = math.abs(s)
      if (m < bestM) { bestM = m; bestP = p }
      p += 1
    }
    ((bkt ^ (1L << bestP)) << 32) | bkt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val plRef = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val bkt = ctx.freshName("bkt")
      val bestM = ctx.freshName("bestM")
      val bestP = ctx.freshName("bestP")
      val getV = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException("$prettyName: vector has "
         |    + $v.numElements() + " components, planes $dim");
         |}
         |long $bkt = 0L;
         |double $bestM = Double.MAX_VALUE;
         |int $bestP = 0;
         |for (int $p = 0; $p < $planeCount; $p++) {
         |  double $s = 0.0;
         |  int $off = $p * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $getV * $plRef[$off + $i];
         |  }
         |  if ($s >= 0) $bkt |= (1L << $p);
         |  double $m = Math.abs($s);
         |  if ($m < $bestM) { $bestM = $m; $bestP = $p; }
         |}
         |${ev.value} = (($bkt ^ (1L << $bestP)) << 32) | $bkt;
       """.stripMargin
    })

  /* Content-based equality/hash over the plane array — the
   * NearestCentroid rule (canonicalization, CSE, exchange reuse). */
  override def equals(other: Any): Boolean = other match {
    case sb: SignBucketProbe =>
      sb.child == child && sb.planeCount == planeCount &&
        java.util.Arrays.equals(sb.planesFlat, planesFlat)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Integer.valueOf(planeCount),
      Integer.valueOf(java.util.Arrays.hashCode(planesFlat)))

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** array<struct<id: bigint, vec: array<float|double>>> →
  * array<struct<vec_a, vec_b, score>>: every unordered element pair of
  * an LSH/IVF bucket whose cosine DISTANCE is within `maxDistance`,
  * each pair canonicalized lo/hi by id — the in-bucket verify step of
  * the embedding dedup family, fused INTO the pair enumeration.
  *
  * Why fused: enumerating candidate id pairs first ([[graft.functions.PairExplode]])
  * materializes Σ occupancy²/2 rows, shuffles them through a
  * dedup groupBy, and re-joins the corpus embeddings TWICE before the
  * cosine can reject ~99.9% of them. Both vectors of every candidate
  * pair are already co-located in the bucket row, so the verify is a
  * tight two-index loop here, and only SURVIVING pairs (thousands, not
  * millions) ever become rows. This is the in-cell scan shape of an
  * IVF index (Jégou et al., PAMI 2011) — per-pair work is a dim-length
  * dot product; per-bucket work is bounded by the caller's occupancy
  * cap; output is bounded by the true near-dup density.
  *
  * CodegenFallback like [[graft.functions.PairExplode]]: evaluated
  * once per BUCKET row with O(occ²·dim) work inside, so per-call
  * dispatch overhead is amortized to nothing. The arithmetic mirrors
  * [[CosineDistance]]'s fold exactly (per-vector norms accumulate
  * independently of the pairing, `1 - dot/sqrt(na*nb)`), so scores are
  * bit-identical with the join-then-filter plan it replaces. */
case class NearPairExplode(child: Expression, maxDistance: Double)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "near_pair_explode"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_a", LongType, nullable = false),
    StructField("vec_b", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, false)
          if st.size == 2 && st.head.dataType == LongType &&
            (st(1).dataType match {
              case ArrayType(FloatType | DoubleType, _) => true
              case _ => false
            }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<bigint, array<float|double>>> " +
            s"with non-null elements, got ${other.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(st: StructType, _) => st(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    val f = isFloat
    val ids = new Array[Long](m)
    val vecs = new Array[Array[Double]](m)
    val norms = new Array[Double](m)
    var dim = -1
    var i = 0
    while (i < m) {
      val st = arr.getStruct(i, 2)
      ids(i) = st.getLong(0)
      val a = st.getArray(1)
      if (dim == -1) dim = a.numElements()
      else if (a.numElements() != dim) throw new IllegalArgumentException(
        s"$prettyName: vectors of length $dim and ${a.numElements()} in one bucket")
      val x = new Array[Double](dim)
      var na = 0.0
      var c = 0
      while (c < dim) {
        val xv = if (f) a.getFloat(c).toDouble else a.getDouble(c)
        x(c) = xv
        na += xv * xv
        c += 1
      }
      vecs(i) = x
      norms(i) = na
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < m) {
      val xi = vecs(i)
      var j = i + 1
      while (j < m) {
        val xj = vecs(j)
        var dot = 0.0
        var c = 0
        while (c < dim) { dot += xi(c) * xj(c); c += 1 }
        val score = 1.0 - dot / math.sqrt(norms(i) * norms(j))
        if (score <= maxDistance) {
          // strict <: equal ids orient like the PairExplode fold
          val (lo, hi) =
            if (ids(i) < ids(j)) (ids(i), ids(j)) else (ids(j), ids(i))
          out += org.apache.spark.sql.catalyst.InternalRow(lo, hi, score)
        }
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}
