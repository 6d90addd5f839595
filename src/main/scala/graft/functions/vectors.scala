package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Column-level API + SQL registration for the vector expressions.
  *
  * Functions are registered in the session FunctionRegistry under the
  * snake_case names (`l2_distance(a, b)` in Spark SQL ≈ ClickHouse's
  * `L2Distance(a, b)`, `search.py:24`) and surfaced to the DataFrame API
  * via `call_function`, which resolves through the same registry — one
  * code path for SQL and DataFrame users.
  */
object vectors {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> { es => L2Distance(es(0), es(1)) },
    "l2_squared_distance" -> { es => L2SquaredDistance(es(0), es(1)) },
    "dot_product" -> { es => DotProduct(es(0), es(1)) },
    "cosine_distance" -> { es => CosineDistance(es(0), es(1)) },
    "l1_distance" -> { es => L1Distance(es(0), es(1)) },
    "linf_distance" -> { es => LinfDistance(es(0), es(1)) },
    "l2_norm" -> { es => L2Norm(es.head) },
    "l2_normalize" -> { es => L2Normalize(es.head) },
    "int8_pack" -> { es => Int8Pack(es.head) },
    "cosine_distance_i8" -> { es => CosineDistanceI8(es(0), es(1)) },
    "l2_distance_i8" -> { es => L2DistanceI8(es(0), es(1), es(2)) },
    "nearest_centroid" -> { es =>
      // the codebook arguments must be CONSTANTS: they are folded to
      // plain arrays at resolution time and ride the expression as
      // reference objects (constant-size generated code at any k)
      require(es.length == 3,
        "nearest_centroid(vec, cids, cents) takes 3 arguments")
      require(es(1).foldable && es(2).foldable,
        "nearest_centroid: cids/cents must be constant arrays")
      import org.apache.spark.sql.catalyst.util.ArrayData
      NearestCentroid(es(0),
        es(1).eval().asInstanceOf[ArrayData].toLongArray(),
        es(2).eval().asInstanceOf[ArrayData].toDoubleArray())
    },
    "two_level_cell" -> { es =>
      // books are CONSTANTS folded to reference-object arrays, the
      // nearest_centroid discipline at both levels
      require(es.length == 6,
        "two_level_cell(vec, coarse, offs, cnts, fine, stride) takes 6 arguments")
      require(es.drop(1).forall(_.foldable),
        "two_level_cell: book/stride arguments must be constants")
      import org.apache.spark.sql.catalyst.util.ArrayData
      TwoLevelCell(es(0),
        es(1).eval().asInstanceOf[ArrayData].toDoubleArray(),
        es(2).eval().asInstanceOf[ArrayData].toIntArray(),
        es(3).eval().asInstanceOf[ArrayData].toIntArray(),
        es(4).eval().asInstanceOf[ArrayData].toDoubleArray(),
        // widen, don't cast: a SQL caller writing an INTEGER literal
        // (`two_level_cell(v, ..., 4096)`) folds to an Int, and the
        // function is advertised to SQL users in the DESCRIBE text
        numToLong(es(5).eval(), "two_level_cell: stride"))
    },
    "sign_bucket_probe" -> { es =>
      // planes are CONSTANTS folded to one flat reference array —
      // the nearest_centroid discipline
      require(es.length == 3,
        "sign_bucket_probe(vec, planes, plane_count) takes 3 arguments")
      require(es(1).foldable && es(2).foldable,
        "sign_bucket_probe: planes/plane_count must be constants")
      import org.apache.spark.sql.catalyst.util.ArrayData
      SignBucketProbe(es(0),
        es(1).eval().asInstanceOf[ArrayData].toDoubleArray(),
        numToLong(es(2).eval(), "sign_bucket_probe: plane_count").toInt)
    },
    "near_pair_explode" -> { es =>
      require(es.length == 2,
        "near_pair_explode(bucket, max_distance) takes 2 arguments")
      require(es(1).foldable,
        "near_pair_explode: max_distance must be a constant")
      NearPairExplode(es(0),
        numToDouble(es(1).eval(), "near_pair_explode: max_distance"))
    },
  )

  /** Widen an evaluated numeric literal to Double: SQL decimal
    * literals fold to Decimal, Scala callers pass Double. */
  private def numToDouble(v: Any, what: String): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long => l.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric constant, got " +
        (if (other == null) "NULL" else other.getClass.getSimpleName))
  }

  /** Widen an evaluated numeric literal to Long: SQL integer literals
    * fold to Int, Scala callers pass Long — both are valid. */
  private def numToLong(v: Any, what: String): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integral constant, got " +
        (if (other == null) "NULL" else other.getClass.getSimpleName))
  }

  /** Idempotent; call before using the Column API in a session. */
  def register(spark: SparkSession): Unit = registry.register(spark, builders)

  def l2Distance(a: Column, b: Column): Column = call_function("l2_distance", a, b)
  def l2SquaredDistance(a: Column, b: Column): Column =
    call_function("l2_squared_distance", a, b)
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
  def cosineDistance(a: Column, b: Column): Column =
    call_function("cosine_distance", a, b)
  def l1Distance(a: Column, b: Column): Column = call_function("l1_distance", a, b)
  def linfDistance(a: Column, b: Column): Column = call_function("linf_distance", a, b)
  def l2Norm(a: Column): Column = call_function("l2_norm", a)
  def l2Normalize(a: Column): Column = call_function("l2_normalize", a)
  def int8Pack(a: Column): Column = call_function("int8_pack", a)
  def cosineDistanceI8(q8: Column, query: Column): Column =
    call_function("cosine_distance_i8", q8, query)
  def l2DistanceI8(q8: Column, scale: Column, query: Column): Column =
    call_function("l2_distance_i8", q8, scale, query)
  def nearestCentroid(v: Column, cids: Seq[Long], cents: Seq[Double]): Column =
    call_function("nearest_centroid", v,
      org.apache.spark.sql.functions.typedlit(cids.toArray),
      org.apache.spark.sql.functions.typedlit(cents.toArray))

  def signBucketProbe(v: Column, planesFlat: Seq[Double], planeCount: Int): Column =
    call_function("sign_bucket_probe", v,
      org.apache.spark.sql.functions.typedlit(planesFlat.toArray),
      org.apache.spark.sql.functions.lit(planeCount))

  def nearPairExplode(bucket: Column, maxDistance: Double): Column =
    call_function("near_pair_explode", bucket,
      org.apache.spark.sql.functions.lit(maxDistance))

  def twoLevelCell(v: Column, coarse: Seq[Double], offs: Seq[Int],
      cnts: Seq[Int], fine: Seq[Double], stride: Long): Column =
    call_function("two_level_cell", v,
      org.apache.spark.sql.functions.typedlit(coarse.toArray),
      org.apache.spark.sql.functions.typedlit(offs.toArray),
      org.apache.spark.sql.functions.typedlit(cnts.toArray),
      org.apache.spark.sql.functions.typedlit(fine.toArray),
      org.apache.spark.sql.functions.lit(stride))
}
