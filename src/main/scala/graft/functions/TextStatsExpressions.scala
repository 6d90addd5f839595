package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token statistics for the text-analysis operators
  * (t1/t2) — the same interpreted-lambda elimination [[WordShingles]]
  * did for the dedup family.
  *
  * The declarative forms (`size(filter(tokens, x -> x IN stoplist))`
  * per language, `aggregate(tokens, 0, (acc, x) -> acc + length(x))`)
  * are higher-order functions, which Spark evaluates as CodegenFallback
  * with a closure dispatch PER ELEMENT per lambda — and t1 walks the
  * token array once per language list. These expressions keep the exact
  * semantics (occurrence counts against each list, character-length
  * sum) in a single native pass per row. CodegenFallback like the other
  * graft text expressions: the loop body is hash-set probes, which gain
  * little from codegen — the per-element interpreted-lambda overhead
  * was the cost. The DuckDB oracle twins keep using the declarative SQL
  * forms ([[graft.operators.TextAnalysis.oracles]]), so the gate
  * cross-checks this implementation against an independent one.
  */
/** The stopword lists ride in the expression tree as a FOLDABLE second
  * argument (not pre-folded constructor data), so every invalid shape —
  * wrong type, non-literal, NULL list, NULL word — fails through
  * `checkInputDataTypes` as a clean AnalysisException naming the
  * function, instead of a raw cast/NPE escaping the function builder
  * during analysis. The folded sets are built once, lazily. */
case class StopwordCounts(child: Expression, listsExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "stopword_counts"
  override def left: Expression = child
  override def right: Expression = listsExpr
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(StringType, _) =>
      case other => return TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.catalogString}")
    }
    listsExpr.dataType match {
      case ArrayType(ArrayType(StringType, _), _) =>
      case other => return TypeCheckFailure(
        s"$prettyName requires a literal array<array<string>> of stopword " +
          s"lists, got ${other.catalogString}")
    }
    if (!listsExpr.foldable)
      return TypeCheckFailure(
        s"$prettyName stopword lists must be a literal, got $listsExpr")
    val folded = listsExpr.eval()
    if (folded == null)
      return TypeCheckFailure(s"$prettyName stopword lists must not be NULL")
    val lists = folded.asInstanceOf[ArrayData]
    var i = 0
    while (i < lists.numElements()) {
      if (lists.isNullAt(i))
        return TypeCheckFailure(s"$prettyName stopword list $i is NULL")
      val ws = lists.getArray(i)
      var j = 0
      while (j < ws.numElements()) {
        if (ws.isNullAt(j))
          return TypeCheckFailure(
            s"$prettyName word $j of stopword list $i is NULL")
        j += 1
      }
      i += 1
    }
    TypeCheckSuccess
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] = {
    val lists = listsExpr.eval().asInstanceOf[ArrayData]
    (0 until lists.numElements()).map { i =>
      val ws = lists.getArray(i)
      val s = new java.util.HashSet[UTF8String](ws.numElements() * 2)
      (0 until ws.numElements()).foreach(j =>
        // clone: getUTF8String may return a buffer-backed view
        s.add(ws.getUTF8String(j).clone()))
      s
    }.toArray
  }

  override def nullSafeEval(v: Any, listsV: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < n) {
      val tok = toks.getUTF8String(i)
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(tok)) counts(l) += 1
        l += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(child = newLeft, listsExpr = newRight)
}

/** array<string> tokens → int: sum of per-token character counts —
  * exactly `aggregate(t, 0, (acc, x) -> acc + length(x))` without the
  * two closure dispatches per element. */
case class TokenCharSum(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "token_char_sum"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  // a null ELEMENT nulls the whole sum — exactly what the declarative
  // aggregate() form returns (acc + length(NULL) = NULL), and the SQL
  // surface accepts arbitrary array<string> with containsNull = true
  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var sum = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t == null) return null
      sum += t.numChars()
      i += 1
    }
    sum
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** SQL registration + Column API, mirroring [[texthash]]. The stopword
  * lists arrive as a foldable `array(array('the', ...), ...)` literal
  * and are folded into the expression at registration time, so the SQL
  * surface stays generic (`stopword_counts(tokenize(text),
  * [['the','a'], ['der','die']])`). */
object textstats {

  // All lists-argument validation lives in StopwordCounts.
  // checkInputDataTypes, so invalid shapes fail as AnalysisExceptions
  // naming the function — the builder just wires the expressions.
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "stopword_counts" -> { es => StopwordCounts(es(0), es(1)) },
    "token_char_sum" -> { es => TokenCharSum(es.head) },
  )

  def register(spark: SparkSession): Unit = registry.register(spark, builders)

  def stopwordCounts(c: Column, lists: Seq[Seq[String]]): Column =
    call_function("stopword_counts", c,
      array(lists.map(ws => array(ws.map(lit): _*)): _*))
  def tokenCharSum(c: Column): Column = call_function("token_char_sum", c)
}
