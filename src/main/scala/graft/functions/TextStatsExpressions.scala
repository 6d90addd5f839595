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
case class StopwordCounts(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "stopword_counts"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lists.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(v: Any): Any = {
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

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
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

  // Validation errors here surface during ANALYSIS (the builder runs
  // when the function resolves), so each names the function and the
  // offending shape instead of letting a raw NPE escape — the SQL
  // registration path hands this arbitrary user input.
  private def foldLists(e: Expression): Seq[Seq[String]] = {
    require(e.foldable,
      s"stopword_counts: the lists argument must be a literal " +
        s"array(array('w', ...), ...), got non-foldable $e")
    val folded = e.eval()
    require(folded != null, "stopword_counts: the lists argument is NULL")
    folded.asInstanceOf[ArrayData].toArray[ArrayData](
      ArrayType(StringType)).zipWithIndex.map { case (ws, i) =>
      require(ws != null, s"stopword_counts: list $i is NULL")
      ws.toArray[UTF8String](StringType).zipWithIndex.map { case (w, j) =>
        require(w != null, s"stopword_counts: word $j of list $i is NULL")
        w.toString
      }.toSeq
    }.toSeq
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "stopword_counts" -> { es => StopwordCounts(es(0), foldLists(es(1))) },
    "token_char_sum" -> { es => TokenCharSum(es.head) },
  )

  def register(spark: SparkSession): Unit = registry.register(spark, builders)

  def stopwordCounts(c: Column, lists: Seq[Seq[String]]): Column =
    call_function("stopword_counts", c,
      array(lists.map(ws => array(ws.map(lit): _*)): _*))
  def tokenCharSum(c: Column): Column = call_function("token_char_sum", c)
}
