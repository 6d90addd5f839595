package graft

import org.apache.spark.sql.AnalysisException

/** Adversarial-input contract of the registered SQL surface: every
  * graft function, fed NULLs, empty arrays, and null elements, must
  * produce either a clean ANALYSIS error (type check) or a defined
  * value — never an executor-side NPE/crash. The judge for "defined"
  * is pinned here so a refactor that changes null semantics fails
  * loudly.
  *
  * Notable pinned semantics:
  *  - distance folds read a NULL ELEMENT of a numeric array as 0.0
  *    (Spark's primitive-array storage has no per-element null in the
  *    unsafe path; corrupt embeddings should be filtered upstream —
  *    `l2_norm` = 0 on an all-null vector makes them detectable);
  *  - text functions DROP null tokens before shingling (a null token
  *    is a tokenizer artifact, not content — neighbors join across);
  *  - the topk sketch SKIPS null keys (matching count() of a null);
  *  - untyped `NULL`/`array()` literals fail at analysis where the
  *    function requires a concrete array type — that is the type
  *    check doing its job, not a gap.
  */
class SqlSurfaceRobustnessSpec extends SparkSpec {

  private def eval(expr: String, from: String = ""): Either[String, Any] =
    try Right(spark.sql(s"SELECT $expr AS x$from").head.get(0))
    catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c.getCause != null && !c.isInstanceOf[AnalysisException])
          c = c.getCause
        if (c.isInstanceOf[AnalysisException]) Left("analysis")
        else throw e // executor-side crash = test failure
    }

  test("null array inputs: null-intolerant functions return NULL") {
    eval("hash60(NULL)") shouldBe Right(null)
    eval("tokenize(NULL)") shouldBe Right(null)
    eval("normalize_text(NULL)") shouldBe Right(null)
    eval("char_grams(CAST(NULL AS STRING))") shouldBe Right(null)
  }

  test("char_grams: short/empty inputs yield empty arrays, non-strings fail analysis") {
    eval("size(char_grams(''))") shouldBe Right(0)
    eval("size(char_grams('abc'))") shouldBe Right(0) // below one gram
    eval("size(char_grams('abcd'))") shouldBe Right(1)
    eval("size(char_grams('aaaaa'))") shouldBe Right(1) // distinct dedup
    eval("char_grams(array(1))") shouldBe Left("analysis")
  }

  test("untyped NULL / empty-array literals fail at ANALYSIS where a concrete array type is required") {
    eval("l2_distance(NULL, array(1.0D))") shouldBe Left("analysis")
    eval("l2_distance(array(), array())") shouldBe Left("analysis")
    eval("word_shingles(NULL)") shouldBe Left("analysis")
    eval("minhash_signature(array())") shouldBe Left("analysis")
    eval("simhash60(array())") shouldBe Left("analysis")
    eval("token_char_sum(NULL)") shouldBe Left("analysis")
    eval("stopword_counts(NULL, array(array('a')))") shouldBe Left("analysis")
  }

  test("stopword_counts rejects every invalid lists shape at analysis") {
    eval("stopword_counts(tokenize('a b'), 42)") shouldBe Left("analysis")
    eval("stopword_counts(tokenize('a b'), array(1, 2))") shouldBe Left("analysis")
    eval("stopword_counts(tokenize('a b'), CAST(NULL AS ARRAY<ARRAY<STRING>>))") shouldBe
      Left("analysis")
    eval("stopword_counts(tokenize('a b'), array(array('a'), NULL))") shouldBe
      Left("analysis")
    eval("stopword_counts(tokenize('a b'), array(array('a', CAST(NULL AS STRING))))") shouldBe
      Left("analysis")
  }

  test("null ELEMENTS of numeric arrays read as 0.0 in distance folds") {
    eval("l2_distance(array(CAST(NULL AS DOUBLE), 1.0D), array(1.0D, 1.0D))") shouldBe
      Right(1.0)
    eval("dot_product(array(CAST(NULL AS DOUBLE)), array(1.0D))") shouldBe Right(0.0)
    eval("l2_norm(array(CAST(NULL AS DOUBLE)))") shouldBe Right(0.0)
  }

  test("null tokens are dropped before shingling (neighbors join across)") {
    eval("word_shingles(array('a', CAST(NULL AS STRING), 'b', 'c'))") match {
      case Right(v) => v.toString shouldBe "ArraySeq(a b, b c)"
      case other => fail(s"expected shingles, got $other")
    }
    // the fused hash pass agrees with hashing the string shingles
    eval("shingle_hash60s(array('a', CAST(NULL AS STRING), 'b', 'c'))") shouldBe
      eval("transform(word_shingles(array('a', CAST(NULL AS STRING), 'b', 'c')), s -> hash60(s))")
  }

  test("signature builders tolerate null hash elements without crashing") {
    eval("minhash_signature(array(CAST(NULL AS BIGINT), 1L))") shouldBe a[Right[_, _]]
    eval("simhash60(array(CAST(NULL AS BIGINT)))") shouldBe a[Right[_, _]]
  }

  test("stopword/token statistics null-element semantics") {
    eval("stopword_counts(array('a', CAST(NULL AS STRING)), array(array('a')))") match {
      case Right(v) => v.toString shouldBe "ArraySeq(1)" // null token matches nothing
      case other => fail(s"expected counts, got $other")
    }
    // NULL token nulls the char sum (the declarative aggregate() twin's semantics)
    eval("token_char_sum(array('ab', CAST(NULL AS STRING)))") shouldBe Right(null)
  }

  test("topk sketch skips null keys") {
    eval("explode_outer(topk_sketch(CAST(NULL AS BIGINT), 4, 2))",
      " FROM range(3)") shouldBe Right(null)
  }

  test("mg_candidates: bad types and non-literal capacity fail analysis; null keys skip") {
    eval("mg_candidates(CAST(1.5 AS DOUBLE), 1L, 4)",
      " FROM range(3)") shouldBe Left("analysis") // no silent double cast
    eval("mg_candidates(id, 1L, CAST(id AS INT))",
      " FROM range(3)") shouldBe Left("analysis") // capacity must be literal
    eval("mg_candidates(id, 0.5, 4)",
      " FROM range(3)") shouldBe Left("analysis") // weight must be BIGINT
    eval("explode_outer(mg_candidates(CAST(NULL AS BIGINT), 1L, 4))",
      " FROM range(3)") shouldBe Right(null)
  }

  test("int8 quantized surface: null in → NULL out, bad types fail analysis, size mismatch dies loudly") {
    // untyped NULL fails the concrete-type check at analysis (same
    // contract as the float surface); a TYPED null propagates as NULL
    eval("int8_pack(NULL)") shouldBe Left("analysis")
    eval("int8_pack(CAST(NULL AS ARRAY<DOUBLE>))") shouldBe Right(null)
    eval("int8_pack(array())") shouldBe Left("analysis")
    eval("int8_pack(array(1, 2))") shouldBe Left("analysis") // int array: no silent cast
    eval("cosine_distance_i8(CAST(NULL AS BINARY), array(1.0D))") shouldBe Right(null)
    eval("l2_distance_i8(CAST(NULL AS BINARY), 1.0D, array(1.0D))") shouldBe Right(null)
    // defined: the all-zero vector packs to n zero bytes (scale 0 guard)
    eval("octet_length(int8_pack(array(0.0D, 0.0D)))") shouldBe Right(2)
    // round trip: quantize-then-score self-distance collapses to ~0
    val rt = spark.sql(
      "SELECT cosine_distance_i8(int8_pack(array(3.0D, 4.0D)), array(3.0D, 4.0D)) AS x")
      .head.getDouble(0)
    rt should be < 1e-4
    // a code/query length mismatch is a data-contract violation: it must
    // die LOUDLY at eval (never a silent short fold)
    val e = intercept[Throwable] {
      spark.sql(
        "SELECT cosine_distance_i8(int8_pack(array(1.0D, 2.0D)), array(1.0D)) AS x").head
    }
    var c: Throwable = e
    while (c.getCause != null && !c.getMessage.contains("size mismatch"))
      c = c.getCause
    c.getMessage should include("size mismatch")
  }

  test("DESCRIBE FUNCTION serves real usage text for every injected name") {
    GraftExtensions.allBuilders.map(_._1).foreach { n =>
      val txt = spark.sql(s"DESCRIBE FUNCTION $n").collect().map(_.getString(0))
        .mkString("\n")
      withClue(n) { txt should include(n + "(") }
    }
  }
}
