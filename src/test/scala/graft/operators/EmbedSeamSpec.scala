package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The batched external-model seam behind v8: a fake batch server
  * proves the plumbing (batch sizes, order alignment, loud failure),
  * the stub proves bit-equivalence with the gated expression path. */
object EmbedSeamSpec {
  // static recorder: executors share the JVM in local mode
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

  /** Fake "model server": records every batch it is asked to embed,
    * returns position-tagged vectors so misalignment would show.
    * Top-level (captures nothing) → serializable into tasks. */
  final class RecordingEmbedder extends VectorSearch.BatchEmbedder {
    val dim = 4
    def embed(texts: Array[String]): Array[Array[Float]] = {
      batchSizes.add(texts.length)
      texts.map(t => Array.tabulate(4)(i =>
        (t.length * 100 + i).toFloat))
    }
  }

  /** Misbehaving server: silently drops rows. */
  final class DroppingEmbedder extends VectorSearch.BatchEmbedder {
    val dim = 2
    def embed(texts: Array[String]): Array[Array[Float]] =
      texts.take(1).map(_ => Array(0f, 0f))
  }
}

class EmbedSeamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkSpec.session
  private val d = SparkSpec.TinySf

  test("batched stub path is bit-identical to the gated expression path") {
    val docs = graft.Tables.documents(spark, d).limit(200)
    val exprPath = docs
      .withColumn("doc_vec", VectorSearch.embedText(col("text")))
      .select(col("doc_id"),
        expr("transform(doc_vec, x -> CAST(x AS FLOAT))").as("doc_vec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val batched = VectorSearch.embedBatched(
      docs, "doc_id", "text", new VectorSearch.StubBatchEmbedder(), 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    batched.keySet shouldBe exprPath.keySet
    batched.foreach { case (id, v) => v shouldBe exprPath(id) }
  }

  test("the fake batch server sees full batches, ids stay order-aligned") {
    import spark.implicits._
    EmbedSeamSpec.batchSizes.clear()
    val rows = (1 to 23).map(i => (i.toLong, "x" * i))
    val df = spark.createDataset(rows).toDF("doc_id", "text").coalesce(1)
    val out = VectorSearch.embedBatched(df, "doc_id", "text",
      new EmbedSeamSpec.RecordingEmbedder, batchSize = 10)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // one partition, 23 rows, batch 10 → calls of 10, 10, 3
    import scala.jdk.CollectionConverters._
    EmbedSeamSpec.batchSizes.asScala.toSeq.map(_.toInt)
      .sorted shouldBe Seq(3, 10, 10)
    // alignment: doc i's text has length i → component 0 is i*100
    out(5L).head shouldBe 500f
    out(23L).head shouldBe 2300f
  }

  test("a misbehaving server (row-count mismatch) fails loudly") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "a"), (2L, "b")))
      .toDF("doc_id", "text").coalesce(1) // both rows in ONE batch
    val ex = intercept[org.apache.spark.SparkException] {
      VectorSearch.embedBatched(df, "doc_id", "text",
        new EmbedSeamSpec.DroppingEmbedder, 10).collect()
    }
    ex.getMessage should include("vectors for")
  }

  test("HttpBatchEmbedder round-trips JSON against an in-process server, order-aligned") {
    // the real-endpoint seam's PLUMBING, exercised offline: a JDK
    // HttpServer plays the model server, echoing per-text vectors so
    // misalignment or mis-parsed floats would show
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/embed", { exchange =>
        val body = new String(exchange.getRequestBody.readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        // texts arrive as {"texts":["..",".."]} — count + per-text len
        val texts = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
          .findAllMatchIn(body.dropWhile(_ != '[')).map(_.group(1)).toSeq
        val rows = texts.map(t =>
          s"[${t.length}.5, -2.0e-1, ${t.length}]").mkString("[", ",", "]")
        val bytes = rows.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
      server.start()
      val ep = s"http://127.0.0.1:${server.getAddress.getPort}/embed"
      val emb = new VectorSearch.HttpBatchEmbedder(ep, dim = 3)
      val out = emb.embed(Array("ab", "wxyz"))
      out.length shouldBe 2
      out(0).toSeq shouldBe Seq(2.5f, -0.2f, 2f)
      out(1).toSeq shouldBe Seq(4.5f, -0.2f, 4f)
      // a wrong-width row fails loudly (dim contract)
      val bad = new VectorSearch.HttpBatchEmbedder(ep, dim = 4)
      val ex = intercept[IllegalArgumentException] {
        bad.embed(Array("ab"))
      }
      ex.getMessage should include("expected 4")
    } finally server.stop(0)
  }

  test("parseFloatRows accepts the endpoint grammar and rejects junk") {
    VectorSearch.parseFloatRows("[]").length shouldBe 0
    VectorSearch.parseFloatRows(" [ [1, -2.5e1] , [] ] ")
      .map(_.toSeq).toSeq shouldBe Seq(Seq(1f, -25f), Seq())
    intercept[IllegalArgumentException] {
      VectorSearch.parseFloatRows("""{"rows": [[1]]}""")
    }
    intercept[IllegalArgumentException] {
      VectorSearch.parseFloatRows("[[1,]]")
    }
  }

  test("knn over the batched embedding matches the v8 gate's top-k") {
    graft.functions.vectors.register(spark)
    val docs = graft.Tables.documents(spark, d)
    val gate = VectorSearch.embedUdfKnn(spark, d, 10)
      .collect().map(_.getLong(0))
    val emb = VectorSearch.embedBatched(
      docs, "doc_id", "text", new VectorSearch.StubBatchEmbedder(), 64)
      .withColumn("doc_vec", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val q = array(VectorSearch.qvec(4).map(lit): _*)
    val got = emb
      .withColumn("score",
        graft.functions.vectors.cosineDistance(col("doc_vec"), q))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score"), col("doc_id"))
      .limit(10)
      .collect().map(_.getLong(0))
    // float32 round-trip can reorder near-ties only in pathological
    // cases; on this corpus the top-k id SET matches the gate exactly
    got.toSet shouldBe gate.toSet
  }
}
