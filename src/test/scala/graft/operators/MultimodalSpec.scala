package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a tiny payload"),
    (1L, "another, slightly longer payload with punctuation!"),
    (2L, "третий payload with non-ascii bytes"),
  )

  test("decodeImages (mapPartitions path) == binaryMeta (expression path)") {
    val payloads = docs.map { case (id, t) => (id, t.getBytes("UTF-8")) }.toDS()
    val decoded = Multimodal.decodeImages(payloads).collect()
      .map(m => (m.doc_id, m.n_bytes, m.width, m.height, m.channels, m.format))
      .sortBy(_._1)
    val viaExpr = Multimodal.binaryMeta(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_bytes"),
        r.getAs[Long]("width").toInt, r.getAs[Long]("height").toInt,
        r.getAs[Long]("channels").toInt, r.getAs[String]("format")))
      .sortBy(_._1)
    decoded shouldBe viaExpr
  }
}
