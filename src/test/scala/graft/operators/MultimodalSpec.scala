package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a tiny payload"),
    (1L, "another, slightly longer payload with punctuation!"),
    (2L, "третий payload with non-ascii bytes"),
  )

  test("resizePlan: longest side capped, aspect preserved, within-bounds passthrough") {
    val many = (0L until 200L).map(i => (i, s"synthetic payload $i")).toDF("doc_id", "text")
    val rows = Multimodal.resizePlan(many).collect().map(r =>
      (r.getAs[Long]("width"), r.getAs[Long]("height"),
        r.getAs[Long]("new_w"), r.getAs[Long]("new_h")))
    rows should not be empty
    rows.foreach { case (w, h, nw, nh) =>
      if (math.max(w, h) <= Multimodal.ResizeMax) {
        (nw, nh) shouldBe ((w, h)) // downscale only: small images untouched
      } else {
        math.max(nw, nh) shouldBe Multimodal.ResizeMax.toLong
        nw should be >= 1L
        nh should be >= 1L
        // the exact integer-scaling contract (SQL `div` == JVM /)
        val longest = math.max(w, h)
        nw shouldBe w * Multimodal.ResizeMax / longest
        nh shouldBe h * Multimodal.ResizeMax / longest
      }
    }
  }

  test("frameSample: stride-spaced indices in range, ceil(n/stride) per doc") {
    val many = (0L until 50L).map(i => (i, s"video payload $i")).toDF("doc_id", "text")
    val byDoc = Multimodal.frameSample(many).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("frame_idx")))
      .groupBy(_._1)
    byDoc should have size 50
    byDoc.foreach { case (_, rows) =>
      val n = rows.head._2
      val idxs = rows.map(_._3).sorted
      idxs shouldBe idxs.indices.map(_.toLong * Multimodal.FrameStride)
      all(idxs) should be < n
      idxs.length.toLong shouldBe (n + Multimodal.FrameStride - 1) / Multimodal.FrameStride
    }
  }

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
