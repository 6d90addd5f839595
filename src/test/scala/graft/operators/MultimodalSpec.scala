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

  test("audio: decodeAudio (seam) == audioFrames (expression path); framing formula; fold") {
    val payloads = docs.map { case (id, t) => (id, t.getBytes("UTF-8")) }.toDS()
    val decoded = Multimodal.decodeAudio(payloads).collect()
      .map(m => m.doc_id -> m.n_samples).toMap
    val frames = Multimodal.audioFrames(docs.toDF("doc_id", "text"))
    val viaExpr = frames.select("doc_id", "n_samples").distinct().collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    viaExpr shouldBe decoded
    decoded.values.foreach { ns =>
      ns should be >= 4000
      ns should be < 32000
    }
    // frame count is the librosa formula; frame indices are dense 0..n-1
    val byDoc = frames.collect()
      .groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rows) =>
      val ns = decoded(id)
      val expect = (ns - Multimodal.FrameLen) / Multimodal.Hop + 1
      rows.length shouldBe expect
      rows.map(_.getAs[Int]("f")).sorted shouldBe (0 until expect).toArray
    }
    // the fold: exact integer energy sum + hot count match a driver replay
    val got = Multimodal.audioEnergy(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rms_sum_1e4"), r.getAs[Long]("n_hot"))).toMap
    val want = frames.collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues { rows =>
        val v = rows.map(_.getAs[Long]("rms_1e4"))
        (v.sum, v.count(_ > (Multimodal.HotRms * 10000).toLong).toLong)
      }.toMap
    got shouldBe want
  }

  test("JavaSoundDecoder decodes REAL WAV bytes through the same seam; junk fails loudly") {
    // synthesize a 16 kHz mono 16-bit WAV of exactly 1234 frames
    val nFrames = 1234
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { // a little sawtooth so bytes are non-trivial
      val v = ((i % 200) * 163 - 16300).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val decoded = Multimodal.decodeAudio(
      Seq((7L, wav)).toDS(), Multimodal.JavaSoundDecoder).collect()
    decoded.length shouldBe 1
    decoded.head shouldBe Multimodal.AudioMeta(7L, nFrames, 16000)

    // junk bytes: the seam fails loudly, never fakes a duration
    val junk = Seq((8L, "definitely not audio".getBytes("UTF-8"))).toDS()
    an[Exception] should be thrownBy
      Multimodal.decodeAudio(junk, Multimodal.JavaSoundDecoder).collect()
  }

  test("phash is LOCAL: identical payloads hamming 0, small edits small hamming, unrelated payloads far") {
    val base = ("the quick brown fox jumps over the lazy dog, " * 8).trim
    val edited = base.replace("lazy dog", "lazy cat") // one small edit
    val unrelated = ("completely different content with other bytes entirely; " * 8).trim
    val rows = Seq((0L, base), (1L, base), (2L, edited), (3L, unrelated))
      .toDF("doc_id", "text")
    val ph = Multimodal.phash(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    ham(ph(0L), ph(1L)) shouldBe 0 // identical payloads
    // a small edit flips few bit votes: the hash stays NEAR (a raw
    // content hash would be ~30 bits away on average)
    ham(ph(0L), ph(2L)) should be <= 12
    ham(ph(0L), ph(3L)) should be > 12 // unrelated content is far
  }

  test("phashPairs finds guaranteed-radius pairs through the chunk buckets, drops far content") {
    // the pigeonhole GUARANTEE is hamming <= 3 (4 chunks of 15 bits:
    // 3 flips leave >= 1 chunk intact); wider matches are best-effort
    // recall, exactly as published — so pin the guaranteed cases:
    // identical payloads (hamming 0) and a tail-append tiny edit IF
    // its measured hamming is within the guarantee
    val base = ("the quick brown fox jumps over the lazy dog, " * 8).trim
    val edited = base + " xx"
    val rows = Seq((0L, base), (1L, base), (2L, edited),
      (3L, ("completely different content with other bytes entirely; " * 8).trim))
      .toDF("doc_id", "text")
    val ph = Multimodal.phash(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Multimodal.phashPairs(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairs = got.map(t => (t._1, t._2))
    pairs should contain((0L, 1L)) // identical: always found, hamming 0
    got.find(t => t._1 == 0L && t._2 == 1L).get._3 shouldBe 0
    if (java.lang.Long.bitCount(ph(0L) ^ ph(2L)) <= 3)
      pairs should contain((0L, 2L)) // inside the pigeonhole guarantee
    got.foreach { case (_, _, h) => h should be <= 12 }
    pairs should not contain ((0L, 3L)) // unrelated content is far
  }
}
