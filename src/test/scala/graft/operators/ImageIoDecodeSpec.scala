package graft.operators

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The REAL half of the m1/m4 seam: javax.imageio decode and DCT
  * pHash over actual encoded bytes, driven through the same
  * partition-batched Dataset plumbing the stub gates use. Proves the
  * claim "swap the decoder, keep the physics": real PNG/JPEG bytes →
  * real dimensions/channels/format, and real DCT features flow
  * through the identical capped-bucket near-dup join. */
class ImageIoDecodeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkSpec.session

  /** Deterministic synthetic image: a smooth two-gradient field with a
    * seed-keyed phase, structured enough for a stable DCT signature. */
  private def makeImage(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / w + seed * 37) % 256
      val g = (y * 255 / h + seed * 73) % 256
      val b = ((x + y) * 255 / (w + h) + seed * 11) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  test("ImageIoDecoder reads real PNG and JPEG bytes through decodeImages") {
    import spark.implicits._
    val rows = Seq(
      1L -> encode(makeImage(320, 200, 1), "png"),
      2L -> encode(makeImage(64, 48, 2), "jpg"),
      3L -> encode(makeImage(128, 128, 3), "png"))
    val ds = spark.createDataset(rows).repartition(2) // partition-batched
    val metas = Multimodal.decodeImages(ds, Multimodal.ImageIoDecoder)
      .collect().map(m => m.doc_id -> m).toMap
    metas(1L).width shouldBe 320
    metas(1L).height shouldBe 200
    metas(1L).channels shouldBe 3
    metas(1L).format shouldBe "png"
    metas(2L).width shouldBe 64
    metas(2L).format should (be("jpeg") or be("jpg"))
    metas(3L).width shouldBe 128
    metas(1L).n_bytes shouldBe rows.head._2.length
  }

  test("decoder selection rides the session conf, stub stays the default") {
    import spark.implicits._
    val png = encode(makeImage(40, 30, 9), "png")
    val ds = spark.createDataset(Seq(7L -> png))
    // default = stub: fake hash-derived dims, not the real 40x30
    val stub = Multimodal.decodeImages(ds).collect().head
    stub.width should not be 40
    spark.conf.set("spark.graft.multimodal.decoder", "imageio")
    try {
      val real = Multimodal.decodeImages(ds).collect().head
      real.width shouldBe 40
      real.height shouldBe 30
    } finally spark.conf.unset("spark.graft.multimodal.decoder")
  }

  test("ImageIoDecoder fails loudly on undecodable bytes") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(1L -> "not an image".getBytes))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(ds, Multimodal.ImageIoDecoder).collect()
    }
    ex.getMessage should include("no image reader")
  }

  test("DCT pHash: re-encode ~0 hamming, small edit small hamming, different image far") {
    val base = makeImage(256, 192, 5)
    val phBase = Multimodal.phashOfImage(base)
    // same pixels, different encode path → identical decoded raster
    val reread = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encode(base, "png")))
    Multimodal.phashOfImage(reread) shouldBe phBase
    // small local edit: a 10x10 patch, global structure intact
    val edited = makeImage(256, 192, 5)
    for (y <- 0 until 10; x <- 0 until 10) edited.setRGB(x, y, 0xffffff)
    val phEdit = Multimodal.phashOfImage(edited)
    java.lang.Long.bitCount(phBase ^ phEdit) should be <= 12
    // structurally different image
    val other = makeImage(256, 192, 21)
    val phOther = Multimodal.phashOfImage(other)
    java.lang.Long.bitCount(phBase ^ phOther) should be > 12
  }

  test("real DCT hashes run the same capped-bucket physics via phashPairsFrom") {
    import spark.implicits._
    val base = encode(makeImage(256, 192, 5), "png")
    val edited = {
      val img = makeImage(256, 192, 5)
      for (y <- 0 until 10; x <- 0 until 10) img.setRGB(x, y, 0xffffff)
      encode(img, "png")
    }
    val other = encode(makeImage(256, 192, 21), "png")
    val ds = spark.createDataset(Seq(1L -> base, 2L -> edited, 3L -> other))
      .repartition(2)
    val pairs = Multimodal.phashPairsFrom(Multimodal.phashImages(ds))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))
  }
}
