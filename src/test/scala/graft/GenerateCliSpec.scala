package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** generate.py's CLI surface: one vector per --text/--image call,
  * batch-file mode writing output.txt with the timing line. Pure
  * driver-side (no SparkSession) — mirrors the reference, which is a
  * client-side model call too. */
class GenerateCliSpec extends AnyFunSuite with Matchers {

  private def capture(argv: Array[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    GenerateCli.run(argv, new java.io.PrintStream(bos, true, "UTF-8"))
    bos.toString("UTF-8")
  }

  test("--text prints one 64-dim vector, deterministic") {
    val a = capture(Array("--text", "a sleepy ridgeback dog"))
    val b = capture(Array("--text", "a sleepy ridgeback dog"))
    a shouldBe b
    a.trim should startWith("[")
    a.trim.split(",").length shouldBe 64
  }

  test("--file embeds every line in order and prints the timing line") {
    val f = java.io.File.createTempFile("graft-gen", ".txt")
    f.deleteOnExit()
    val texts = (1 to 130).map(i => s"prompt number $i") // 3 batches of 64
    java.nio.file.Files.write(f.toPath,
      texts.mkString("\n").getBytes("UTF-8"))
    val out = capture(Array("--file", f.getAbsolutePath))
    out should include("130 embeddings generated in")
    val lines = scala.io.Source.fromFile("output.txt", "UTF-8")
      .getLines().toSeq
    lines.length shouldBe 130
    // order-aligned with the input: line i is the embedding of text i
    lines(17) shouldBe capture(Array("--text", texts(17))).trim
    new java.io.File("output.txt").delete()
  }

  test("--image embeds a real PNG through the decode chain") {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      img.setRGB(x, y, x * 31 + y)))
    val f = java.io.File.createTempFile("graft-gen", ".png")
    f.deleteOnExit()
    javax.imageio.ImageIO.write(img, "png", f)
    val out = capture(Array("--image", f.getAbsolutePath))
    out.trim.split(",").length shouldBe 64
  }
}
