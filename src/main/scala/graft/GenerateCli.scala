package graft

import graft.operators.VectorSearch

/** The reference's `generate.py` CLI re-expressed over the engine's
  * embedding seam: generate an embedding for `--text`, a real
  * `--image` file, or every line of `--file` (the batch mode that
  * writes `output.txt` and prints the timing line —
  * generate.py:31-40).
  *
  * The model behind the seam is the deterministic stub
  * ([[VectorSearch.StubBatchEmbedder]]); a deployment swaps its CLIP
  * endpoint in behind the same [[VectorSearch.BatchEmbedder]]
  * interface (the reference loads ViT-L/14 client-side — an external
  * model there too). The `--file` path exercises the REAL batch
  * plumbing the engine uses for corpus embedding (`embedBatched`'s
  * contract: fixed-size batches, one embed call per batch,
  * order-aligned), driver-side over the file's lines — no cluster
  * needed to embed a prompt list.
  */
object GenerateCli {

  private val stub = new VectorSearch.StubBatchEmbedder()

  private def fmt(v: Seq[Double]): String =
    v.mkString("[", ", ", "]")

  def run(argv: Array[String], out: java.io.PrintStream): Unit = {
    val usage = "usage: GenerateCli --text T | --image F | --file F"
    require(argv.length == 2, usage)
    argv(0) match {
      case "--text" =>
        out.println(fmt(stub.embed(Array(argv(1))).head.map(_.toDouble).toSeq))
      case "--image" =>
        val (vec, _) = SearchCli.embedImageFile(argv(1))
        out.println(fmt(vec))
      case "--file" =>
        val lines = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(argv(1)))
        val t0 = System.nanoTime()
        val w = new java.io.PrintWriter("output.txt", "UTF-8")
        try {
          // the embedBatched batch shape: fixed-size chunks, ONE
          // embed round trip per chunk, order preserved
          scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala
            .grouped(64).foreach { chunk =>
              val vecs = stub.embed(chunk.toArray)
              require(vecs.length == chunk.size,
                s"embedder returned ${vecs.length} vectors for ${chunk.size}")
              vecs.foreach(v => w.println(fmt(v.map(_.toDouble).toSeq)))
            }
        } finally w.close()
        val sec = (System.nanoTime() - t0) / 1e9
        out.println(
          s"${lines.size()} embeddings generated in ${math.round(sec * 1000) / 1000.0}s")
      case other => throw new IllegalArgumentException(s"$other\n$usage")
    }
  }

  def main(argv: Array[String]): Unit = run(argv, System.out)
}
