package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Integration smoke of the REAL-embedder serving path — the one
  * search.py delta the offline gates cannot close (search.py:40-57:
  * the CLIP forward pass behind the query). The stub equivalence and
  * the HTTP plumbing are pinned offline (EmbedSeamSpec); this test
  * exercises the same code path against an ACTUAL model server.
  *
  * How to run it for real:
  *   1. stand up any text encoder behind the
  *      [[graft.operators.VectorSearch.HttpBatchEmbedder]] JSON
  *      contract — POST {"texts":[...]}, respond with a JSON array of
  *      float rows. E.g. a ~10-line wrapper over a small public
  *      sentence-encoder checkpoint, projecting (or trained) to the
  *      corpus dim.
  *   2. GRAFT_EMBED_ENDPOINT=http://host:port/embed \
  *      [GRAFT_EMBED_DIM=<dim>] sbt "testOnly graft.RealEmbedderSmokeSpec"
  *
  * OFFLINE (this sandbox's default — no network egress, no model
  * weights): the test CANCELS with an explanatory message. A canceled
  * test is the documented skip, visible in the report — not a silent
  * green.
  *
  * Pins SHAPE and FINITENESS only, never values: a real model's
  * vectors are not deterministic across versions/hardware, so the
  * contract here is "the pipe works end-to-end", not a hash. */
class RealEmbedderSmokeSpec extends AnyFunSuite with Matchers {

  test("SearchCli --text serves end-to-end from a real embed endpoint") {
    val ep = sys.env.get("GRAFT_EMBED_ENDPOINT")
    assume(ep.isDefined,
      "GRAFT_EMBED_ENDPOINT not set — offline sandbox; see the spec " +
        "scaladoc for how to point this at a real text-encoder server")
    val dim = sys.env.get("GRAFT_EMBED_DIM").map(_.toInt)
      .getOrElse(graft.operators.VectorSearch.Dim)

    // the endpoint answers the raw seam contract
    val emb = new graft.operators.VectorSearch.HttpBatchEmbedder(ep.get, dim)
    val vecs = emb.embed(Array("a photo of a dog", "stormy coastline"))
    vecs.length shouldBe 2
    vecs.foreach { v =>
      v.length shouldBe dim
      all(v.toSeq.map(_.toDouble)) should not be Double.NaN
      v.map(math.abs(_)).max.toDouble should be > 0.0 // not the zero vector
    }

    // ...and the full CLI path (embed → knn over the corpus → HTML):
    // SearchCli picks the endpoint up from the same env var
    val spark = SparkSpec.session
    val out = java.io.File.createTempFile("graft-real-embed", ".html")
    out.deleteOnExit()
    SearchCli.run(spark, SearchCli.Args("search",
      text = Some("a photo of a dog"), dir = SparkSpec.TinySf,
      limit = 5, out = out.getAbsolutePath, noOpen = true))
    val html = scala.io.Source.fromFile(out, "UTF-8").mkString
    val rows = html.linesIterator.count(_.startsWith("<tr><td>"))
    rows shouldBe 5
    html should include("rows read")
  }
}
