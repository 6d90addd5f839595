package graft

/** The thin presentation client ([[SearchCli]] — `search.py`'s CLI
  * surface). The engine work it delegates to is covered by the
  * v-family gates; here we pin the CLIENT contract: flag parsing,
  * each command form end-to-end against the tiny corpus, the bounded
  * top-k collect, and the rendered artifact (stats line + one table
  * row per hit, escaped). */
class SearchCliSpec extends SparkSpec {

  private def runTo(args: SearchCli.Args): (String, Seq[String]) = {
    val out = java.io.File.createTempFile("graft-results", ".html")
    out.deleteOnExit()
    SearchCli.run(spark, args.copy(out = out.getAbsolutePath))
    val html = scala.io.Source.fromFile(out, "UTF-8").mkString
    (html, html.linesIterator.filter(_.startsWith("<tr><td>")).toSeq)
  }

  test("flag parsing mirrors the search.py surface") {
    val a = SearchCli.Args("search", text = Some("q"), limit = 7,
      filter = Some("label = 1"))
    a.command shouldBe "search"
    // concept_math takes the expression positionally
    intercept[IllegalArgumentException] {
      SearchCli.run(spark, SearchCli.Args("bogus_command"))
    }
  }

  test("search --text renders limit rows with stats") {
    val (html, rows) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"),
      dir = SparkSpec.TinySf, limit = 5))
    rows should have size 5
    html should include("rows read")
    html should include("a sleepy ridgeback dog")
  }

  test("search --image-vec searches the text side under a filter") {
    val (_, rows) = runTo(SearchCli.Args("search", imageVec = Some(42L),
      dir = SparkSpec.TinySf, limit = 4, filter = Some("label IN (1, 3)")))
    rows should have size 4
    // the filter really constrained the hits
    all(rows.map(_.split("<td>")(5).takeWhile(_ != '<'))) should
      (be("1") or be("3"))
  }

  test("concept_math evaluates the infix algebra client-side") {
    val (_, rows) = runTo(SearchCli.Args("concept_math",
      text = Some("'sleepy dog' + 0.5 * 'ridgeback' - q0"),
      dir = SparkSpec.TinySf, limit = 3))
    rows should have size 3
  }

  test("search --text through an in-process model SERVER ranks bit-identically to the stub path") {
    // the r19 verdict's one remaining delta: the CLI→BatchEmbedder→knn
    // path had only ever run the in-JVM stub. Here a real HTTP model
    // server (a JDK HttpServer wrapping the same deterministic encoder
    // behind the HttpBatchEmbedder JSON contract) serves the query
    // embedding, so the full network path — request JSON, batch shape,
    // float round-trip, dim check — is exercised in-suite; the ranked
    // artifact must be BIT-identical to the stub path's.
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      val model = new graft.operators.VectorSearch.StubBatchEmbedder()
      server.createContext("/embed", { exchange =>
        val body = new String(exchange.getRequestBody.readAllBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        val texts = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
          .findAllMatchIn(body.dropWhile(_ != '[')).map(_.group(1)).toArray
        val rows = model.embed(texts)
          .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
        val bytes = rows.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
      server.start()
      val q = SearchCli.Args("search", text = Some("a sleepy ridgeback dog"),
        dir = SparkSpec.TinySf, limit = 6)
      val (_, stubRows) = runTo(q)
      sys.props("graft.embed.endpoint") =
        s"http://127.0.0.1:${server.getAddress.getPort}/embed"
      val (html, serverRows) = try runTo(q)
      finally sys.props.remove("graft.embed.endpoint")
      serverRows should have size 6
      serverRows shouldBe stubRows // ids, captions, scores — bit-identical
      html should include("rows read")
    } finally server.stop(0)
  }

  test("captions are HTML-escaped") {
    // render() is private; pin the escape through a crafted caption by
    // checking the public artifact: no raw angle brackets beyond markup
    val (html, _) = runTo(SearchCli.Args("search", text = Some("<b>&x"),
      dir = SparkSpec.TinySf, limit = 1))
    html should include("&lt;b&gt;&amp;x")
  }

  test("search --image decodes a real PNG file end-to-end (search.py:51 parity)") {
    // a real 24×16 PNG written through javax.imageio — not corpus bytes
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 24).foreach(x =>
      img.setRGB(x, y, (x * 37 + y * 11) << 8 | x + y)))
    val f = java.io.File.createTempFile("graft-query", ".png")
    f.deleteOnExit()
    javax.imageio.ImageIO.write(img, "png", f)
    val (html, rows) = runTo(SearchCli.Args("search",
      image = Some(f.getAbsolutePath), dir = SparkSpec.TinySf, limit = 3))
    rows should have size 3
    // the real decode surfaced in the rendered query description
    html should include("24×16 png")
    // deterministic: the same pixels rank the same docs on a re-run
    val (_, rows2) = runTo(SearchCli.Args("search",
      image = Some(f.getAbsolutePath), dir = SparkSpec.TinySf, limit = 3))
    rows2 shouldBe rows
    // non-image bytes fail loudly, not silently fake
    val junk = java.io.File.createTempFile("graft-query", ".png")
    junk.deleteOnExit()
    java.nio.file.Files.write(junk.toPath, "not an image".getBytes)
    intercept[IllegalArgumentException] {
      SearchCli.run(spark, SearchCli.Args("search",
        image = Some(junk.getAbsolutePath), dir = SparkSpec.TinySf))
    }
  }

  test("search --tokens ranks by bm25; an all-OOV needle renders empty, not error") {
    val (html, rows) = runTo(SearchCli.Args("search",
      tokens = Some("vector, stream"), dir = SparkSpec.TinySf, limit = 5))
    rows.size should be > 0
    html should include("tokens: vector, stream")
    // bm25 scores render in the score column, descending
    val scores = rows.map(_.split("<td>").last.takeWhile(_ != '<').toDouble)
    scores shouldBe scores.sorted.reverse
    val (html2, rows2) = runTo(SearchCli.Args("search",
      tokens = Some("zzqx,xxyzz"), dir = SparkSpec.TinySf, limit = 5))
    rows2 shouldBe empty
    html2 should include("tokens: zzqx, xxyzz")
  }

  test("search --phrase serves adjacency-exact hits; an OOV phrase renders empty") {
    // "stream table hash" exists at sf0.001 (df 3) — rows match t11's
    // adjacency semantics, ranked by occurrence count
    val (html, rows) = runTo(SearchCli.Args("search",
      phrase = Some("stream table hash"), dir = SparkSpec.TinySf, limit = 10))
    rows.size should be > 0
    html should include("phrase: stream table hash")
    val counts = rows.map(_.split("<td>")(5).takeWhile(_ != '<').toLong)
    counts shouldBe counts.sorted.reverse
    counts.foreach(_ should be >= 1L)
    // any out-of-vocabulary term empties the phrase, not errors
    val (_, rows2) = runTo(SearchCli.Args("search",
      phrase = Some("stream zzqx"), dir = SparkSpec.TinySf, limit = 10))
    rows2 shouldBe empty
    // a one-term "phrase" is a misuse, refused loudly
    an[IllegalArgumentException] should be thrownBy runTo(
      SearchCli.Args("search", phrase = Some("stream"), dir = SparkSpec.TinySf))
  }

  test("search --nprobe serves from the int8 IVF index; full probe == exact") {
    // full probe (every cell) must reproduce the exact L2 top-k the
    // knob-less brute-force path computes over the same image side
    val (exactHtml, exact) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"), dir = SparkSpec.TinySf, limit = 5))
    val (annHtml, ann) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"), dir = SparkSpec.TinySf,
      limit = 5, nprobe = Some(32)))
    def ids(rows: Seq[String]) = rows.map(_.split("<td>")(1).takeWhile(_ != '<'))
    ids(ann) shouldBe ids(exact)
    exactHtml should not include "ivf_cells"
    // the probed fraction renders in the artifact's query description
    annHtml should include("probed=32/32 ivf_cells")
    // --pq routes the same knob through the 8-byte IVF-PQ tier; at
    // full probe the refine makes it exact too
    val (pqHtml, pqRows) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"), dir = SparkSpec.TinySf,
      limit = 5, nprobe = Some(32), pq = true))
    ids(pqRows) shouldBe ids(exact)
    pqHtml should include("pq=8B")
  }

  test("search --probes and --flips serve from the LSH / RP-tree indexes") {
    val (lshHtml, lsh) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"), dir = SparkSpec.TinySf,
      limit = 3, probes = Some(4)))
    lsh.size should be > 0
    lshHtml should include("probed=4/64 lsh_buckets")
    val (rpHtml, rp) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"), dir = SparkSpec.TinySf,
      limit = 3, flips = Some(2)))
    rp.size should be > 0
    rpHtml should include("tree_leaves")
    // widening the probe knob never shrinks what full probe recovers:
    // nprobe=1 hits are a subset of the corpus the exact path ranked
    val (_, narrow) = runTo(SearchCli.Args("search",
      text = Some("a sleepy ridgeback dog"), dir = SparkSpec.TinySf,
      limit = 3, nprobe = Some(1)))
    narrow.size should be <= 3
  }

  test("ANN knobs are mutually exclusive and reject --filter") {
    intercept[IllegalArgumentException] {
      SearchCli.run(spark, SearchCli.Args("search", text = Some("q"),
        dir = SparkSpec.TinySf, nprobe = Some(2), flips = Some(1)))
    }
    intercept[IllegalArgumentException] {
      SearchCli.run(spark, SearchCli.Args("search", text = Some("q"),
        dir = SparkSpec.TinySf, nprobe = Some(2), filter = Some("label = 1")))
    }
    intercept[IllegalArgumentException] { // knobs need a --text query
      SearchCli.run(spark, SearchCli.Args("search", imageVec = Some(1L),
        dir = SparkSpec.TinySf, nprobe = Some(2)))
    }
  }

  test("search --tokens honors --filter (applied before the top-k cut)") {
    val (_, rows) = runTo(SearchCli.Args("search",
      tokens = Some("vector, stream"), dir = SparkSpec.TinySf, limit = 5,
      filter = Some("lang = 'en'")))
    rows.size should be > 0
    all(rows.map(_.split("<td>")(3).takeWhile(_ != '<'))) shouldBe "en"
  }
}
