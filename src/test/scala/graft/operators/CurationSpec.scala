package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta epsilon text one", "en", "src0", 39),
    (1L, "alpha beta gamma delta epsilon text two longer", "en", "src0", 47),
    (2L, "contact me at someone@example.com for details", "en", "src1", 45),
    (3L, "my number is 1234567890 call me", "de", "src1", 31),
    (4L, "kurzer text ohne besonderheiten hier", "de", "src0", 36),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hashSplit partitions every doc into exactly one split") {
    val out = Curation.hashSplit(docs).collect()
    out.map(_.getAs[Long]("n_docs")).sum shouldBe docs.count()
    out.map(_.getAs[String]("split")).toSet subsetOf
      Set("train", "val", "test") shouldBe true
  }

  test("stratifiedSample is deterministic and a subset") {
    val a = Curation.stratifiedSample(docs).collect().map(_.getLong(0)).toSeq
    val b = Curation.stratifiedSample(docs).collect().map(_.getLong(0)).toSeq
    a shouldBe b
    a.toSet subsetOf Set(0L, 1L, 2L, 3L, 4L) shouldBe true
  }

  test("groupCanonical keeps the longest doc per group, min-id ties") {
    val out = Curation.groupCanonical(docs).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
        (r.getAs[Long]("keeper"), r.getAs[Long]("n_docs")))).toMap
    out(("en", "src0")) shouldBe ((1L, 2L)) // 47 chars beats 39
    out(("en", "src1")) shouldBe ((2L, 1L))
    out(("de", "src0")) shouldBe ((4L, 1L))
    out(("de", "src1")) shouldBe ((3L, 1L))
  }

  test("piiScrub flags exactly the docs containing an email or long number") {
    val out = Curation.piiScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("changed")).toMap
    out(2L) shouldBe true // email
    out(3L) shouldBe true // 10-digit run
    out(0L) shouldBe false
    out(4L) shouldBe false
  }

  test("ngramStats counts shingle document frequency") {
    val out = Curation.ngramStats(docs).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("df")).toMap
    // docs 0 and 1 share the 'alpha beta gamma' shingle
    out("alpha beta gamma") shouldBe 2L
    out("beta gamma delta") shouldBe 2L
  }

  test("contamination counts candidate shingles overlapping the bench set; bench join broadcast") {
    import spark.implicits._
    val corpus = Seq(
      (7L, "aa bb cc dd"),     // bench doc (id % 20 == 7): shingles 'aa bb cc', 'bb cc dd'
      (1L, "xx aa bb cc yy"),  // shares 'aa bb cc' -> 1 of 3 shingles contaminated
      (2L, "pp qq rr ss"),     // no overlap
      (3L, "zz"),              // too short: zero shingles
    ).toDF("doc_id", "text")
    val byId = Curation.contamination(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"),
          r.getAs[Double]("frac")))).toMap
    byId.keySet shouldBe Set(1L, 2L, 3L) // bench doc excluded from output
    byId(1L) shouldBe ((3L, 1L, 1.0 / 3.0))
    byId(2L) shouldBe ((2L, 0L, 0.0))
    byId(3L) shouldBe ((0L, 0L, 0.0))
    // the bench side must be broadcast: no shuffle of corpus x bench
    Curation.contamination(corpus).queryExecution.executedPlan.toString should
      include("BroadcastHashJoin")
  }

  test("c7 layout: one full file per bucket, lossless, partition-prunable") {
    import spark.implicits._
    val docs = (0L until 25L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-c7-spec").toString + "/layout"
    val stats = Curation.partitionedLayout(docs, dir, rowsPerBucket = 10L)
      .collect()(0)
    stats.getAs[Long]("n_rows") shouldBe 25L
    stats.getAs[Long]("n_files") shouldBe 3L // buckets 0,1 full + bucket 2 of 5
    stats.getAs[Long]("max_file_rows") shouldBe 10L
    stats.getAs[Boolean]("lossless") shouldBe true
    // the bucket= directory layout must prune at planning time
    val pruned = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("bucket") === 1)
    pruned.count() shouldBe 10L
    pruned.queryExecution.executedPlan.toString should
      include regex "PartitionFilters: \\[[^\\]]*bucket"
  }

  test("pipelineGate: every stage bites — language, quality floor, dedup, split") {
    // the, of, and, to, in: 5 en stopwords in 14 tokens → quality
    // 0.2 + 2·(5/14) + 14/500 = 0.942; vote: en
    val goodEn = "the storm of the north and the rain to come in a dark night"
    val pipelineDocs = Seq(
      (1L, goodEn),
      (10L, goodEn + " again and again the wind"), // near phrase, distinct text
      (11L, goodEn + " again and again the wind"), // EXACT duplicate of 10
      (20L, "der sturm und die nacht ist ein zeichen von der zeit"), // de vote
      (30L, "alpha beta gamma"), // en by tie-break, quality 0.206 < floor
    ).toDF("doc_id", "text")
    val out = Curation.pipelineGate(pipelineDocs).collect()
    // 20 fails language, 30 fails quality, 11 is deduped behind 10
    out.map(_.getAs[Long]("doc_id")) shouldBe Array(1L, 10L)
    out.foreach { r =>
      r.getAs[Double]("quality") should be >= Curation.QualityFloor
      Set("train", "val", "test") should contain(r.getAs[String]("split"))
    }
  }
}
