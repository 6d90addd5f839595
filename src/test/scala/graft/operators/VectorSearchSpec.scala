package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.SparkSpec

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  test("conceptVector == manual (q0 + 0.5*q1) - q2, via the infix parser") {
    val expect = VectorSearch.qvec(0)
      .lazyZip(VectorSearch.qvec(1)).lazyZip(VectorSearch.qvec(2))
      .map((x, y, z) => (x + 0.5 * y) - z)
    VectorSearch.conceptVector shouldBe expect
  }

  test("embedText: Dim components, [-1, 1) range, matches driver md5 math") {
    def hash60Ref(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val text = "some caption text"
    val got = Seq(text).toDF("text")
      .select(VectorSearch.embedText(col("text")).as("v"))
      .head().getSeq[Double](0)
    got.length shouldBe VectorSearch.Dim
    got.zipWithIndex.foreach { case (x, i) =>
      x shouldBe (hash60Ref(s"$text:$i") % 1000L).toDouble / 500.0 - 1.0
      x should (be >= -1.0 and be < 1.0)
    }
  }

  test("ingestCombine carries a map<string,string> exif column that round-trips") {
    val out = VectorSearch.ingestCombine(spark, graft.SparkSpec.TinySf)
    out.schema("exif").dataType shouldBe MapType(StringType, StringType)
    val rows = out.select(col("source"), col("lang"),
      element_at(col("exif"), "source").as("es"),
      element_at(col("exif"), "lang").as("el")).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getString(2) shouldBe r.getString(0)
      r.getString(3) shouldBe r.getString(1)
    }
  }

  test("ingestCombine carries BOTH modality embeddings; cross-modal knn searches the text side") {
    val out = VectorSearch.ingestCombine(spark, graft.SparkSpec.TinySf)
    // dual-embedding row, like the reference's process.py:46-47 schema
    out.columns should contain allOf ("image_embedding", "text_embedding")
    val row = out.select(col("image_embedding"), col("text_embedding")).head()
    row.getSeq[Float](0).length shouldBe VectorSearch.Dim
    row.getSeq[Double](1).length shouldBe VectorSearch.Dim

    val hits = VectorSearch.crossModalKnn(spark, graft.SparkSpec.TinySf, k = 5).collect()
    hits.length shouldBe 5
    val scores = hits.map(_.getAs[Double]("score")).toSeq
    scores shouldBe scores.sorted
    // cross-modal really reads the TEXT side: scores match a hand-built
    // cosine against embedText, not against image_embedding
    val byDoc = out.select(col("doc_id"), col("text_embedding")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
    val q = VectorSearch.qvec(6)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      1.0 - dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    hits.foreach { h =>
      val want = cos(byDoc(h.getAs[Long]("doc_id")), q)
      math.abs(h.getAs[Double]("score") - want) should be < 1e-12
    }
  }

  test("knn hits carry the embedding payload (search.py parity)") {
    val hits = VectorSearch.knnL2(spark, graft.SparkSpec.TinySf, k = 3)
    hits.columns should contain("embedding")
    hits.collect().foreach { r =>
      r.getSeq[Float](r.fieldIndex("embedding")).length shouldBe VectorSearch.Dim
    }
    // the driver-gated form explodes the payload into (pos, comp)
    // rows: k hits x Dim scalar doubles, lossless through the gate
    val comps = VectorSearch.withEmbeddingComponents(hits).collect()
    comps.length shouldBe 3 * VectorSearch.Dim
    val first = hits.head().getSeq[Float](hits.head().fieldIndex("embedding"))
    val firstId = hits.head().getAs[Long]("vec_id")
    comps.filter(_.getAs[Long]("vec_id") == firstId)
      .sortBy(_.getAs[Int]("pos"))
      .map(_.getAs[Double]("comp")) shouldBe first.map(_.toDouble)
  }

  test("v9 persisted combine: same hits as the inline rebuild; scan-only plan") {
    val persisted = VectorSearch.crossModalKnn(spark, graft.SparkSpec.TinySf, k = 5)
    val inline = VectorSearch.crossModalKnnInline(spark, graft.SparkSpec.TinySf, k = 5)
    persisted.collect().map(_.toSeq).toSeq shouldBe inline.collect().map(_.toSeq).toSeq
    // the combine is READ, not rebuilt: no id join, no text-embed
    // recompute, no exchange — just scan + per-partition k-heap merge
    val plan = persisted.queryExecution.executedPlan.toString
    plan.toLowerCase should not include "join"
    plan should not include "Exchange"
    plan should include("TakeOrderedAndProject")
  }

  test("ingestWriteBucketed: re-join on the bucket key plans without a shuffle") {
    val df = VectorSearch.ingestCombine(spark, graft.SparkSpec.TinySf)
      .select(col("doc_id"), col("caption"))
    // the in-memory catalog is fresh per JVM but the warehouse dir is
    // not — clear any leftover location from a previous test run
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_spec")
    val loc = new java.io.File("/tmp/graft-warehouse/graft_bucketed_spec")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    VectorSearch.ingestWriteBucketed(df, "graft_bucketed_spec", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("graft_bucketed_spec")
      val joined = t.as("x").join(t.as("y"), "doc_id")
      joined.count() shouldBe df.count()
      // both sides read pre-bucketed data: hash partitioning comes from
      // the files, not an exchange
      joined.queryExecution.executedPlan.toString should
        not include "Exchange hashpartitioning"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ingestWritePartitioned: lang predicate becomes a partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = VectorSearch.ingestCombine(spark, graft.SparkSpec.TinySf)
      .select(col("doc_id"), col("caption"), col("lang"))
    VectorSearch.ingestWritePartitioned(df, dir)
    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    filtered.count() shouldBe df.filter(col("lang") === "en").count()
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    scan.partitionFilters.map(_.toString).mkString(",") should include("lang")
    // nothing left to filter row-by-row: pruning happened at planning
    scan.dataFilters shouldBe empty
  }

  test("l2_normalize yields unit vectors; zero vector stays zero") {
    graft.functions.vectors.register(spark)
    val out = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0)).toDF("v")
      .select(graft.functions.vectors.l2Normalize(col("v")).as("u"))
      .collect()
    out(0).getSeq[Double](0) shouldBe Seq(0.6, 0.8)
    out(1).getSeq[Double](0) shouldBe Seq(0.0, 0.0)
  }

  test("vector distances fail loudly on dimension mismatch") {
    graft.functions.vectors.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.vectors.l2Distance(col("a"), col("b"))).collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    messages should include("size mismatch")
  }

  test("ingestWrite produces zstd parquet that reads back identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd").toString
    val df = VectorSearch.ingestCombine(spark, graft.SparkSpec.TinySf)
    VectorSearch.ingestWrite(df, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    files.filter(_.endsWith(".parquet")).foreach { f =>
      f should include(".zstd.")
    }
    val back = spark.read.parquet(dir)
    back.count() shouldBe df.count()
    back.schema("exif").dataType shouldBe MapType(StringType, StringType)
  }

  test("int8_pack: away-from-zero rounding, max maps to ±127, zeros stay zero") {
    graft.functions.vectors.register(spark)
    val v = Seq(1.0, -1.0, 0.5, -0.5, 0.0, 0.25)
    val bytes = Seq(Tuple1(v)).toDF("v")
      .select(graft.functions.vectors.int8Pack(col("v")).as("b"))
      .head().getAs[Array[Byte]](0)
    // scale = 1.0/127 → codes = round(x*127): 127, -127, round(63.5)=64
    // (away from zero), -64, 0, round(31.75)=32
    bytes.toSeq shouldBe Seq[Byte](127, -127, 64, -64, 0, 32)
    val zeros = Seq(Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(graft.functions.vectors.int8Pack(col("v")).as("b"))
      .head().getAs[Array[Byte]](0)
    zeros.toSeq shouldBe Seq[Byte](0, 0)
  }

  test("cosine_distance_i8 == cosine_distance over the integer codes") {
    graft.functions.vectors.register(spark)
    val q = VectorSearch.qvec(1)
    val rows = spark.read.parquet(graft.SparkSpec.TinySf + "/embeddings.parquet")
      .select(
        graft.functions.vectors.cosineDistanceI8(
          graft.functions.vectors.int8Pack(col("embedding")), typedlit(q)).as("qi8"),
        graft.functions.vectors.cosineDistance(
          transform(col("embedding"), x =>
            // dequantized codes as doubles, same rounding as the pack
            when(x >= 0, floor(x.cast("double") / (array_max(transform(col("embedding"),
              y => abs(y))).cast("double") / 127.0) + 0.5))
              .otherwise(-floor(-x.cast("double") / (array_max(transform(col("embedding"),
                y => abs(y))).cast("double") / 127.0) + 0.5))
              .cast("double")),
          typedlit(q)).as("ref"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      r.getDouble(0) shouldBe r.getDouble(1) +- 1e-12
    }
  }

  test("quantized knn: recall@10 vs exact v2 and a >=3x smaller serving copy") {
    val d = graft.SparkSpec.TinySf
    val exact = VectorSearch.knnCosine(spark, d).select("vec_id")
      .as[Long].collect().toSet
    val got = VectorSearch.quantizedKnn(spark, d).select("vec_id")
      .as[Long].collect().toSet
    // measured 1.0 on this corpus; pinned with slack for regeneration
    (exact & got).size.toDouble / exact.size should be >= 0.8
    // the scan-byte lever: the int8 copy must be a small fraction of
    // the float32 original (64 B vs 256 B per vector before parquet)
    def bytesOf(f: java.io.File): Long =
      if (f.isFile) f.length
      else f.listFiles().map(bytesOf).sum
    val qdir = new java.io.File(VectorSearch.ensureQuantized(spark, d))
    val full = new java.io.File(d + "/embeddings.parquet")
    bytesOf(qdir) should be < (bytesOf(full) / 3)
  }

  test("cosine_distance_i8 rejects non-binary / non-array arguments at analysis") {
    graft.functions.vectors.register(spark)
    val df = Seq((Array[Byte](1, 2), Seq(1.0, 2.0))).toDF("b", "v")
    intercept[Exception](
      df.select(graft.functions.vectors.cosineDistanceI8(col("v"), col("v"))).collect())
      .getMessage should include("cosine_distance_i8")
    intercept[Exception](
      df.select(graft.functions.vectors.cosineDistanceI8(col("b"), col("b"))).collect())
      .getMessage should include("cosine_distance_i8")
    // size mismatch fails loudly like the float-side distances
    val e = intercept[Exception](
      df.select(graft.functions.vectors.cosineDistanceI8(col("b"),
        typedlit(Seq(1.0, 2.0, 3.0)))).collect())
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    messages should include("size mismatch")
  }

  test("vq2: quantized L2 knn recall vs exact v1; scale dequantizes in the loop") {
    val d = graft.SparkSpec.TinySf
    val exact = VectorSearch.knnL2(spark, d).select("vec_id")
      .as[Long].collect().toSet
    val got = VectorSearch.quantizedKnnL2(spark, d).select("vec_id")
      .as[Long].collect().toSet
    (exact & got).size.toDouble / exact.size should be >= 0.8
    // hand check on a tiny vector: scale = 1.0/127, codes = (127, -64),
    // dequantized = (1.0, -64/127); L2 vs query (0, 0)
    graft.functions.vectors.register(spark)
    val r = Seq(Tuple1(Seq(1.0, -0.5))).toDF("v")
      .select(graft.functions.vectors.l2DistanceI8(
        graft.functions.vectors.int8Pack(col("v")),
        lit(1.0 / 127.0),
        typedlit(Seq(0.0, 0.0))).as("s"))
      .head().getDouble(0)
    val dq0 = 1.0
    val dq1 = -64.0 / 127.0
    r shouldBe math.sqrt(dq0 * dq0 + dq1 * dq1) +- 1e-15
  }

  test("i8 functions are null-intolerant like the float-side distances") {
    graft.functions.vectors.register(spark)
    val df = Seq((Option(Array[Byte](1, 2)), Option(1.0), Option(Seq(1.0, 2.0))))
      .toDF("b", "s", "v")
    def isNull(c: org.apache.spark.sql.Column): Boolean =
      df.select(c).head().isNullAt(0)
    isNull(graft.functions.vectors.cosineDistanceI8(lit(null).cast("binary"), col("v"))) shouldBe true
    isNull(graft.functions.vectors.cosineDistanceI8(col("b"), lit(null).cast("array<double>"))) shouldBe true
    isNull(graft.functions.vectors.l2DistanceI8(col("b"), lit(null).cast("double"), col("v"))) shouldBe true
    isNull(graft.functions.vectors.l2DistanceI8(lit(null).cast("binary"), col("s"), col("v"))) shouldBe true
    isNull(graft.functions.vectors.int8Pack(lit(null).cast("array<double>"))) shouldBe true
  }

  test("int8_pack property: codes bounded, max component hits ±127, dequantize error ≤ scale/2") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    graft.functions.vectors.register(spark)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))
      .suchThat(v => v.exists(_ != 0.0))
    val cases = (0 until 20).flatMap(i =>
      vecGen.apply(Gen.Parameters.default, Seed(99L + i)))
    val df = cases.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v"),
        graft.functions.vectors.int8Pack(col("v")).as("b"))
      .collect()
    df.foreach { r =>
      val v = r.getSeq[Double](1)
      val b = r.getAs[Array[Byte]](2)
      b.length shouldBe v.length
      val s = v.map(math.abs).max / 127.0
      all(b.map(_.toInt).toSeq) should (be >= -127 and be <= 127)
      // the max-magnitude component maps to exactly ±127
      val mi = v.indexWhere(x => math.abs(x) == v.map(math.abs).max)
      math.abs(b(mi).toInt) shouldBe 127
      // round-to-nearest: dequantize error is at most half a step
      v.indices.foreach { i =>
        math.abs(b(i) * s - v(i)) should be <= (s / 2 + 1e-12)
      }
    }
  }
}
