package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.streaming.EventStream.{Event, Session}

/** s1–s4 behaviors, parameterized by the state-store provider: the
  * whole suite runs once on the default HDFS-backed store
  * ([[EventStreamSpec]]) and once on RocksDB
  * ([[EventStreamRocksDBSpec]]) — same assertions, so a provider swap
  * that changes semantics (timeout handling, watermark eviction,
  * dedup guarantees) fails loudly. Query/table names carry the store
  * suffix so the two suites' memory sinks never collide. */
abstract class EventStreamSuiteBase extends SparkSpec {

  /** Memory-sink name suffix + identity of the store under test. */
  protected def store: String
  private def qn(base: String): String = s"${base}_$store"

  /** Minutes offset from a base well past epoch 0 — an event AT the
    * initial watermark (epoch 0) is dropped as late, which is exactly
    * the edge this base avoids. */
  private val BaseMin = 24L * 60 * 365
  private def ts(minutes: Long): Timestamp =
    new Timestamp((BaseMin + minutes) * 60000L)

  import spark.implicits._

  test(s"[$store] s1 batch mode: same plan aggregates a batch DataFrame") {
    val df = Seq(
      Event(1, ts(1), "click", 1.0),
      Event(2, ts(2), "click", 2.0),
      Event(1, ts(11), "view", 5.0),
    ).toDF()
    val out = EventStream.windowedCounts(df, "10 minutes", "5 minutes")
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime / 60000L - BaseMin,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value"))).sortBy(t => (t._1, t._2))
    out shouldBe Array((0L, "click", 2L, 3.0), (10L, "view", 1L, 5.0))
  }

  test(s"[$store] s1 streaming: windowed counts over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName(qn("s1out"))
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(1), "click", 1.0),
        Event(2, ts(2), "click", 2.0),
        Event(1, ts(11), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table(qn("s1out")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n")))
        .toSet
      rows shouldBe Set(("click", 2L), ("view", 1L))
      // incremental: a second micro-batch extends the same window state
      input.addData(Event(3, ts(3), "click", 7.0))
      q.processAllAvailable()
      val rows2 = spark.table(qn("s1out")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n")))
        .toSet
      rows2 shouldBe Set(("click", 3L), ("view", 1L))
    } finally q.stop()
  }

  test(s"[$store] s1 append mode emits only watermark-finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName(qn("s1append"))
      .outputMode("append").start()
    try {
      input.addData(Event(1, ts(1), "click", 1.0), Event(2, ts(2), "click", 2.0))
      q.processAllAvailable()
      // watermark hasn't passed the [0,10) window yet — nothing emitted
      spark.table(qn("s1append")).count() shouldBe 0
      // an event far ahead pushes the watermark past minute 10 ...
      input.addData(Event(3, ts(30), "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(31), "view", 1.0))
      q.processAllAvailable()
      // ... so the first window is finalized and emitted exactly once
      val rows = spark.table(qn("s1append")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n")))
      rows shouldBe Array(("click", 2L))
    } finally q.stop()
  }

  test(s"[$store] s5 streaming topk: sketch state merges across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedTopK(input.toDF(), "10 minutes", "5 minutes",
        capacity = 8, k = 2)
      .writeStream.format("memory").queryName(qn("s5out"))
      .outputMode("append").start()
    try {
      // window [0,10): user 1 twice, user 2 once — across TWO batches,
      // so the serialized summary must round-trip the state store and
      // merge with the second batch's partial
      input.addData(Event(1, ts(1), "click", 1.0), Event(2, ts(2), "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(3), "click", 1.0))
      q.processAllAvailable()
      spark.table(qn("s5out")).count() shouldBe 0 // window still open
      // push the watermark past minute 10 to finalize the window
      input.addData(Event(9, ts(30), "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(9, ts(31), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table(qn("s5out")).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"),
          r.getAs[Int]("rk")))
      rows.sortBy(_._3) shouldBe Array((1L, 2L, 1), (2L, 1L, 2))
    } finally q.stop()
  }

  test(s"[$store] s5 heavy-hitter candidates: fixed capacity, eviction across batches, completeness") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // capacity 4 with 30+ distinct keys per window — the eviction
    // regime the driver gate runs at larger scale. user 1 is the one
    // key above n/(capacity+1); it must survive ANY state-store merge
    // order even though the candidate tail churns.
    val q = EventStream.windowedHeavyHitters(input.toDF(),
        org.apache.spark.sql.functions.col("user_id"),
        "10 minutes", "5 minutes", capacity = 4)
      .writeStream.format("memory").queryName(qn("s5hh"))
      .outputMode("append").start()
    try {
      // window [0,10): 3 batches; heavy key 1 spread across them,
      // 30 unique tail keys forcing prunes at capacity 4
      input.addData((1 to 10).map(i => Event(100 + i, ts(1), "t", 1.0)) :+
        Event(1, ts(1), "t", 1.0): _*)
      q.processAllAvailable()
      input.addData((11 to 20).map(i => Event(100 + i, ts(2), "t", 1.0)) :+
        Event(1, ts(2), "t", 1.0): _*)
      q.processAllAvailable()
      input.addData((21 to 30).map(i => Event(100 + i, ts(3), "t", 1.0)) ++
        Seq.fill(10)(Event(1, ts(3), "t", 1.0)): _*)
      q.processAllAvailable()
      spark.table(qn("s5hh")).count() shouldBe 0 // window still open
      input.addData(Event(999, ts(30), "t", 1.0))
      q.processAllAvailable()
      input.addData(Event(999, ts(31), "t", 1.0))
      q.processAllAvailable()
      val rows = spark.table(qn("s5hh")).collect()
      rows.length shouldBe 1
      val cand = rows.head.getAs[scala.collection.Seq[Long]]("cand")
      val n = rows.head.getAs[Long]("n")
      n shouldBe 42L
      cand.length should be <= 8 // ≤ 2·capacity — bounded state
      // key 1 has true count 12 > 42/5: guaranteed present
      cand should contain(1L)
    } finally q.stop()
  }

  test(s"[$store] s1 file-source stream (driver-gated path) matches the batch twin") {
    import org.apache.spark.sql.functions._
    val got = EventStream.s1Query(spark, SparkSpec.TinySf)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2))
    // batch twin: same agg, windows closed by the FINAL watermark
    // (max event time floored to ms, minus the 30-minute delay)
    val ev = graft.Tables.events(spark, SparkSpec.TinySf)
    val maxMs = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val wmMs = maxMs - 30L * 60000L
    val want = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .filter(col("w.end") <= lit(new Timestamp(wmMs)))
      .select(col("w.start"), col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2))
    got shouldBe want
  }

  test(s"[$store] s3 streaming dedup drops in-watermark duplicate content") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.dedupStream(
        input.toDF().toDF("doc_id", "ts", "text"), watermark = "10 minutes")
      .writeStream.format("memory").queryName(qn("s3out"))
      .outputMode("append").start()
    try {
      input.addData((0L, ts(0), "alpha"), (1L, ts(1), "beta"), (2L, ts(2), "alpha"))
      q.processAllAvailable()
      // same-batch duplicate "alpha" collapsed
      spark.table(qn("s3out")).count() shouldBe 2
      // cross-batch duplicate within the watermark also collapsed
      input.addData((3L, ts(3), "beta"), (4L, ts(4), "gamma"))
      q.processAllAvailable()
      val texts = spark.table(qn("s3out")).collect()
        .map(_.getAs[String]("text")).sorted
      texts shouldBe Array("alpha", "beta", "gamma")
    } finally q.stop()
  }

  test(s"[$store] s4 stream-stream alignment joins doc/embedding halves within the delay") {
    implicit val sqlCtx = spark.sqlContext
    val docsIn = MemoryStream[(Long, Timestamp, String)]
    val embsIn = MemoryStream[(Long, Timestamp, Seq[Float])]
    val q = EventStream.alignStreams(
        docsIn.toDF().toDF("doc_id", "ts", "text"),
        embsIn.toDF().toDF("vec_id", "ets", "embedding"),
        maxDelay = "30 minutes")
      .writeStream.format("memory").queryName(qn("s4out"))
      .outputMode("append").start()
    try {
      docsIn.addData((1L, ts(0), "doc one"), (2L, ts(5), "doc two"))
      embsIn.addData((1L, ts(10), Seq(1f, 2f))) // 10 min after doc 1: joins
      q.processAllAvailable()
      spark.table(qn("s4out")).collect().map(_.getAs[Long]("doc_id")) shouldBe Array(1L)
      embsIn.addData((2L, ts(120), Seq(3f, 4f))) // 115 min after doc 2: outside bound
      q.processAllAvailable()
      spark.table(qn("s4out")).collect().map(_.getAs[Long]("doc_id")) shouldBe Array(1L)
    } finally q.stop()
  }

  test(s"[$store] s6 ingest dedup is batch-split-invariant: two shard files, two batches, same union") {
    val base = "the quick brown fox jumps over the lazy dog while the storm " +
      "gathers strength beyond the eastern ridge and rain begins to fall"
    val other = "completely different content about spark catalyst optimizer " +
      "rules rewriting logical plans into physical execution strategies"
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-s6-").toString
    Seq((0L, base), (1L, other)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    // two shard files landing in the watched dir — each a near-dup of a
    // different corpus doc, plus one novel doc that must emit nothing
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s6-sh-").toString
    Seq((100L, base + " again")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$shardRoot/shard_a.parquet")
    Seq((200L, other + " too"), (201L, "totally novel words about gardens " +
        "and rivers flowing north past the old mill unlike anything stored"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$shardRoot/shard_b.parquet")
    val schema = spark.read.parquet(s"$shardRoot/shard_a.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/shard_*.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-s6-out-").toString
    val q = EventStream.ingestDedup(src, corpusDir,
      s"$out/verdicts", s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 2
    val got = spark.read.parquet(s"$out/verdicts").collect()
      .map(r => (r.getAs[Long]("shard_doc"), r.getAs[Long]("corpus_doc"))).toSet
    // union over the two batches == the whole-shard result
    got shouldBe Set((100L, 0L), (200L, 1L))
  }

  test(s"[$store] s1 recovery: restart from checkpoint resumes exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-ck-$store-").toString
    val sink = java.nio.file.Files.createTempDirectory(s"graft-sk-$store-").toString
    def start() = EventStream.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      input.addData(Event(1, ts(1), "click", 1.0), Event(2, ts(2), "click", 2.0))
      q1.processAllAvailable()
      // two more batches: watermark passes [0,10) and the window lands
      // in the sink BEFORE the crash point
      input.addData(Event(3, ts(30), "view", 1.0))
      q1.processAllAvailable()
      input.addData(Event(3, ts(31), "view", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart against the SAME checkpoint: offsets + window state come
    // back; new data finalizes the pre-restart [30,40) view window
    val q2 = start()
    try {
      input.addData(Event(4, ts(60), "click", 9.0))
      q2.processAllAvailable()
      input.addData(Event(4, ts(61), "click", 9.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(sink).collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime / 60000L - BaseMin,
        r.getAs[String]("event_type"), r.getAs[Long]("n")))
      .sorted
    // exactly-once: the pre-restart window appears ONCE (not re-emitted
    // after recovery), and state that straddled the restart ([30,40)
    // with both view events) finalizes with the full count
    rows shouldBe Array((0L, "click", 2L), (30L, "view", 2L))
  }

  test(s"[$store] s2 streaming sessionization: gap-close and watermark-timeout-close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(),
        gapMs = 30 * 60000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName(qn("s2out"))
      .outputMode("append").start()
    try {
      // session A: user 1, two events 10 min apart (same session)
      input.addData(Event(1, ts(0), "click", 1.0), Event(1, ts(10), "click", 2.0))
      q.processAllAvailable()
      spark.table(qn("s2out")).count() shouldBe 0 // still open

      // 110-min gap → session A closes in-batch, session B opens
      input.addData(Event(1, ts(120), "click", 3.0))
      q.processAllAvailable()
      val afterGap = spark.table(qn("s2out")).as[Session].collect()
      afterGap.length shouldBe 1
      afterGap(0).user_id shouldBe 1L
      afterGap(0).n_events shouldBe 2
      afterGap(0).start shouldBe ts(0)
      afterGap(0).end shouldBe ts(10)
      afterGap(0).sum_value shouldBe 3.0

      // push the watermark far past B's end+gap (150) → B closes by
      // timeout; the extra batch lets the new watermark take effect
      input.addData(Event(2, ts(600), "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(601), "click", 1.0))
      q.processAllAvailable()
      val all = spark.table(qn("s2out")).as[Session].collect()
      val user1 = all.filter(_.user_id == 1L).sortBy(_.start.getTime)
      user1.length shouldBe 2
      user1(1).n_events shouldBe 1
      user1(1).start shouldBe ts(120)
      user1(1).sum_value shouldBe 3.0
    } finally q.stop()
  }

  test(s"[$store] s2 hot key: one user's huge shuffled batch folds into intervals, not a sorted Seq") {
    implicit val sqlCtx = spark.sqlContext
    // one bot user, 50k events in ONE micro-batch, deliberately
    // SHUFFLED arrival order: 10 bursts of 5k events at 1-second
    // spacing, bursts 2 h apart (gap = 30 min → 10 sessions, 9 closed
    // in-batch). The interval merge holds ~10 intervals on the task
    // heap; the old sorted-Seq pass materialized all 50k.
    val gapMs = 30 * 60000L
    val bursts = 10
    val perBurst = 5000
    val events = (for {
      b <- 0 until bursts
      i <- 0 until perBurst
    } yield Event(7L, new Timestamp(ts(0).getTime + b * 7200000L + i * 1000L),
      "click", 1.0))
    val shuffled = new scala.util.Random(42).shuffle(events)
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMs = gapMs,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName(qn("s2hot"))
      .outputMode("append").start()
    try {
      input.addData(shuffled: _*)
      q.processAllAvailable()
      val closed = spark.table(qn("s2hot")).as[Session].collect()
        .sortBy(_.start.getTime)
      closed.length shouldBe bursts - 1 // last stays open in state
      closed.zipWithIndex.foreach { case (s, b) =>
        s.user_id shouldBe 7L
        s.start shouldBe new Timestamp(ts(0).getTime + b * 7200000L)
        s.end shouldBe new Timestamp(ts(0).getTime + b * 7200000L +
          (perBurst - 1) * 1000L)
        s.n_events shouldBe perBurst
        s.sum_value shouldBe perBurst.toDouble
      }
    } finally q.stop()
  }
}

/** Default provider (HDFS-backed in-memory state store). */
class EventStreamSpec extends EventStreamSuiteBase {
  protected def store: String = "hdfs"

  test("s10 index maintenance is batch-split-invariant: three doc files, three batches, same search") {
    // s10 is stateless (foreachBatch append of doc-local postings) —
    // one-store test by design, like s7
    import spark.implicits._
    val docs = Seq(
      1L -> "the table holds a value and a part",
      2L -> "hash hash hash of the table",
      3L -> "nothing relevant here at all",
      4L -> "part value part value part",
      5L -> "value table hash part all four present",
      6L -> "a second irrelevant document entirely")
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s10-sh-").toString
    docs.grouped(2).zipWithIndex.foreach { case (g, i) =>
      g.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$shardRoot/docs_$i.parquet")
    }
    val schema = spark.read.parquet(s"$shardRoot/docs_0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/docs_*.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-s10-out-").toString
    val q = EventStream.indexMaintain(src, s"$out/idx", s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 3
    val streamed = spark.read.parquet(s"$out/idx")
    // no posting duplicated across batches (each doc indexed exactly once)
    streamed.groupBy(org.apache.spark.sql.functions.col("token"),
        org.apache.spark.sql.functions.col("doc_id")).count()
      .filter(org.apache.spark.sql.functions.col("count") > 1)
      .count() shouldBe 0L
    // search over the streamed index == the direct scan search
    val got = graft.operators.InvertedIndex.searchIndex(streamed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = graft.operators.InvertedIndex
      .searchScan(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got shouldBe want
    // compaction folds the accreted per-batch files back without
    // changing a single posting or the served search
    val before = graft.streaming.Compaction.partFiles(s"$out/idx")
    graft.operators.InvertedIndex.compactIndex(spark, s"$out/idx")
    graft.streaming.Compaction.partFiles(s"$out/idx") should be < before
    graft.operators.InvertedIndex
      .searchIndex(spark.read.parquet(s"$out/idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe want
  }

  test("s13 positional-index maintenance is batch-split-invariant: three doc files, three batches, same phrase serve") {
    // s13 is stateless (foreachBatch append of doc-local position
    // rows) — s10's argument verbatim, over the t11 layout
    import spark.implicits._
    val docs = Seq(
      1L -> "a stream table hash here",
      2L -> "stream table hash stream table hash",
      3L -> "table stream hash",
      4L -> "stream table of hash",
      5L -> "stream table hash",
      6L -> "a second irrelevant document entirely")
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s13-sh-").toString
    docs.grouped(2).zipWithIndex.foreach { case (g, i) =>
      g.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$shardRoot/docs_$i.parquet")
    }
    val schema = spark.read.parquet(s"$shardRoot/docs_0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/docs_*.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-s13-out-").toString
    val q = EventStream.posIndexMaintain(src, s"$out/idx", s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 3
    val streamed = spark.read.parquet(s"$out/idx")
    // no position row duplicated across batches (each doc exactly once;
    // a re-delivery would also fail the serve LOUDLY on dup map keys)
    streamed.groupBy(org.apache.spark.sql.functions.col("token"),
        org.apache.spark.sql.functions.col("doc_id")).count()
      .filter(org.apache.spark.sql.functions.col("count") > 1)
      .count() shouldBe 0L
    // phrase serve over the streamed layout == the batch-built layout
    val want = graft.operators.InvertedIndex.phraseSearch(
      graft.operators.InvertedIndex.posPostings(docs.toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    want.toMap shouldBe Map(1L -> 1L, 2L -> 2L, 5L -> 1L)
    val got = graft.operators.InvertedIndex.phraseSearch(streamed).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe want
    // compaction folds per-batch files back; serve unchanged
    val before = graft.streaming.Compaction.partFiles(s"$out/idx")
    graft.operators.InvertedIndex.compactPosIndex(spark, s"$out/idx")
    graft.streaming.Compaction.partFiles(s"$out/idx") should be < before
    graft.operators.InvertedIndex
      .phraseSearch(spark.read.parquet(s"$out/idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))) shouldBe want
  }

  test("s7 rollup maintenance is batch-split-invariant: two event files, two batches, same served report") {
    // s7 is stateless (foreachBatch append of partial rows), so the
    // provider axis is vacuous — one-store test by design.
    import spark.implicits._
    def ev(i: Int, day: Int): (Long, Timestamp, Long, String, Double) =
      (i.toLong, Timestamp.valueOf(f"2024-01-$day%02d 06:0${i % 6}:07"),
        (i % 11).toLong, Seq("view", "click", "purchase")(i % 3), i * 2.13)
    // both files cover overlapping days INSIDE the serve window, so the
    // same (day, type) grain lands as parts from different batches
    val rowsA = (0 until 60).map(i => ev(i, 9 + i % 4))
    val rowsB = (100 until 150).map(i => ev(i, 11 + i % 4))
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s7-sh-").toString
    rowsA.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$shardRoot/ev_a.parquet")
    rowsB.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$shardRoot/ev_b.parquet")
    val schema = spark.read.parquet(s"$shardRoot/ev_a.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/ev_*.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-s7-out-").toString
    val q = EventStream.rollupMaintain(src, s"$out/rollup", s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 2
    val served = graft.operators.Rollup.serveReport(
        spark.read.parquet(s"$out/rollup")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("days"),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents")))
    // one-shot batch rollup over the union: the report must be identical
    val batchDir = java.nio.file.Files.createTempDirectory("graft-s7-b-").toString
    graft.operators.Rollup.rollupPart(
        (rowsA ++ rowsB).toDF("event_id", "ts", "user_id", "event_type", "value"))
      .write.mode("overwrite").partitionBy("day").parquet(s"$batchDir/rollup")
    val want = graft.operators.Rollup.serveReport(
        spark.read.parquet(s"$batchDir/rollup")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("days"),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents")))
    served shouldBe want
  }

  test("s11 delete maintenance is batch-split-invariant: per-key request files, one batch each, same layout as one-shot delete") {
    // stateless foreachBatch (key-deletes are idempotent + commutative),
    // so the provider axis is vacuous — one-store test by design.
    import spark.implicits._
    val events = graft.Tables.events(spark, graft.SparkSpec.TinySf)
    val keys = graft.operators.Mutation.forgetSet(events)
    keys.length should be > 2
    // streamed: each key arrives in its OWN micro-batch
    val reqRoot = java.nio.file.Files.createTempDirectory("graft-s11-rq-").toString
    keys.zipWithIndex.foreach { case (k, i) =>
      Seq(k).toDF("user_id").coalesce(1).write.parquet(s"$reqRoot/rq_$i.parquet")
    }
    val layoutA = java.nio.file.Files.createTempDirectory("graft-s11-a-")
      .resolve("layout").toString
    graft.operators.Mutation.buildLayout(events, layoutA)
    val src = spark.readStream.schema("user_id BIGINT")
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$reqRoot/rq_*.parquet")
    val ck = java.nio.file.Files.createTempDirectory("graft-s11-ck-").toString
    val q = EventStream.deleteMaintain(src, layoutA, ck)
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe keys.length
    // one-shot: the whole forget set deleted in a single mutation
    val layoutB = java.nio.file.Files.createTempDirectory("graft-s11-b-")
      .resolve("layout").toString
    graft.operators.Mutation.buildLayout(events, layoutB)
    graft.operators.Mutation.deleteKeys(spark, layoutB, keys)
    val got = graft.operators.Mutation.servedReport(spark, layoutA).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = graft.operators.Mutation.servedReport(spark, layoutB).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got shouldBe want
    // and no forget key survives anywhere in the streamed layout
    spark.read.parquet(layoutA)
      .filter(org.apache.spark.sql.functions.col("user_id")
        .isin(keys.map(Long.box): _*))
      .count() shouldBe 0L
  }

  test("s12 ingest scoring is batch-split-invariant: two doc files, two batches, same selection as one-shot scoring") {
    // stateless foreachBatch (per-doc scores depend only on the doc and
    // the FROZEN model), so the provider axis is vacuous.
    import spark.implicits._
    def doc(i: Int): (Long, String, String, String, Long) = {
      val lang = Seq("en", "de", "fr")(i % 3)
      val text = Seq("the cat sat on the mat and the dog ran",
        "der hund lief im park und der vogel sang",
        "le chat dort sur le tapis et le chien court")(i % 3) + s" tok$i"
      (i.toLong, text, lang, "s", text.length.toLong)
    }
    val rowsA = (0 until 30).map(doc)
    val rowsB = (100 until 125).map(doc)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val srcDir = java.nio.file.Files.createTempDirectory("graft-s12-src-").toString
    (rowsA ++ rowsB).toDF(cols: _*)
      .coalesce(1).write.parquet(s"$srcDir/documents.parquet")
    // frozen model trained on the whole corpus dir (c22's lifecycle)
    val model = graft.operators.Dsir.ensureModel(spark, srcDir)
    // streamed: the same docs arrive as TWO shard files, one batch each
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s12-sh-").toString
    rowsA.toDF(cols: _*).coalesce(1).write.parquet(s"$shardRoot/sh_a.parquet")
    rowsB.toDF(cols: _*).coalesce(1).write.parquet(s"$shardRoot/sh_b.parquet")
    val schema = spark.read.parquet(s"$shardRoot/sh_a.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/sh_*.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-s12-out-").toString
    val q = EventStream.scoreMaintain(src, model, s"$out/scores", s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 2
    val got = graft.operators.Dsir.selectTop(
        spark.read.parquet(s"$out/scores")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Double]("logw")))
    // one-shot: every doc scored against the same frozen model at once
    val want = graft.operators.Dsir.selectTop(
        graft.operators.Dsir.scoreAgainst(
          (rowsA ++ rowsB).toDF(cols: _*),
          spark.read.parquet(model))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Double]("logw")))
    got shouldBe want
    got.length shouldBe (rowsA ++ rowsB).length.min(graft.operators.Dsir.SelectN)
  }

  test("auto-compaction folds accreted parts back to ~1-part serve cost, reports unchanged") {
    // the 50-part accretion stress showed a 2.0× serve wall; this pins
    // the fix: 8 micro-batches with compactEvery=4 must end at the
    // one-shot build's part-file count, with every served report
    // byte-identical to the uncompacted stream's
    import spark.implicits._
    def ev(i: Int, day: Int): (Long, Timestamp, Long, String, Double) =
      (i.toLong, Timestamp.valueOf(f"2024-01-$day%02d 06:0${i % 6}:07"),
        (i % 11).toLong, Seq("view", "click", "purchase")(i % 3), i * 2.13)
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-cmp-sh-").toString
    val files = (0 until 8).map { f =>
      val rows = (f * 50 until f * 50 + 50).map(i => ev(i, 9 + i % 4))
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(s"$shardRoot/ev_$f.parquet")
      rows
    }
    val allRows = files.flatten
    val schema = spark.read.parquet(s"$shardRoot/ev_0.parquet").schema
    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one micro-batch per file
      .parquet(s"$shardRoot/ev_*.parquet")

    // ---- s7 rollup: compacted stream vs uncompacted stream
    val outA = java.nio.file.Files.createTempDirectory("graft-cmp-a-").toString
    val qA = EventStream.rollupMaintain(src(), s"$outA/rollup", s"$outA/ckpt")
    try qA.awaitTermination() finally qA.stop()
    val outB = java.nio.file.Files.createTempDirectory("graft-cmp-b-").toString
    val qB = EventStream.rollupMaintain(src(), s"$outB/rollup", s"$outB/ckpt",
      compactEvery = 4)
    try qB.awaitTermination() finally qB.stop()
    val accreted = Compaction.partFiles(s"$outA/rollup")
    val compacted = Compaction.partFiles(s"$outB/rollup")
    // 8 appends/day uncompacted; the final tick (batch 8) folds to one
    // file per day dir — the one-shot build's level
    val oneShotDir = java.nio.file.Files.createTempDirectory("graft-cmp-1-").toString
    graft.operators.Rollup.rollupPart(
        allRows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .repartition(org.apache.spark.sql.functions.col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(s"$oneShotDir/rollup")
    compacted shouldBe Compaction.partFiles(s"$oneShotDir/rollup")
    accreted should be >= compacted * 4
    def report(dir: String) = graft.operators.Rollup.serveReport(
        spark.read.parquet(dir)).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("days"),
        r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
        r.getAs[Long]("users_est")))
    report(s"$outB/rollup") shouldBe report(s"$outA/rollup")

    // ---- s8 upsert: same drill, FINAL report unchanged
    val upA = java.nio.file.Files.createTempDirectory("graft-cmp-ua-").toString
    val quA = EventStream.upsertMaintain(src(), s"$upA/parts", s"$upA/ckpt")
    try quA.awaitTermination() finally quA.stop()
    val upB = java.nio.file.Files.createTempDirectory("graft-cmp-ub-").toString
    val quB = EventStream.upsertMaintain(src(), s"$upB/parts", s"$upB/ckpt",
      compactEvery = 4)
    try quB.awaitTermination() finally quB.stop()
    Compaction.partFiles(s"$upB/parts") should be <
      Compaction.partFiles(s"$upA/parts") / 4
    def finalRep(dir: String) = graft.operators.Replacing.finalReport(
      spark.read.parquet(dir)).collect().toSeq
    finalRep(s"$upB/parts") shouldBe finalRep(s"$upA/parts")

    // ---- s9 ttl: day dirs coalesce, daily report unchanged
    val cutoff = graft.operators.Ttl.cutoffFor(
      allRows.toDF("event_id", "ts", "user_id", "event_type", "value"))
    val ttA = java.nio.file.Files.createTempDirectory("graft-cmp-ta-").toString
    val qtA = EventStream.ttlMaintain(src(), s"$ttA/layout", cutoff, s"$ttA/ckpt")
    try qtA.awaitTermination() finally qtA.stop()
    val ttB = java.nio.file.Files.createTempDirectory("graft-cmp-tb-").toString
    val qtB = EventStream.ttlMaintain(src(), s"$ttB/layout", cutoff, s"$ttB/ckpt",
      compactEvery = 4)
    try qtB.awaitTermination() finally qtB.stop()
    Compaction.partFiles(s"$ttB/layout") should be <
      Compaction.partFiles(s"$ttA/layout") / 4
    def daily(dir: String) = graft.operators.Ttl.servedDaily(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    daily(s"$ttB/layout") shouldBe daily(s"$ttA/layout")
  }

  test("s9 TTL maintenance is batch-split-invariant and drops expired days across batches") {
    // s9 is stateless (foreachBatch append + metadata expiry), so the
    // provider axis is vacuous — one-store test by design.
    import spark.implicits._
    def ev(i: Int, month: Int): (Long, Timestamp, Long, String, Double) =
      (i.toLong, Timestamp.valueOf(f"2024-$month%02d-${1 + i % 27}%02d 06:0${i % 6}:07"),
        (i % 11).toLong, Seq("view", "click", "purchase")(i % 3), i * 2.13)
    // file A is an OLD month (every day expires); file B the recent one
    val rowsA = (0 until 60).map(i => ev(i, 1))
    val rowsB = (100 until 150).map(i => ev(i, 2))
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s9-sh-").toString
    rowsA.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$shardRoot/ev_a.parquet")
    rowsB.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$shardRoot/ev_b.parquet")
    val schema = spark.read.parquet(s"$shardRoot/ev_a.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/ev_*.parquet")
    val union = (rowsA ++ rowsB)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val cutoff = graft.operators.Ttl.cutoffFor(union)
    val out = java.nio.file.Files.createTempDirectory("graft-s9-out-").toString
    val q = EventStream.ttlMaintain(src, s"$out/layout", cutoff, s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 2
    // every month-1 day dir expired; only in-window month-2 days remain
    val days = new java.io.File(s"$out/layout").listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).toSeq
    days should not be empty
    all(days.map(n => java.time.LocalDate.parse(n.stripPrefix("day=")))) should
      be >= cutoff
    val served = graft.operators.Ttl.servedDaily(spark, s"$out/layout")
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3)))
    // one-shot batch build + expiry over the union: identical report
    val batchDir = java.nio.file.Files.createTempDirectory("graft-s9-b-").toString
    graft.operators.Ttl.buildDailyLayout(union, s"$batchDir/layout")
    graft.operators.Ttl.applyTtl(s"$batchDir/layout", cutoff)
    val want = graft.operators.Ttl.servedDaily(spark, s"$batchDir/layout")
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3)))
    served shouldBe want
  }

  test("s8 upsert maintenance is batch-split-invariant: cross-batch key updates FINAL to the newest version") {
    // s8 is stateless (foreachBatch part append), so the provider axis
    // is vacuous — one-store test by design.
    import spark.implicits._
    def ev(i: Int, month: Int): (Long, Timestamp, Long, String, Double) =
      (i.toLong, Timestamp.valueOf(f"2024-$month%02d-${1 + i % 27}%02d 06:0${i % 6}:07"),
        (i % 11).toLong, Seq("view", "click", "purchase")(i % 3), i * 2.13)
    // file B's later-month events UPDATE users file A already wrote
    // (ids overlap mod 11) — FINAL must pick B's versions across parts
    val rowsA = (0 until 60).map(i => ev(i, 1))
    val rowsB = (100 until 150).map(i => ev(i, 2))
    val shardRoot = java.nio.file.Files.createTempDirectory("graft-s8-sh-").toString
    rowsA.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$shardRoot/ev_a.parquet")
    rowsB.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$shardRoot/ev_b.parquet")
    val schema = spark.read.parquet(s"$shardRoot/ev_a.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force one micro-batch per file
      .parquet(s"$shardRoot/ev_*.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-s8-out-").toString
    val q = EventStream.upsertMaintain(src, s"$out/parts", s"$out/ckpt")
    try q.awaitTermination() finally q.stop()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 2
    val served = graft.operators.Replacing.finalReport(
        spark.read.parquet(s"$out/parts")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("users"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("last_ms")))
    // one-shot compaction over the union: the report must be identical
    val batchDir = java.nio.file.Files.createTempDirectory("graft-s8-b-").toString
    graft.operators.Replacing.compactPart(
        (rowsA ++ rowsB).toDF("event_id", "ts", "user_id", "event_type", "value"))
      .write.mode("overwrite").partitionBy("b").parquet(s"$batchDir/parts")
    val want = graft.operators.Replacing.finalReport(
        spark.read.parquet(s"$batchDir/parts")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("users"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("last_ms")))
    served shouldBe want
    // and every user with a month-2 update serves a month-2 version
    val fin = graft.operators.Replacing.finalState(
      spark.read.parquet(s"$out/parts"))
    fin.filter(org.apache.spark.sql.functions.col("event_id") < 100L).collect()
      .map(_.getAs[Long]("user_id")).toSet
      .intersect(rowsB.map(_._3).toSet) shouldBe Set.empty
  }
}

/** The same behaviors on the RocksDB state store — the provider the
  * 100 TB deployment runs (state off-heap, changelog checkpoints). */
class EventStreamRocksDBSpec extends EventStreamSuiteBase with BeforeAndAfterAll {
  protected def store: String = "rocksdb"

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.GraftSession.useRocksDBStateStore(spark)
  }
  override def afterAll(): Unit = {
    try spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    finally super.afterAll()
  }

  test("rocksdb provider actually drives the state store (progress metrics)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("rocksdb_probe")
      .outputMode("complete").start()
    try {
      input.addData(Event(1, new Timestamp(BaseMs), "click", 1.0))
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators.headOption
        .map(_.customMetrics.keySet())
        .map(ks => { val it = ks.iterator(); Iterator.continually(it)
          .takeWhile(_.hasNext).map(_.next()).toSet })
        .getOrElse(Set.empty[String])
      metrics.exists(_.toLowerCase.contains("rocksdb")) shouldBe true
    } finally q.stop()
  }
  private val BaseMs = 24L * 60 * 365 * 60000L
}
