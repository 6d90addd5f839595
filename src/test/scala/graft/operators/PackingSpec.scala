package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** c17 sequence packing: brute-force agreement with a driver-side
  * concat-and-chunk simulator, budget-boundary behavior, and the
  * shard-partitioned (never global) window shape. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side simulator: walk each shard's docs in doc_id order,
    * assign each doc to the sequence its first token lands in. */
  private def simulate(rows: Seq[(Long, Long)]): Map[(Int, Long), (Long, Long, Long)] =
    rows.groupBy { case (id, _) => (id % Packing.NumShards).toInt }
      .flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, nt) =>
          val seq = cum / Packing.Budget
          cum += nt
          (shard, seq, id, nt)
        }
      }
      .groupBy { case (sh, seq, _, _) => (sh, seq) }
      .map { case (k, vs) =>
        k -> (vs.size.toLong, vs.map(_._3).min, vs.map(_._4).sum)
      }

  test("pack matches the driver-side simulator on random doc lengths") {
    val rnd = new scala.util.Random(7)
    // word counts 0..~200, including empty docs and budget-sized ones
    val rows = (0L until 400L).map(i =>
      i -> (if (i % 97 == 0) 0L
            else if (i % 61 == 0) Packing.Budget
            else rnd.nextInt(200).toLong))
    val docs = rows.toDF("doc_id", "nt")
      .select(col("doc_id"),
        // nt words of one char each (sequence(1, 0) would count DOWN
        // and fake 2 tokens — empty docs need the explicit branch)
        when(col("nt") > 0,
          concat_ws(" ", transform(sequence(lit(1), col("nt")), _ => lit("w"))))
          .otherwise(lit("")).as("text"))
    val got = Packing.pack(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got shouldBe simulate(rows)
  }

  test("a doc starting exactly on the budget boundary opens the next sequence") {
    // shard 0 only: ids multiples of NumShards keep one shard
    val n = Packing.NumShards.toLong
    val docs = Seq(
      (0L * n, Packing.Budget),  // fills seq 0 exactly
      (1L * n, 1L),              // must start seq 1
    ).toDF("doc_id", "nt")
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), col("nt")), _ => lit("w")))
          .as("text"))
    val got = Packing.pack(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    got shouldBe Array((0, 0L, 1L), (0, 1L, 1L))
  }

  test("the running-sum window is shard-partitioned, never global") {
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val plan = Packing.pack(docs).queryExecution.executedPlan.toString
    plan should include("Window")
    // every Window operator carries the shard partition spec
    plan.split("\n").filter(_.contains("windowspecdefinition")).foreach { l =>
      l should include("shard")
    }
  }
}
