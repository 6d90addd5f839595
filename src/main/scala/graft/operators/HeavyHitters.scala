package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guaranteed heavy hitters at FIXED capacity — the general two-pass
  * operator behind the q32/q49 gates, exposed as the library API (a
  * pipeline wants "top pages by traffic" over its own frame, not the
  * gate's corpus shape).
  *
  * Semantics: per group, EXACTLY the keys whose total weight strictly
  * exceeds `total/thresholdFactor`, with exact weights and a dense
  * (weight desc, key asc) rank. Deterministic on any input and any
  * merge order — unlike raw sketch output — because:
  *
  *  - pass 1's Misra-Gries candidate summary
  *    ([[graft.functions.MgCandidatesAgg]]) is COMPLETE above
  *    W/(capacity+1) under arbitrary merge trees (PODS 2012), and
  *    `thresholdFactor ≤ capacity` (enforced) puts the output
  *    threshold inside that guarantee;
  *  - pass 2 recounts ONLY the candidates exactly and applies the
  *    threshold, so merge-order-dependent tail candidates are
  *    filtered away by true weights.
  *
  * Scale shape: pass 1 ships one ≤2·capacity-entry summary per
  * partition per group; pass 2 joins the candidate table
  * (≤2·capacity rows per group, with the group total riding the
  * exploded rows so the plan materializes ONCE) back to the corpus
  * and shuffles only candidate hits. Output is bounded by
  * construction: fewer than `thresholdFactor` keys per group can
  * exceed total/thresholdFactor, so the final rank window is over
  * < thresholdFactor rows per group. Two corpus scans, never a
  * distinct-key-sized exchange.
  *
  * BOUNDED-GROUPS BROADCAST CONTRACT: the default `candidateJoin =
  * "broadcast"` ships groups × ≤2·capacity candidate rows to every
  * executor — the right plan for the operator's home case (a handful
  * to a few hundred groups: event types, shards, tenants), and it
  * keeps the corpus side shuffle-free. With MILLIONS of groups that
  * table is itself corpus-class and must NOT be broadcast: pass
  * `candidateJoin = "shuffle"` (co-partitioned SHUFFLE_HASH on
  * groups+key — pays one corpus shuffle, never a driver-sized
  * collect) or `"auto"` (no hint; AQE measures the built candidate
  * table at runtime and picks broadcast vs shuffle itself). The
  * group count is data-dependent, so the switch is a caller knob
  * rather than an eager pre-count — a pre-count would execute pass 1
  * twice and double the operator's cost in the bounded-groups case.
  */
object HeavyHitters {

  /** Candidate-join strategies for pass 2. */
  val CandidateJoins: Set[String] = Set("broadcast", "shuffle", "auto")

  /** @param df       input frame
    * @param key      BIGINT key expression (hash wider types first)
    * @param weight   per-row weight (1 for plain frequency); negative
    *                 weights are rejected by the summary — they void
    *                 the completeness bound
    * @param groups   grouping column names (empty = one global group)
    * @param capacity MG summary capacity — per-partition state bound
    * @param thresholdFactor output keys exceed total/thresholdFactor;
    *                 must be ≤ capacity for the completeness guarantee
    * @param keyName / weightName output column names
    * @param candidateJoin pass-2 join strategy — "broadcast" (default;
    *                 requires the bounded-groups contract above),
    *                 "shuffle" (co-partitioned SHUFFLE_HASH for
    *                 unbounded group counts), or "auto" (unhinted; AQE
    *                 decides from the candidate table's runtime size)
    */
  def guaranteed(df: DataFrame, key: Column, weight: Column,
      groups: Seq[String] = Nil,
      capacity: Int = 1024, thresholdFactor: Int = 256,
      keyName: String = "key", weightName: String = "weight",
      candidateJoin: String = "broadcast"): DataFrame = {
    require(thresholdFactor >= 1 && thresholdFactor <= capacity,
      s"thresholdFactor ($thresholdFactor) must be in [1, capacity=" +
        s"$capacity]: completeness is only guaranteed above " +
        "W/(capacity+1), so a finer output threshold could emit an " +
        "incomplete set")
    require(CandidateJoins.contains(candidateJoin),
      s"candidateJoin ($candidateJoin) must be one of $CandidateJoins")
    graft.functions.heavyhitters.register(df.sparkSession)
    val gc = groups.map(col)
    val prep = df.select(gc :+ key.as(keyName) :+
      weight.cast("long").as("__w"): _*)
    val cand = prep.groupBy(gc: _*)
      .agg(graft.functions.heavyhitters.mgCandidates(
        col(keyName), col("__w"), capacity).as("__cand"),
        sum(col("__w")).as("total"))
    val candRows = cand.select(gc :+ col("total") :+
      explode(col("__cand")).as(keyName): _*)
    val candSide = candidateJoin match {
      case "broadcast" => broadcast(candRows)
      case "shuffle"   => candRows.hint("SHUFFLE_HASH")
      case _           => candRows
    }
    val hits = prep
      .join(candSide, groups :+ keyName)
      .groupBy((gc :+ col(keyName)): _*)
      .agg(sum(col("__w")).as(weightName), max(col("total")).as("total"))
    // AUDIT(unpartitioned window): with groups = Nil this rank window
    // has no partition spec and Spark logs "No Partition Defined for
    // Window" — sound at any corpus scale because its input is the
    // already-filtered hit set, ≤ `capacity` rows per group (the MG
    // sketch emits at most `capacity` candidates and `hits` is a
    // subset), so the one-task rank touches ≤ capacity·|groups| rows
    // fixed by the sketch, never by the corpus.
    hits
      .filter(col(weightName) * lit(thresholdFactor.toLong) > col("total"))
      .withColumn("rk", row_number().over(Window.partitionBy(gc: _*)
        .orderBy(col(weightName).desc, col(keyName))))
      .select(gc ++ Seq(col(keyName), col(weightName),
        col("total"), col("rk")): _*)
      .orderBy(gc :+ col("rk"): _*)
  }
}
