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
  * partition per group; pass 2 broadcasts the candidate table
  * (≤2·capacity rows per group, with the group total riding the
  * exploded rows so the plan materializes ONCE) and shuffles only
  * candidate hits. Output is bounded by construction: fewer than
  * `thresholdFactor` keys per group can exceed total/thresholdFactor,
  * so the final rank window is over < thresholdFactor rows per group.
  * Two corpus scans, never a distinct-key-sized exchange.
  */
object HeavyHitters {

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
    */
  def guaranteed(df: DataFrame, key: Column, weight: Column,
      groups: Seq[String] = Nil,
      capacity: Int = 1024, thresholdFactor: Int = 256,
      keyName: String = "key", weightName: String = "weight"): DataFrame = {
    require(thresholdFactor >= 1 && thresholdFactor <= capacity,
      s"thresholdFactor ($thresholdFactor) must be in [1, capacity=" +
        s"$capacity]: completeness is only guaranteed above " +
        "W/(capacity+1), so a finer output threshold could emit an " +
        "incomplete set")
    graft.functions.heavyhitters.register(df.sparkSession)
    val gc = groups.map(col)
    val prep = df.select(gc :+ key.as(keyName) :+
      weight.cast("long").as("__w"): _*)
    val cand = prep.groupBy(gc: _*)
      .agg(graft.functions.heavyhitters.mgCandidates(
        col(keyName), col("__w"), capacity).as("__cand"),
        sum(col("__w")).as("total"))
    val hits = prep
      .join(broadcast(cand.select(gc :+ col("total") :+
        explode(col("__cand")).as(keyName): _*)),
        groups :+ keyName)
      .groupBy((gc :+ col(keyName)): _*)
      .agg(sum(col("__w")).as(weightName), max(col("total")).as("total"))
    hits
      .filter(col(weightName) * lit(thresholdFactor.toLong) > col("total"))
      .withColumn("rk", row_number().over(Window.partitionBy(gc: _*)
        .orderBy(col(weightName).desc, col(keyName))))
      .select(gc ++ Seq(col(keyName), col(weightName),
        col("total"), col("rk")): _*)
      .orderBy(gc :+ col("rk"): _*)
  }
}
