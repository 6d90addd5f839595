package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cut for a bounded intermediate that several consumers
  * re-read: a RELIABLE checkpoint when the session has a checkpoint
  * dir configured (the 100 TB setting — `localCheckpoint` blocks live
  * on ONE executor with replication 1, so an executor loss kills the
  * query instead of replaying from the checkpoint file), else
  * `localCheckpoint` (the local default, no dir needed). Same switch
  * Dedup's iterative cut has used since r20; this is the shared form
  * for the one-shot materializations (Mixture/Grams/Dsir/TextAnalysis/
  * SemCells), which keep their eager semantics. */
object Lineage {
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = eager)
    else df.localCheckpoint(eager = eager)
}
