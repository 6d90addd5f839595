package graft

import org.apache.spark.sql.DataFrame

/** Conditional round-robin corpus spread for CPU-heavy per-row stages.
  *
  * Spark sizes scan partitions by BYTES, so a small/single-split input
  * (this sandbox's one-file parquet corpus) runs every downstream
  * per-row computation — shingling, hashing, embedding stubs — on ONE
  * core. The remedy is a round-robin `repartition(defaultParallelism)`
  * ahead of the heavy map stage.
  *
  * But that spread must be CONDITIONAL: a 100 TB corpus arrives in
  * tens of thousands of splits, already ≥ cluster parallelism, and an
  * unconditional repartition there is a pointless full-corpus shuffle
  * of the text. `ifNarrow` inspects the plan's actual partition count
  * (driver-side plan compilation only — no job runs) and is an
  * identity whenever the input is already wide enough.
  */
object Spread {
  def ifNarrow(df: DataFrame): DataFrame = {
    val np = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd compiles a SECOND physical plan for this subtree,
    // driver-side only (no job runs). Cheap at current plan sizes; if
    // plan-time ever shows in profiles, read the scan's partition
    // count from the FileSourceScanExec relation instead.
    if (df.rdd.getNumPartitions >= np) df else df.repartition(np)
  }
}
