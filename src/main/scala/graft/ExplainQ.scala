package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper.
  *
  *  - `runMain graft.ExplainQ <name> [run]` — formatted physical plan
  *    for one query, optionally timed twice (cold/warm).
  *  - `runMain graft.ExplainQ --audit` — sweep EVERY registered query
  *    and flag scan-stage data filters that contain expensive
  *    expressions (hashing, regex, higher-order lambdas). Predicate
  *    pushdown substituting a derived column's whole defining
  *    expression into the scan filter was the dominant profiled
  *    pathology this engine tunes against (see GraftSession /
  *    Dedup.spreadBuildMaterialize); this sweep catches regressions.
  */
object ExplainQ {
  private val HeavyFilter =
    Seq("md5(", "transform(", "aggregate(", "array_min(", "zip_with(",
      "concat_ws(", "minhash", "simhash", "shingle")

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if (name == "--audit") {
      // AQE's wrapper node hides the plan tree from collect(); the audit
      // inspects the static plan, which has the same filter placement
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      var flagged = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (q, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        // scan-stage filters = FilterExec nodes with no exchange below
        // them (i.e. they run fused with the scan, before any spread)
        val scanStageFilters = plan.collectWithSubqueries {
          case f: org.apache.spark.sql.execution.FilterExec
              if f.child.collectFirst {
                case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
              }.isEmpty => f
        }
        scanStageFilters.foreach { f =>
          val cond = f.condition.toString
          if (HeavyFilter.exists(cond.contains)) {
            flagged += 1
            println(s"[audit] $q: HEAVY scan-stage filter: ${cond.take(300)}")
          }
        }
      }
      println(s"[audit] done, $flagged heavy scan filter(s) flagged " +
        s"(hash-based sampling predicates are expected to appear)")
    } else {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (args.length > 1 && args(1) == "run") {
        // fresh frame per run: SQL metrics accumulate per plan instance
        (1 to 2).foreach { i =>
          val stats = QueryStats.run(SparkEntry.queries(name)(spark, sfDir))
          val label = if (i == 1) "cold" else "warm"
          println(s"[explainq] $name $label: ${stats.pretty}")
        }
      }
    }
    spark.stop()
  }
}
