package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Optimization-round measurement tool: EXECUTE each named query through
  * the noop sink, then dump its post-execution plan — with AQE on, the
  * `AdaptiveSparkPlan isFinalPlan=true` tree, i.e. the plan that
  * actually ran, including runtime `ReusedExchange`/`AQEShuffleRead`
  * nodes that a pre-execution `explain` cannot show — plus the job
  * count of the run. This is the runtime artifact the r21 verdict asked
  * for: a static dump shows a shared build subtree TWICE; only the
  * final plan proves the second occurrence executed as a
  * ReusedExchange. Same session/confs as Bench; files land as
  * `<query><suffix>.txt` under arg 0 (suffix = arg 1, e.g. `_aqe`). */
object AqeDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "_aqe"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val jobs = mutable.ArrayBuffer[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += j.jobId }
    })
    names.foreach { n =>
      try {
        // one warmup so index/ensure pre-work doesn't inflate the
        // counted run's jobs
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        synchronized { jobs.clear() }
        val df = SparkEntry.queries(n)(spark, sfDir)
        // execute THIS queryExecution (a noop .write would plan a fresh
        // one and the dump below would read an unexecuted AQE tree)
        df.queryExecution.toRdd.foreach(_ => ())
        Thread.sleep(300) // listener bus drain
        val nJobs = synchronized { jobs.size }
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
          s"== jobs in timed run: $nJobs ==\n\n" + txt)
        println(s"[aqedump] wrote $n$suffix.txt (jobs=$nJobs)")
      } catch { case e: Throwable =>
        println(s"[aqedump] FAIL $n: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
