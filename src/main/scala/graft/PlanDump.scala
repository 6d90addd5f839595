package graft

/** Optimization-round measurement tool: dump `explain("formatted")` for
  * the named queries (comma-separated prefixes in
  * SPARK_GRAFT_BENCH_ONLY, or all) into one file per query under the
  * directory given as arg 0, suffixed by arg 1 (e.g. `_before` /
  * `_after`). One JVM, the real [[GraftSession]] confs — so the dumped
  * plans are the plans the bench runs, not a bare-session
  * approximation. Streaming gates run their bounded stream as part of
  * building the frame; the dumped plan is the SERVE side, which is
  * what `explain` can show for them. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"), txt)
        println(s"[plandump] wrote $n$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] FAIL $n: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
