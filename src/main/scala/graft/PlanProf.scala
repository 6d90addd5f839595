package graft

/** Plan-vs-execute profiler (optimization-round measurement tool).
  *
  * For each named query (or all), splits wall time into:
  *   - build: constructing the DataFrame (includes any ensure/index
  *     pre-work a gate performs eagerly, plus analysis triggered by
  *     eager actions inside the builder)
  *   - plan: forcing `queryExecution.executedPlan` (Catalyst analysis
  *     + optimization + physical planning — driver, single-threaded)
  *   - exec: executing the already-planned frame via `toRdd` (no
  *     re-planning; close to but not identical to Bench's noop sink,
  *     which copies rows through an extra projection)
  *
  * Median of SPARK_GRAFT_BENCH_RUNS (default 3) after one warmup, same
  * discipline as Bench. Prints one line per query; no JSON contract —
  * this is a builder-side tool, not a driver artifact.
  */
object PlanProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    def sample(name: String): (Double, Double, Double) = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze + optimize + plan
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ()) // execute, no re-plan
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    names.foreach(sample) // warmup
    val med = (xs: Seq[Double]) => xs.sorted.apply(xs.size / 2)
    val rows = names.map { n =>
      val ss = (1 to runs).map(_ => sample(n))
      (n, med(ss.map(_._1)), med(ss.map(_._2)), med(ss.map(_._3)))
    }
    println(f"${"query"}%-28s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    rows.sortBy(r => -(r._2 + r._3 + r._4)).foreach { case (n, b, p, e) =>
      println(f"$n%-28s $b%8.3f $p%8.3f $e%8.3f ${b + p + e}%8.3f")
    }
    val (tb, tp, te) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    println(f"${"TOTAL"}%-28s $tb%8.3f $tp%8.3f $te%8.3f ${tb + tp + te}%8.3f")
    spark.stop()
  }
}
