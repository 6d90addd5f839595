package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement discipline (round-1 verdict fixes):
  *  - `noop` write sink, not `.count()` — count() lets Catalyst drop
  *    top-level sorts/projections, so e.g. a full-sort query never
  *    sorted; noop materialises every output row through the full plan.
  *  - one untimed warmup pass over all queries first (JVM/JIT + codegen
  *    cache + parquet footer cache), so the first timed query doesn't
  *    eat cold-start.
  *  - deterministic sorted query order, so round-over-round per-query
  *    numbers are comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    val names = SparkEntry.queries.keys.toSeq.sorted
    def runOne(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    names.foreach(runOne) // warmup, untimed
    val results = names.map(n => n -> runOne(n))
    val qs = results.collect { case (k, Right(v)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failing query must be LOUD in the output — a silently shrinking
    // total would read as an improvement.
    val errs = results.collect { case (k, Left(e)) =>
      "\"" + k + "\":\"" + e.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"" }
    val errJson = errs.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":${errs.length},"errors":$errJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
