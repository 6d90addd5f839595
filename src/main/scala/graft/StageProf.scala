package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Stage-level profiler (optimization-round measurement tool): runs the
  * named queries through the noop sink with a listener installed and
  * prints, per query, every completed stage's wall time, task count and
  * name — the attribution the Spark UI would give, usable with the UI
  * disabled. One timed pass after one warmup pass (stage times are for
  * the timed pass only).
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))

    case class St(stageId: Int, name: String, tasks: Int, wallMs: Long,
      runMs: Long, cpuMs: Long, shuffleReadMB: Double, shuffleWriteMB: Double)
    val stages = mutable.ArrayBuffer[St]()
    val jobStarts = mutable.ArrayBuffer[(Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobStarts += ((j.jobId, j.time)) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          val m = si.taskMetrics
          stages += St(si.stageId,
            si.name.takeWhile(_ != '\n').take(60) +
              f" [deser=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms " +
              f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime}ms " +
              f"resSer=${m.resultSerializationTime}ms]",
            si.numTasks, wall, m.executorRunTime,
            m.executorCpuTime / 1000000,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
    }
    names.foreach { n => // warmup
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[warmup-fail] $n: $e") }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { n =>
      synchronized { stages.clear(); jobStarts.clear() }
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[fail] $n: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(300)
      val (ss, nJobs) = synchronized { (stages.toVector, jobStarts.size) }
      val sumWall = ss.map(_.wallMs).sum / 1e3
      println(f"== $n%-26s wall=$wall%6.2fs jobs=$nJobs%3d stages=${ss.size}%3d stageWallSum=$sumWall%6.2fs")
      ss.sortBy(-_.wallMs).take(12).foreach { s =>
        println(f"   ${s.wallMs}%6dms tasks=${s.tasks}%3d run=${s.runMs}%6dms cpu=${s.cpuMs}%6dms shR=${s.shuffleReadMB}%7.2fMB shW=${s.shuffleWriteMB}%7.2fMB  ${s.name}")
      }
    }
    spark.stop()
  }
}
