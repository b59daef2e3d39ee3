package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Optimization-round measurement harness (guide §1): for each query in
  * the (SPARK_GRAFT_ONLY-narrowed) registry, dump `.explain("formatted")`
  * to `<outDir>/<name>.txt` and run the query with a stage-metrics
  * listener, printing per-stage wall/shuffle breakdowns so the expensive
  * stage of an expensive query is identifiable without the (disabled)
  * Spark UI. Diagnostic tooling only — never run by the driver.
  */
object PlanProfile {
  private case class StageRec(id: Int, name: String, ms: Long,
      tasks: Int, shufRead: Long, shufWrite: Long, input: Long,
      spill: Long, gcMs: Long, cpuMs: Long, runMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/plan_profile"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))

    // every SQL action's executed plan, delivered async on the shared
    // bus — flushed (ListenerBusShim) before attribution, so internal
    // eager materializations (localCheckpoint ladders) are captured
    // alongside the top-level plan rather than hiding behind a
    // checkpoint-scan tail
    val execPlans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        execPlans.add(s"== action: $funcName (${durationNs / 1000000} ms) ==\n" +
          qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageRec]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        stages.put(si.stageId, StageRec(si.stageId, si.name.take(80), ms,
          si.numTasks, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          m.memoryBytesSpilled, m.jvmGCTime, m.executorCpuTime / 1000000,
          m.executorRunTime))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = SparkEntry.onlySubset()
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val names = queries.keys.toSeq.sorted
    // warm-up (codegen/JIT) on the smallest sibling dir, like Bench
    val warmDir = {
      val parent = new java.io.File(sfDir).getParentFile
      val w = new java.io.File(parent, "sf0.001")
      if (w.exists()) w.getPath else sfDir
    }
    names.foreach { n =>
      try queries(n)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[profile] warm $n: $e") }
    }
    names.foreach { n =>
      try {
        val df = queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"$n.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        // timed run with fresh stage capture; a second run after the
        // first-pass caches settle mirrors the bench's min-of-3
        stages.clear()
        org.apache.spark.sql.graft.ListenerBusShim.waitUntilEmpty(spark)
        execPlans.clear()
        spark.sparkContext.setJobDescription(n)
        var t0 = System.nanoTime()
        queries(n)(spark, sfDir).count()
        val dt1 = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.ListenerBusShim.waitUntilEmpty(spark)
        if (!execPlans.isEmpty) {
          import scala.jdk.CollectionConverters._
          Files.write(Paths.get(outDir, s"$n.txt"),
            (plan + "\n\n== internal executions (run 1) ==\n\n" +
              execPlans.asScala.mkString("\n\n"))
              .getBytes(StandardCharsets.UTF_8))
        }
        stages.clear()
        t0 = System.nanoTime()
        queries(n)(spark, sfDir).count()
        val dt2 = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        println(f"[profile] $n%-32s run1=$dt1%7.3f s run2=$dt2%7.3f s")
        import scala.jdk.CollectionConverters._
        val recs = stages.values().asScala.toSeq.sortBy(-_.ms)
        recs.take(12).foreach { r =>
          println(f"    stage ${r.id}%4d ${r.ms}%6d ms tasks=${r.tasks}%3d " +
            f"in=${r.input / 1024}%8d KB sr=${r.shufRead / 1024}%8d KB " +
            f"sw=${r.shufWrite / 1024}%8d KB spill=${r.spill / 1024}%6d KB " +
            f"gc=${r.gcMs}%6d ms cpu=${r.cpuMs}%7d ms run=${r.runMs}%7d ms  ${r.name}")
        }
      } catch {
        case e: Throwable => System.err.println(s"[profile] FAILED $n: $e")
      }
    }
    spark.stop()
  }
}
