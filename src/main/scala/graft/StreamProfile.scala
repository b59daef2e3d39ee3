package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-family measurement harness (guide §1, r13 verdict Next #2):
  * run the (SPARK_GRAFT_ONLY-narrowed) registry queries with a
  * [[StreamingQueryListener]] that dumps every micro-batch's
  * `durationMs` phase breakdown (triggerExecution / queryPlanning /
  * getBatch / walCommit / addBatch / commitOffsets) and state-operator
  * totals, so the fixed micro-batch machinery cost is attributable
  * phase by phase. Diagnostic tooling only — never run by the driver.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(f"[stream] START ${e.name}%-28s ${e.id}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        def g(k: String): Long = Option(dm.get(k)).map(_.toLong).getOrElse(-1L)
        println(f"[stream] batch ${p.name}%-28s id=${p.batchId}%2d rows=${p.numInputRows}%7d " +
          f"trigger=${g("triggerExecution")}%5d plan=${g("queryPlanning")}%5d " +
          f"getBatch=${g("getBatch")}%5d latestOffset=${g("latestOffset")}%5d " +
          f"wal=${g("walCommit")}%5d add=${g("addBatch")}%5d commit=${g("commitOffsets")}%5d")
        p.stateOperators.foreach { so =>
          println(f"[stream]   state ${so.operatorName}%-24s rowsTotal=${so.numRowsTotal}%7d " +
            f"updated=${so.numRowsUpdated}%7d commitMs=${so.allUpdatesTimeMs + so.commitTimeMs}%5d " +
            f"memUsed=${so.memoryUsedBytes}%9d")
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val only = SparkEntry.onlySubset()
    val queries = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries.filter(_._1.startsWith("stream_"))
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
      catch { case e: Throwable => System.err.println(s"[stream] warm $n: $e") }
    }
    println(s"[stream] warm-up done (${names.size})")
    for (pass <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      try queries(n)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[stream] FAILED $n: $e") }
      println(f"[stream] pass $pass $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
