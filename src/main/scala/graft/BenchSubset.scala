package graft

/** Scratch diagnostic for optimization round 22 — times a NAMED SUBSET of
  * `SparkEntry.queries` with the same methodology as [[Bench]] (JVM warmup,
  * layout pre-build, median of reps over `fn(spark, sfDir).collect()`), so a
  * suspected pathology can be reproduced and bisected without paying the
  * full 244-query run. Not part of the driver contract.
  *
  * Usage: `runMain graft.BenchSubset <name> [<name> ...]`
  * Env: `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`, `SPARK_GRAFT_BENCH_REPS`.
  */
object BenchSubset {

  /** Accumulates task metrics across all stages between [[reset]] calls so a
    * query's wall time decomposes into executor task time / GC / shuffle /
    * spill — the stage-metrics view the guide (§1) says to read before
    * changing anything.
    */
  private class MetricsListener extends org.apache.spark.scheduler.SparkListener {
    @volatile var taskMs, gcMs, shuffleReadB, shuffleWriteB, spillB, tasks, stages, jobs = 0L
    @volatile var cpuMs, deserMs, resultSerMs = 0L
    def reset(): Unit = {
      taskMs = 0; gcMs = 0; shuffleReadB = 0; shuffleWriteB = 0; spillB = 0
      tasks = 0; stages = 0; jobs = 0; cpuMs = 0; deserMs = 0; resultSerMs = 0
    }
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) synchronized {
        taskMs += m.executorRunTime; gcMs += m.jvmGCTime
        cpuMs += m.executorCpuTime / 1000000L
        deserMs += m.executorDeserializeTime; resultSerMs += m.resultSerializationTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        spillB += m.memoryBytesSpilled + m.diskBytesSpilled
        tasks += 1
      }
    }
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      synchronized { jobs += 1 }
  }

  /** `SparkContext.listenerBus` is `private[spark]`; drain it reflectively so
    * the metrics pass reads a settled counter set (diagnostic-only code).
    */
  private def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit = {
    val sc = spark.sparkContext
    val m  = sc.getClass.getMethod("listenerBus")
    val bus = m.invoke(sc)
    bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    ()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchSubset <queryName> [<queryName> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("events", "documents", "embeddings", "lineitem", "orders").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val lt0 = System.nanoTime()
    Layouts.buildAll(spark, sfDir)
    println(f"[subset] layout phase ${(System.nanoTime() - lt0) / 1e9}%.3f s")
    // Diagnostic conf overrides, e.g. SPARK_GRAFT_SUBSET_CONF="spark.sql.adaptive.enabled=false;k2=v2"
    sys.env.get("SPARK_GRAFT_SUBSET_CONF").foreach { kvs =>
      kvs.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
        println(s"[subset] conf override: ${k.trim}=${v.trim}")
      }
    }
    val reps     = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[subset] UNKNOWN query: $name")
        case Some(fn) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).collect()
            (System.nanoTime() - t0) / 1e9
          }
          // metrics pass: one extra execution with counters isolated to it
          waitListenerBus(spark)
          listener.reset()
          val m0 = System.nanoTime()
          fn(spark, sfDir).collect()
          val mWall = (System.nanoTime() - m0) / 1e9
          waitListenerBus(spark)
          val s = times.sorted
          println(
            f"[subset] $name%-42s med=${s(s.size / 2)}%7.3f min=${s.head}%7.3f max=${s.last}%7.3f" +
              f" | wall=$mWall%6.3f jobs=${listener.jobs}%2d stages=${listener.stages}%3d tasks=${listener.tasks}%4d" +
              f" taskSec=${listener.taskMs / 1e3}%7.2f cpuSec=${listener.cpuMs / 1e3}%7.2f gcSec=${listener.gcMs / 1e3}%5.2f" +
              f" shR=${listener.shuffleReadB / 1048576.0}%7.1fM shW=${listener.shuffleWriteB / 1048576.0}%7.1fM spill=${listener.spillB / 1048576.0}%7.1fM"
          )
      }
    }
    spark.stop()
  }
}
