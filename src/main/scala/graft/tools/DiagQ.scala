package graft.tools

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-query overhead anatomy. For each named query, runs one
  * warm pass then one measured pass and prints job/stage/task counts and
  * the task-metric split (deserialize CPU, run CPU, GC, result ser,
  * shuffle bytes) — the evidence for "this row is task-overhead-bound,
  * not compute-bound" before touching its plan.
  *
  * args = sfDir name...
  */
object DiagQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // experiment knob: GRAFT_SQLCONF="key=value;key=value" applied to the
    // session before any query runs
    sys.env.get("GRAFT_SQLCONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })

    val verbose = sys.env.contains("GRAFT_DIAG_STAGES")
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, LongAdder]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong
    val deserCpu = new LongAdder; val runCpu = new LongAdder
    val gc = new LongAdder; val resultSer = new LongAdder
    val shRead = new LongAdder; val shWrite = new LongAdder
    val deserWall = new LongAdder; val runWall = new LongAdder
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // remember each stage's owning job callsite/description — AQE
        // shuffle-map stages carry an async-pool callsite of their own,
        // but the JOB was submitted with the user action's site
        val p = Option(j.properties)
        val desc = p.flatMap(pp => Option(pp.getProperty("spark.job.description"))
            .orElse(Option(pp.getProperty("callSite.short"))))
          .getOrElse("?") +
          p.flatMap(pp => Option(pp.getProperty("spark.sql.execution.root.id"))
            .orElse(Option(pp.getProperty("spark.sql.execution.id"))))
            .map(id => s" sqlExec=$id").getOrElse("")
        j.stageInfos.foreach(si =>
          stageJob.put(si.stageId, s"job${j.jobId}:$desc"))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        // the name's callsite is often an async-execution frame; the
        // first graft.* line of the long-form details is the real site
        val graftSite = s.stageInfo.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("DiagQ"))
          .map(_.trim.take(90)).getOrElse("")
        stageName.put(s.stageInfo.stageId, s.stageInfo.name.linesIterator
          .take(1).mkString.take(60) + " | " + graftSite)
        // GRAFT_DIAG_DETAILS: dump the whole callsite long-form per
        // stage — the async AQE/broadcast threads hide the graft site
        // from the one-line name, but the details string keeps it
        if (sys.env.contains("GRAFT_DIAG_DETAILS"))
          println(s"  [details stage ${s.stageInfo.stageId}] " +
            s.stageInfo.details.linesIterator.filter(_.contains("graft"))
              .take(3).mkString(" <- "))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        stageCpu.computeIfAbsent(t.stageId, _ => new LongAdder)
          .add(if (t.taskMetrics != null) t.taskMetrics.executorCpuTime else 0L)
        stageTasks.computeIfAbsent(t.stageId, _ => new AtomicLong)
          .incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          deserCpu.add(m.executorDeserializeCpuTime) // ns
          runCpu.add(m.executorCpuTime)              // ns
          gc.add(m.jvmGCTime)                        // ms
          resultSer.add(m.resultSerializationTime)   // ms
          deserWall.add(m.executorDeserializeTime)   // ms
          runWall.add(m.executorRunTime)             // ms
          shRead.add(m.shuffleReadMetrics.totalBytesRead)
          shWrite.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }

    def reset(): Unit = {
      stageName.clear(); stageCpu.clear(); stageTasks.clear()
      jobs.set(0); stages.set(0); tasks.set(0)
      deserCpu.reset(); runCpu.reset(); gc.reset(); resultSer.reset()
      shRead.reset(); shWrite.reset(); deserWall.reset(); runWall.reset()
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass: fixtures, JIT, codegen
      fn(spark, sfDir).count(); graft.util.Caches.sweep()
      spark.sparkContext.addSparkListener(listener)
      reset()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftCpuMeter.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      graft.util.Caches.sweep()
      println(f"DIAG $name%-34s wall=$dt%6.2fs rows=$n%-8d " +
        f"jobs=${jobs.get}%-4d stages=${stages.get}%-4d tasks=${tasks.get}%-5d " +
        f"deserCpu=${deserCpu.sum / 1e9}%6.2fs runCpu=${runCpu.sum / 1e9}%6.2fs " +
        f"gc=${gc.sum / 1e3}%5.2fs resultSer=${resultSer.sum / 1e3}%5.2fs " +
        f"deserWall=${deserWall.sum / 1e3}%6.2fs runWall=${runWall.sum / 1e3}%6.2fs " +
        f"shR=${shRead.sum / 1048576.0}%7.1fMB shW=${shWrite.sum / 1048576.0}%7.1fMB")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        stageCpu.asScala.toSeq.sortBy(-_._2.sum).take(25).foreach {
          case (sid, cpu) =>
            println(f"  stage $sid%-5d cpu=${cpu.sum / 1e9}%6.2fs " +
              f"tasks=${Option(stageTasks.get(sid)).map(_.get).getOrElse(0L)}%-4d " +
              s"[${stageJob.getOrDefault(sid, "?")}] " +
              s"${stageName.getOrDefault(sid, "?")}")
        }
      }
    }
    spark.stop()
  }
}
