package org.apache.spark

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Executor-CPU metering for `graft.Bench` (r15 verdict #3): two
  * consecutive rounds of ~1.10 wall-time medians that forensics
  * attributed to host steal mean the committed wall trend no longer
  * measures the code — per-query executor CPU time (the sum of
  * `TaskMetrics.executorCpuTime` over the query's tasks) is the
  * steal-immune channel: a noisy neighbor stretches wall clocks but
  * not the cycles this process's tasks actually burned.
  *
  * Lives in `org.apache.spark` for exactly one reason:
  * `SparkContext.listenerBus` is `private[spark]`, and DRAINING the
  * async bus between queries is what makes per-query attribution
  * exact — task-end events post asynchronously, so without the drain
  * a query's tail tasks charge to the next row. Nothing else here
  * touches internals; the listener itself is the public
  * [[SparkListener]] API.
  *
  * Scope: task CPU only — driver-side work (fixture setup, collect
  * loops in audit ops) is invisible to this channel by design; the
  * wall column remains the end-to-end number, this one isolates
  * executor compute.
  */
object GraftCpuMeter {

  final class Meter extends SparkListener {
    val cpuNs = new AtomicLong(0L)
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  def install(sc: SparkContext): Meter = {
    val m = new Meter
    sc.addSparkListener(m)
    m
  }

  /** Block until the listener bus has delivered every posted event
    * (bounded; a timeout degrades attribution, never the bench).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
