package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Map/reduce phase-timing report — the Spark analogue of the reference's
  * per-phase wall-clock metrics (R13: parallel_sort.cpp:148-150,
  * max_aggregation.cpp:67-69). In Spark the phase boundary is the shuffle:
  * stages that read no shuffle data are "map" phases (scan + partial
  * compute, ≙ the reference's worker loops), stages that fetch shuffle
  * output are "reduce" phases (final aggregation/merge, ≙ its CAS/
  * semaphore combine and merge reducer).
  *
  * Attach with spark.sparkContext.addSparkListener; task-time totals are
  * CPU-parallel sums, comparable across runs at a fixed core count.
  */
class PhaseTiming extends SparkListener {
  private val mapMs = new LongAdder
  private val reduceMs = new LongAdder
  private val mapStages = new LongAdder
  private val reduceStages = new LongAdder

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val m = ev.stageInfo.taskMetrics
    if (m != null) {
      val isReduce = m.shuffleReadMetrics != null && m.shuffleReadMetrics.totalBytesRead > 0
      if (isReduce) { reduceMs.add(m.executorRunTime); reduceStages.increment() }
      else { mapMs.add(m.executorRunTime); mapStages.increment() }
    }
  }

  def report: String =
    s"""{"map_ms":${mapMs.sum()},"reduce_ms":${reduceMs.sum()},""" +
      s""""map_stages":${mapStages.sum()},"reduce_stages":${reduceStages.sum()}}"""
}
