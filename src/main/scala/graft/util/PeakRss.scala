package graft.util

/** Peak resident set size of this JVM — the Spark counterpart of the
  * reference's `getrusage(RUSAGE_SELF).ru_maxrss` report
  * (parallel_sort.cpp:15-19,152; max_aggregation.cpp:17-21,69 → R14 in
  * SURVEY §2-A). Linux exposes the same kernel counter as VmHWM in
  * /proc/self/status (kilobytes, like ru_maxrss). On a cluster the
  * per-executor equivalent comes from the executor metrics endpoint
  * (ProcessTreeRSS / JVMHeapMemory); this helper covers the single-JVM
  * local[*] deployment the bench contract runs. */
object PeakRss {

  /** Peak RSS in KB, or -1 where /proc is unavailable. */
  def kb(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines()
        .collectFirst { case l if l.startsWith("VmHWM:") =>
          l.stripPrefix("VmHWM:").trim.split("\\s+")(0).toLong }
        .getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }
}
