package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** Test-session-wide tripwire for unpartitioned corpus-sized windows
  * (r15 verdict task 5). PlanShapeSpec's registry sweep adjudicates
  * every REGISTRY query structurally; this listener applies the same
  * bounded-input judgment to every query ANY test executes — registry
  * or helper path — so the adjudicated bounded-aggregate windows stop
  * being WARN noise (the logger is silenced below; the check replaces
  * it) while a genuinely corpus-sized unpartitioned window in a
  * non-registry helper fails the test that ran it. */
object WindowTripwire {

  /** Bounded-input judgment for an unpartitioned window: the subtree
    * must reduce to model- or aggregate-sized data on EVERY path to a
    * leaf — an Aggregate, Limit, or literal relation cuts a path; a raw
    * table scan without one above it does not. Generate / Project /
    * Filter / Join / Union pass through (fan-out over an aggregate
    * stays aggregate-sized). Shared with PlanShapeSpec's registry-wide
    * sweep so both gates adjudicate identically. */
  def boundedBelow(p: logical.LogicalPlan): Boolean = p match {
    case _: logical.Aggregate => true
    case _: logical.GlobalLimit | _: logical.LocalLimit => true
    case _: logical.LocalRelation => true
    case _: logical.Range => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(boundedBelow)
  }

  private val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def drain(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var v = violations.poll()
    while (v != null) { b += v; v = violations.poll() }
    b.result()
  }

  /** The execution-listener bus is async, so a violation can surface
    * after its test returns — it is then attributed to the NEXT drain
    * in the same JVM. Good enough for CI (the run still fails); the
    * synchronous registry sweep in PlanShapeSpec remains the primary
    * gate for registry queries. */
  final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      try {
        qe.optimizedPlan.foreach {
          case w: logical.Window
              if w.partitionSpec.isEmpty && !boundedBelow(w.child) =>
            violations.add(
              s"unpartitioned corpus-sized window " +
                s"[${w.windowExpressions.map(_.name).mkString(",")}]")
          case _ =>
        }
      } catch { case _: Throwable => () } // never poison the bus
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }
}

/** Shared local session for all suites (one JVM per forked test group). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.listenerManager.register(new WindowTripwire.Listener)
    // The tripwire above supersedes WindowExec's blanket WARN ("No
    // Partition Defined for Window operation!"), which fires for the
    // adjudicated bounded-aggregate windows too and buried real signal
    // across the test logs.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfSmoke = "/root/testdata/sf0.001"

  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val out = super.withFixture(test)
    val v = WindowTripwire.drain()
    if (v.nonEmpty && out.isSucceeded)
      org.scalatest.Failed(new AssertionError(
        s"window tripwire during or before '${test.name}': ${v.mkString("; ")}"))
    else out
  }
}
