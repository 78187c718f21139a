package graft

import graft.functions.CosineSim
import graft.plans.{CosineBoundRule, GraftExtensions}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** CosineBoundRule: the injected optimizer rule decides statically-known
  * cosine_sim predicates (cos ∈ [-1,1]; literal-side norm folded at plan
  * time) and must never change results for in-range thresholds. */
class OptimizerRuleSpec extends SparkSpec {

  /** Run f on a session built with GraftExtensions (injectOptimizerRule
    * path), restoring the shared default session afterwards. */
  private def withExtSession[T](f: SparkSession => T): T = {
    val prev = SparkSession.getDefaultSession
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s2)
    finally prev.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
  }

  private val unitQ = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)

  private def cosFilter(s: SparkSession, q: Array[Float], pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    CosineSim.register(s)
    val e = Tables.embeddings(s, sfSmoke)
    e.filter(pred(CosineSim(col("embedding"), typedlit(q))))
  }

  test("impossible threshold (tau > 1) prunes the scan to an empty relation") {
    withExtSession { s2 =>
      val df = cosFilter(s2, unitQ, _ >= 2.5)
      val opt = df.queryExecution.optimizedPlan
      assert(opt.collectFirst { case l: LocalRelation => l }.isDefined, opt.toString)
      assert(opt.collectFirst { case r: LogicalRelation => r }.isEmpty, opt.toString)
      assert(df.count() == 0)
    }
  }

  test("certain threshold (tau <= -1) reduces to IsNotNull, same rows") {
    val n = cosFilter(spark, unitQ, _ >= -1.0).count() // shared session: no rule
    withExtSession { s2 =>
      val df = cosFilter(s2, unitQ, _ >= -1.0)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.toLowerCase.contains("isnotnull(cosinesim"), opt)
      assert(!opt.contains(">= -1.0"), opt)
      assert(df.count() == n)
    }
  }

  test("zero-norm literal folds the whole expression to null at plan time") {
    withExtSession { s2 =>
      CosineSim.register(s2)
      val df = Tables.embeddings(s2, sfSmoke)
        .select(CosineSim(col("embedding"), typedlit(Array.fill(64)(0.0f))).as("c"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.toLowerCase.contains("cosine_sim"), opt)
      assert(df.filter(col("c").isNotNull).count() == 0)
      // and a filter on it prunes the scan entirely
      val pruned = cosFilter(s2, Array.fill(64)(0.0f), _ >= 0.1)
      assert(pruned.queryExecution.optimizedPlan
        .collectFirst { case l: LocalRelation => l }.isDefined)
    }
  }

  test("in-range thresholds are untouched and results identical") {
    val base = cosFilter(spark, unitQ, _ >= 0.25)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    withExtSession { s2 =>
      val got = cosFilter(s2, unitQ, _ >= 0.25)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(got == base)
      assert(got.nonEmpty) // the threshold actually selects something
    }
  }

  test("round-wrapped cosine predicates (the engine's own shape) are decided") {
    withExtSession { s2 =>
      CosineSim.register(s2)
      val df = Tables.embeddings(s2, sfSmoke)
        .filter(round(CosineSim(col("embedding"), typedlit(unitQ)), 4) >= 1.5)
      assert(df.queryExecution.optimizedPlan
        .collectFirst { case l: LocalRelation => l }.isDefined,
        df.queryExecution.optimizedPlan.toString)
      assert(df.count() == 0)
    }
  }

  test("runtime install() path works on a foreign session") {
    // the shared session gains the rule only inside this test's scope; the
    // rule is semantics-preserving so other suites are unaffected. The
    // extraOptimizations batch runs after PruneFilters, so the statically
    // decided predicate stays as Filter(false) rather than collapsing to a
    // LocalRelation — still short-circuited at runtime.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    CosineBoundRule.install(spark)
    val df = cosFilter(spark, unitQ, _ > 1.0)
    val opt = df.queryExecution.optimizedPlan
    val decided = opt.collectFirst {
      case LFilter(Literal(false, _), _) => ()
      case _: LocalRelation => ()
    }.isDefined
    assert(decided, opt.toString)
    assert(df.count() == 0)
  }
}
