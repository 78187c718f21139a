package graft

import graft.functions.{CosineSim, SimHash64}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The custom expressions must behave as first-class Catalyst citizens:
  * constant-folded when foldable, inside whole-stage codegen when not,
  * and mathematically sane on arbitrary inputs. */
class ExpressionIntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSim over literals is constant-folded by the optimizer") {
    CosineSim.register(spark)
    val df = spark.range(1).select(
      call_function("cosine_sim",
        typedLit(Array(1.0f, 2.0f)), typedLit(Array(1.0f, 2.0f))).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), optimized) // folded to a literal
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
  }

  test("CosineSim and SimHash64 projections stay inside WholeStageCodegen") {
    CosineSim.register(spark)
    SimHash64.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sfSmoke)
    // whole-stage-codegen'd operators print with a "*(n)" stage prefix
    val p1 = emb.select(CosineSim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(p1.contains("*(1) Project"), p1)
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
    val p2 = docs.select(SimHash64(split(col("text"), " ")))
      .queryExecution.executedPlan.toString
    assert(p2.contains("*(1) Project"), p2)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("property: cosine is bounded, symmetric, and scale-invariant") {
    CosineSim.register(spark)
    val pairs = samples(Gen.zip(vecGen, vecGen), 25)
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val df = pairs.toDF("a", "b").select(
      CosineSim(col("a"), col("b")).as("ab"),
      CosineSim(col("b"), col("a")).as("ba"),
      CosineSim(transform(col("a"), x => x * 2.0f), col("b")).as("a2b"))
    df.collect().foreach { r =>
      val (ab, ba, a2b) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      assert(ab == ba)                       // exact: same fold order
      assert(math.abs(ab - a2b) < 1e-6)      // scale invariance
    }
  }
}
