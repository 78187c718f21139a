package graft

import graft.functions.MilliQuant
import org.apache.spark.sql.functions._

/** Parity pins for the r17 milli-grid quantization kernel: output must
  * be bit-identical to the expression form it replaced —
  * `transform(embedding, x => round(cast(x as double) * 1000, 0)
  *  .cast("long"))` — the form the DuckDB oracles mirror, on fixture
  * embeddings and on every boundary the case analysis in the kernel's
  * scaladoc names (decimal .5 ties, negative ties, NaN, ±Inf, huge
  * magnitudes past 2^52, null elements, null arrays). */
class VecQuantSpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(v: org.apache.spark.sql.Column) =
    transform(v, x => round(x.cast("double") * 1000, 0).cast("long"))

  test("kernel equals the expression form on fixture embeddings") {
    MilliQuant.register(spark)
    val diff = graft.sources.Tables.embeddings(spark, sfSmoke)
      .select(MilliQuant(col("embedding")).as("a"),
        oldForm(col("embedding")).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff == 0L, "kernel diverges from expression form on fixtures")
  }

  test("boundary values: ties, negatives, 2^52, nulls") {
    MilliQuant.register(spark)
    // NaN/±Inf/|x·1000| ≥ 2^63 are NOT tested against the old form: the
    // expression THROWS there under the session's ANSI default — a
    // region no call site reaches (the kernel is total on it instead,
    // see its scaladoc)
    val f = Seq[Float](
      0.0005f, -0.0005f, 0.0015f, -0.0015f,      // .5-tie neighborhoods
      0.5f, -0.5f, 2.5f, -2.5f,                  // exact integer-ish ties
      0.49999999f, -0.49999999f,
      Float.MinPositiveValue,
      4.5035996e12f, -4.5035996e12f,             // ×1000 crosses 2^52
      1.0e14f, -1.0e14f, 0.0f, -0.0f)
    val rows = Seq(
      Some(f.toSeq.map(Option(_))),
      Some(Seq(Some(1.0f), None, Some(-1.0f))),  // null element
      None                                        // null array
    ).toDF("embedding")
    val got = rows
      .select(MilliQuant(col("embedding")).as("a"),
        oldForm(col("embedding")).as("b"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), s"null array: $r")
      else assert(r.getSeq[Any](0) == r.getSeq[Any](1), s"row $r")
    }
  }

  test("randomized floats agree with the expression form") {
    MilliQuant.register(spark)
    val rnd = new scala.util.Random(0xC0FFEE)
    // mixed magnitudes: milli-grid scale, unit scale, large, tiny
    val vecs = (1 to 2000).map { _ =>
      Seq.fill(16)(
        (rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(9) - 4).toFloat)
    }
    val diff = vecs.toDF("embedding")
      .select(MilliQuant(col("embedding")).as("a"),
        oldForm(col("embedding")).as("b"))
      .filter(not(col("a") <=> col("b")))
      .count()
    assert(diff == 0L, "kernel diverges on randomized input")
  }
}
