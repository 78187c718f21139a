package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-14 wave 50: q228 — hash-sample quantile accuracy audit.
  *
  * The sketch family prices distinct counts (HLL q221, KMV q109),
  * frequency (CMS q218), membership (bloom q206) and Spark's own
  * percentile_approx (q43) — but the cheapest production quantile
  * estimate of all is "rank the SAMPLE": a Bernoulli 1/M hash sample
  * plus an exact quantile over it. What that buys and costs is a
  * measurable fact this sheet publishes: for p ∈ {25, 50, 75, 90, 99}
  * it reports the exact type-1 (discrete) quantile of lineitem price
  * cents, the same quantile over the 1/64 keyed hash sample, and the
  * absolute + ppm error — the classic DKW-bounded sampling error made
  * concrete at the fixture's n.
  *
  * Determinism: the quantile is the k-th order statistic with
  * k = ⌈p·n/100⌉ = (p·n + 99) div 100 — a pure multiset fact, with
  * the rank pass tie-broken by the unique (cents, orderkey, linenumber)
  * triple; the sample is the repo's shared md5-60 PRF on the row key
  * (mod 64), so both engines draw the identical sample. Prices become
  * integer cents via round(×100) — exact, the ±0.5-safe path for
  * 2-decimal doubles.
  *
  * Scale notes (100 TB): the EXACT side is the audit's deliberate
  * expensive baseline — one fused Ranks pass (range-partitioned local
  * sorts + broadcast slice offsets, the q61/q63 machinery; never one
  * task) that carries BOTH ranks: the global row number and, as a
  * running count of the sample flag, the sample-internal rank (r16 —
  * the r15 form ranked the sample in a second full Ranks pipeline; the
  * subset's rank is a prefix sum over the same order, so one range
  * shuffle serves both sides). The five rank targets derive from a
  * 1-row count aggregate broadcast against the ranked relation — no
  * data-sized join, no second sort. */
object Wave50Queries {

  private val Ps = Seq(25L, 50L, 75L, 90L, 99L)
  private val SampleMod = 64

  private val q228 = GQuery(
    "q228_sample_quantile",
    (s, d) => {
      // r16 optimization (guide §2.4: one pass, not two): the sample is a
      // SUBSET of the full relation under the same total order, so its
      // rank is the inclusive running count of the sample flag — one
      // fused Ranks.rowNumberAndRunningSum pass replaces the r15 shape's
      // TWO independent rank pipelines (two range shuffles, two
      // materializations). exact rank rn and sample rank srn are
      // value-identical to the two-pass form: srn of a sample row =
      // |sample rows with key ≤ its key| = its rank within the sample.
      val samp = when(pmod(TextOps.shingleHash60(
        concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"), lit(":qs"))),
        lit(SampleMod)) === 0, 1L).otherwise(0L)
      val li = Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
      // ranked feeds the count aggregate and both rank probes —
      // materialize per the Ranks multi-consumer rule
      // (WindowQueries q03 precedent; q233's sf1 row-loss lesson)
      val ranked = Io.materialize(
        Ranks.rowNumberAndRunningSum(
          li.withColumn("_g", lit(0)).withColumn("_samp", samp), "_g",
          Seq(col("cents"), col("l_orderkey"), col("l_linenumber")),
          col("_samp"), "rn", "srn"))
      val ks = ranked.agg(count(lit(1)).as("n"), sum(col("_samp")).as("m"))
        .select(col("n"), col("m"), explode(array(Ps.map(p =>
          struct(lit(p).as("p"),
            expr(s"($p * n + 99) div 100").as("kx"),
            expr(s"($p * m + 99) div 100").as("ke"))): _*)).as("x"))
        .select(col("x.p").as("p"), col("x.kx").as("kx"),
          col("x.ke").as("ke"), col("n"), col("m"))
      val exact = ranked.join(broadcast(ks),
          col("rn").cast("long") === col("kx"))
        .select(col("p"), col("n"), col("cents").as("exact_cents"))
      val est = ranked.filter(col("_samp") === 1L)
        .join(broadcast(ks), col("srn") === col("ke"))
        .select(col("p"), col("m"), col("cents").as("est_cents"))
      exact.join(broadcast(est), "p")
        .select(col("p"), col("n"), col("exact_cents"), col("m"),
          col("est_cents"),
          abs(col("est_cents") - col("exact_cents")).as("abs_err"),
          expr("abs(est_cents - exact_cents) * 1000000 div exact_cents")
            .as("err_ppm"))
        .orderBy(col("p"))
    },
    Some(s"""WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS cents, l_orderkey, l_linenumber
                         FROM lineitem),
                  f AS MATERIALIZED (
                    SELECT cents, row_number() OVER (
                      ORDER BY cents, l_orderkey, l_linenumber) AS rn
                    FROM li),
                  sm AS MATERIALIZED (
                    SELECT cents, row_number() OVER (
                      ORDER BY cents, l_orderkey, l_linenumber) AS rn
                    FROM li
                    WHERE CAST(concat('0x', substr(md5(
                        CAST(l_orderkey AS VARCHAR) || ':'
                        || CAST(l_linenumber AS VARCHAR) || ':qs'),
                      1, 15)) AS BIGINT) % $SampleMod = 0),
                  ps AS (SELECT unnest([${Ps.mkString("::BIGINT, ")}::BIGINT])
                           AS p),
                  fn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
                  smn AS (SELECT CAST(count(*) AS BIGINT) AS m FROM sm),
                  ex AS (SELECT p, n, cents AS exact_cents
                         FROM ps, fn, f WHERE f.rn = (p * n + 99) // 100),
                  es AS (SELECT p, m, cents AS est_cents
                         FROM ps, smn, sm WHERE sm.rn = (p * m + 99) // 100)
             SELECT p, n, exact_cents, m, est_cents,
                    abs(est_cents - exact_cents) AS abs_err,
                    CAST(abs(est_cents - exact_cents) * 1000000
                      // exact_cents AS BIGINT) AS err_ppm
             FROM ex JOIN es USING (p) ORDER BY p""")
  )

  val all: Seq[GQuery] = Seq(q228)
}
