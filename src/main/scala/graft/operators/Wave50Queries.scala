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
  * expensive baseline — one Ranks.rowNumber pass (range-partitioned
  * local sorts + broadcast slice offsets, the q61/q63 machinery; never
  * one task). The estimate side ranks n/64 rows the same way. The five
  * rank targets derive from 1-row count aggregates broadcast against
  * the ranked relations — no data-sized join, no second sort. */
object Wave50Queries {

  private val Ps = Seq(25L, 50L, 75L, 90L, 99L)
  private val SampleMod = 64

  private val q228 = GQuery(
    "q228_sample_quantile",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
      // ranked output feeds TWO subtrees (the count aggregate and the
      // rank probe) — materialize per the Ranks multi-consumer rule
      // (WindowQueries q03 precedent; q233's sf1 row-loss lesson)
      def ranked(df: org.apache.spark.sql.DataFrame) = Io.materialize(
        Ranks.rowNumber(df.withColumn("_g", lit(0)), "_g",
          Seq(col("cents"), col("l_orderkey"), col("l_linenumber")), "rn"))
      def pick(df: org.apache.spark.sql.DataFrame, nAs: String,
          vAs: String) = {
        val r = ranked(df)
        val ks = r.agg(count(lit(1)).as(nAs))
          .select(col(nAs), explode(array(Ps.map(p =>
            struct(lit(p).as("p"),
              expr(s"($p * $nAs + 99) div 100").as("k"))): _*)).as("x"))
          .select(col("x.p").as("p"), col("x.k").as("k"), col(nAs))
        r.join(broadcast(ks), col("rn").cast("long") === col("k"))
          .select(col("p"), col(nAs), col("cents").as(vAs))
      }
      val exact = pick(li, "n", "exact_cents")
      val est = pick(li.filter(pmod(TextOps.shingleHash60(
        concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"), lit(":qs"))),
        lit(SampleMod)) === 0), "m", "est_cents")
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
