package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-14 wave 56: q234 — split-conformal prediction-interval audit.
  *
  * The eval family has reliability bins (q158), A/B inference (q143)
  * and ROC/PR readouts (q166/q172) — but not the distribution-free
  * guarantee modern eval stacks publish: SPLIT-CONFORMAL intervals
  * (Vovk et al. 2005; Lei et al. 2018), whose promise — coverage ≥
  * 1 − α with NO model or distribution assumption — holds by
  * construction if the quantile index is ⌈(n_cal + 1)(1 − α)⌉ over a
  * held-out calibration set. This sheet runs the full protocol on a
  * deliberately crude model (per-event-type mean of value cents,
  * integer-exact) so the guarantee, not the model, is what's audited:
  * hash-split events 2/1/1 into train/cal/test, nonconformity =
  * |v − μ(type)|, and per α ∈ {10%, 20%}: the conformal quantile
  * q̂ (the ⌈(n+1)(1−α)⌉-th order statistic, NOT the naive (1−α)
  * empirical quantile — the +1 is the finite-sample correction), the
  * target 1 − α in ppm, and the empirical test coverage in ppm. The
  * guarantee is MARGINAL (over random splits), so one fixed hash split
  * sits within sampling error of target, either side: the fixture
  * reads ~1.5% under at both levels with ~2.5k calibration rows —
  * exactly the √n-scale slack the Lei et al. upper bound prices.
  *
  * Exactness: cents via round(×100) (positive doubles round identically
  * in both engines); μ is an integer truncating division; ranks are
  * tie-broken by event_id, and the order statistic is a multiset fact.
  *
  * Scale notes (100 TB): the train pass is a ≤|types|-row aggregate
  * broadcast back (the q42 policy); the calibration rank rides
  * Ranks.rowNumber on a MATERIALIZED cal relation (the Ranks input
  * contract — its lineage contains a broadcast join) — range-sliced
  * local sorts, never one task; the two rank targets are a 1-row count
  * aggregate broadcast against it; test coverage is one flag aggregate
  * per α over the test slice, unioned. */
object Wave56Queries {

  private val Alphas = Seq(10L, 20L)

  private val q234 = GQuery(
    "q234_conformal",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        col("event_type").as("t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"),
        pmod(TextOps.shingleHash60(
          concat(col("event_id").cast("string"), lit(":cf"))), lit(4))
          .as("sp"))
      val mu = ev.filter(col("sp") <= 1).groupBy(col("t"))
        .agg(expr("sum(v) div count(1)").as("mu"),
          count(lit(1)).as("n_train"))
      val cal = Io.materialize(ev.filter(col("sp") === 2).join(mu, "t")
        .select(col("event_id"), abs(col("v") - col("mu")).as("sc")))
      val ranked = Ranks.rowNumber(cal.withColumn("_g", lit(0)), "_g",
        Seq(col("sc"), col("event_id")), "rn")
      val ks = cal.agg(count(lit(1)).as("n_cal"))
        .select(col("n_cal"), explode(array(Alphas.map(a =>
          struct(lit(a).as("alpha_pct"),
            expr(s"least(((n_cal + 1) * ${100 - a} + 99) div 100, n_cal)")
              .as("k"))): _*)).as("x"))
        .select(col("x.alpha_pct").as("alpha_pct"), col("x.k").as("k"),
          col("n_cal"))
      val qhat = ranked.join(broadcast(ks),
          col("rn").cast("long") === col("k"))
        .select(col("alpha_pct"), col("n_cal"), col("sc").as("qhat"))
      val test = ev.filter(col("sp") === 3).join(mu, "t")
        .select(abs(col("v") - col("mu")).as("sc"))
      val nTrain = mu.agg(sum(col("n_train")).as("n_train"))
      test.crossJoin(broadcast(qhat))
        .groupBy(col("alpha_pct"), col("n_cal"), col("qhat"))
        .agg(count(lit(1)).as("n_test"),
          sum((col("sc") <= col("qhat")).cast("long")).as("covered"))
        .crossJoin(broadcast(nTrain))
        .select(col("alpha_pct"), col("n_train"), col("n_cal"),
          col("n_test"), col("qhat"),
          ((lit(100L) - col("alpha_pct")) * 10000L).as("target_ppm"),
          expr("covered * 1000000 div n_test").as("coverage_ppm"))
        .orderBy(col("alpha_pct"))
    },
    Some {
      val alphaRows = Alphas.map(a =>
        s"SELECT ${a}::BIGINT AS alpha_pct").mkString(" UNION ALL ")
      s"""WITH ev AS (SELECT event_id, event_type AS t,
                   CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(concat('0x', substr(md5(
                     CAST(event_id AS VARCHAR) || ':cf'), 1, 15))
                     AS BIGINT) % 4 AS sp
                 FROM events),
              mu AS (SELECT t, CAST(sum(v) // count(*) AS BIGINT) AS mu,
                            CAST(count(*) AS BIGINT) AS n_train
                     FROM ev WHERE sp <= 1 GROUP BY 1),
              cal AS MATERIALIZED (
                SELECT ev.event_id, abs(v - mu) AS sc
                FROM ev JOIN mu USING (t) WHERE sp = 2),
              ranked AS (SELECT sc, row_number() OVER (
                           ORDER BY sc, event_id) AS rn FROM cal),
              nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
              al AS ($alphaRows),
              ks AS (SELECT alpha_pct,
                            least(((n_cal + 1) * (100 - alpha_pct) + 99)
                              // 100, n_cal) AS k, n_cal
                     FROM al, nc),
              qh AS (SELECT alpha_pct, n_cal, sc AS qhat
                     FROM ks JOIN ranked ON ranked.rn = ks.k),
              ts AS (SELECT abs(v - mu) AS sc
                     FROM ev JOIN mu USING (t) WHERE sp = 3),
              nt AS (SELECT CAST(sum(n_train) AS BIGINT) AS n_train FROM mu)
         SELECT alpha_pct, n_train, n_cal,
                CAST(count(*) AS BIGINT) AS n_test, qhat,
                (100 - alpha_pct) * 10000 AS target_ppm,
                CAST(sum(CASE WHEN sc <= qhat THEN 1 ELSE 0 END) * 1000000
                  // count(*) AS BIGINT) AS coverage_ppm
         FROM ts, qh, nt
         GROUP BY alpha_pct, n_train, n_cal, qhat
         ORDER BY alpha_pct"""
    }
  )

  val all: Seq[GQuery] = Seq(q234)
}
