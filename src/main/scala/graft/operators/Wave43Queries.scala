package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-14 wave 43: q221 — HyperLogLog register-level accuracy audit.
  *
  * The sketch family prices membership (bloom q206), frequency (CMS
  * q218), heavy-hitter identity (Misra–Gries q123) and KMV distinct
  * counts (q109) with exact, oracle-reconstructable arithmetic — but
  * the distinct-count sketch a 100 TB pipeline actually deploys is
  * HLL (Flajolet et al. 2007), and the engine so far only EXPOSES it
  * through Spark's opaque approx_count_distinct (q43), whose binary
  * sketch no second engine can reconstruct. This sheet builds the HLL
  * registers themselves from the repo's shared md5-60 PRF — register
  * index = the hash's low b bits, rho = leading-zero count of the next
  * 27 bits + 1, register = max(rho) — so DuckDB reproduces every
  * register bit-for-bit, and the published error is a fact about HLL
  * geometry at this m, not about one engine's implementation.
  *
  * Estimator: the RAW HLL estimate E = alpha_m · m² / Σ 2^(−M_j),
  * computed in scaled integer arithmetic — Σ 2^(−M_j) is exact as
  * S = Σ 2^(Rmax − M_j) (absent registers contribute 2^Rmax), and
  * E = (alpha_ppm·m²·2^Rmax div S) div 10^6 with alpha_ppm a Scala-
  * computed literal embedded in both engines. No small-range linear-
  * counting branch (it needs ln): the sheet instead REPORTS zeros —
  * the number of empty registers — so the reader sees exactly when
  * the raw estimator sits in its documented biased region (n ≲ 2.5m,
  * the region where production HLL switches to linear counting). At
  * the audit's grouping (distinct users per event_type) the fixture
  * sits well above that region from sf0.01 up.
  *
  * Scale notes (100 TB): one map pass over events into a (grp, idx)
  * aggregate — at most |grps|·m rows ever shuffle (the register
  * relation IS the sketch, m·8 bytes per group, the production merge
  * unit: per-partition register maxes combine map-side because max is
  * the aggregation). The exact count-distinct baseline is the audit's
  * deliberate expensive path (distinct-key shuffle), priced by the
  * sheet exactly like q109's. m is a design constant (b = 6): the
  * integer estimator's headroom bound alpha_ppm·m²·2^Rmax < 2^63
  * allows b ≤ 7 at Rmax = 28; production b = 14 needs Rmax rescaled
  * or 128-bit accumulation — noted, out of fixture scope. The s35
  * streaming twin maintains the SAME registers as monotone
  * per-group state (max-merge is order-free, so stream == batch).
  */
object Wave43Queries {

  private[graft] val HllB = 6
  private[graft] val HllM = 1 << HllB // 64 registers
  private[graft] val HllWBits = 27    // rho window; Rmax = 28
  private[graft] val AlphaPpm: Long =
    math.round(1e6 * 0.7213 / (1.0 + 1.079 / HllM))
  /** alpha_ppm·m²·2^Rmax — the estimator numerator, precomputed so the
    * 2^60-magnitude product is one literal in both engines. */
  private[graft] val EstNum: Long =
    AlphaPpm * HllM.toLong * HllM.toLong * (1L << (HllWBits + 1))

  /** The shared register projection: (grp, idx, rho) from a key column —
    * one definition for batch q221 and the s35 streaming maintainer. */
  private[graft] def hllRegs(grp: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val h = TextOps.shingleHash60(concat(lit("hll:"), key.cast("string")))
    val hw = pmod(shiftright(h, HllB), lit(1L << HllWBits))
    Seq(grp.as("grp"), pmod(h, lit(HllM.toLong)).as("idx"),
      when(hw === 0, lit(HllWBits + 1))
        .otherwise(lit(HllWBits + 1) - length(bin(hw))).cast("long").as("rho"))
  }

  private val q221 = GQuery(
    "q221_hll_audit",
    (s, d) => {
      val ev = Tables.events(s, d)
      val regs = ev.select(hllRegs(col("event_type"), col("user_id")): _*)
        .groupBy(col("grp"), col("idx"))
        .agg(max(col("rho")).as("mreg"))
      val sketch = regs.groupBy(col("grp"))
        .agg(
          sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
            s"CAST(${HllWBits + 1} - mreg AS INT))")).as("s_present"),
          count(lit(1)).as("present"),
          max(col("mreg")).as("max_rho"))
        .select(col("grp"),
          (col("s_present") + (lit(HllM.toLong) - col("present"))
            * lit(1L << (HllWBits + 1))).as("s_all"),
          (lit(HllM.toLong) - col("present")).as("zeros"),
          col("max_rho"))
        .select(col("grp"),
          expr(s"($EstNum div s_all) div 1000000").as("hll_est"),
          col("zeros"), col("max_rho"))
      val exact = ev.groupBy(col("event_type").as("grp"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(sketch, Seq("grp"))
        .select(col("grp").as("event_type"), col("n_exact"), col("hll_est"),
          // `div`, not `/`+cast: both engines truncate toward zero on the
          // signed error, so an underestimate rounds identically
          expr("((hll_est - n_exact) * 1000000) div n_exact").as("err_ppm"),
          col("zeros"), col("max_rho"), lit(HllM.toLong).as("m"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH h AS (SELECT event_type AS grp, user_id,
                   CAST(concat('0x', substr(md5(concat('hll:',
                     CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
                 FROM events),
          r AS (SELECT grp, hv % $HllM AS idx,
                  CASE WHEN (hv // $HllM) % ${1L << HllWBits} = 0
                       THEN ${HllWBits + 1}
                       ELSE ${HllWBits + 1}
                            - length(bin((hv // $HllM) % ${1L << HllWBits}))
                  END AS rho
                FROM h),
          regs AS (SELECT grp, idx, CAST(max(rho) AS BIGINT) AS mreg
                   FROM r GROUP BY grp, idx),
          sk AS (SELECT grp,
                   CAST(sum(1::BIGINT << CAST(${HllWBits + 1} - mreg AS INT))
                     AS BIGINT)
                   + ($HllM - count(*)) * ${1L << (HllWBits + 1)} AS s_all,
                   $HllM - count(*) AS zeros,
                   CAST(max(mreg) AS BIGINT) AS max_rho
                 FROM regs GROUP BY grp),
          ex AS (SELECT event_type AS grp,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
                 FROM events GROUP BY 1)
          SELECT ex.grp AS event_type, ex.n_exact,
                 ($EstNum // sk.s_all) // 1000000 AS hll_est,
                 CAST(((($EstNum // sk.s_all) // 1000000) - ex.n_exact)
                   * 1000000 // ex.n_exact AS BIGINT) AS err_ppm,
                 CAST(sk.zeros AS BIGINT) AS zeros, sk.max_rho,
                 ${HllM}::BIGINT AS m
          FROM ex JOIN sk USING (grp)
          ORDER BY event_type""")
  )

  val all: Seq[GQuery] = Seq(q221)
}
