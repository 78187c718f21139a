package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-14 wave 51: q229 — 2-D skyline (Pareto frontier) operator.
  *
  * A set-selection operator the relational surface lacks: the SKYLINE
  * (Börzsönyi et al. 2001) — rows not DOMINATED by any other row,
  * where q dominates p iff q is ≥ p in every dimension and > in at
  * least one. Here: orders maximizing (price, recency) — the "best
  * offers" frontier no TOP-K can express (top-k needs a scoring
  * function; the skyline is scoring-free).
  *
  * The 2-D algorithm is a prefix scan, NOT a self-join: group rows by
  * price (integer cents), keep each price's max day; walking prices
  * DESCENDING, a price level survives iff its max day strictly exceeds
  * every higher price's max day. The strictness is encoded by PACKING
  * (maxd · 2^30 + cents) into one long — the running max of the packed
  * value is achieved by the current row iff no higher-price level ties
  * or beats its day (a tie in day at higher cents dominates strictly
  * in cents, and the pack's low bits decide exactly that case) — so
  * one Ranks.runningMax pass computes dominance. Skyline members are
  * then every ORDER at a surviving (cents, maxd) point: equal-(c,d)
  * duplicates are mutually non-dominating and all belong.
  *
  * Exactness: cents = round(price·100) (2-decimal doubles, exact);
  * day = integer days since the corpus epoch (the q214 convention).
  * Pack headroom: cents < 2^27 at the TPC-H price domain, day < 2^13
  * — packed < 2^43.
  *
  * Scale notes (100 TB): one groupBy(cents) aggregate (map-side
  * combine) — the relation the scan walks is price-DOMAIN-sized, not
  * row-sized; the prefix max rides Ranks.runningMax (range-sliced
  * local maxima + k-row broadcast offsets — never one task; the
  * decomposition pins its own slice boundaries internally, so the
  * single-consumer aggregate needs no pre-materialization). The
  * surviving frontier is
  * strictly decreasing in day, so its size is bounded by the DAY
  * domain (a calendar constant, ~10^3) — broadcast back to orders is
  * safe by construction, not by luck. */
object Wave51Queries {

  private val Epoch = "1995-01-01"
  private val Pack = 1L << 30

  private val q229 = GQuery(
    "q229_skyline",
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        expr(s"CAST(datediff(CAST(o_orderdate AS DATE), date'$Epoch')" +
          " AS BIGINT)").as("day"))
      val perC = o.groupBy(col("cents")).agg(max(col("day")).as("maxd"))
        .withColumn("_g", lit(0))
      val run = Ranks.runningMax(perC, "_g", Seq(col("cents").desc),
        col("maxd") * Pack + col("cents"), "pmax")
      val reps = run
        .filter(col("maxd") * Pack + col("cents") === col("pmax"))
        .select(col("cents").as("sk_cents"), col("maxd"))
      o.join(broadcast(reps),
          col("cents") === col("sk_cents") && col("day") === col("maxd"))
        .select(col("o_orderkey"), col("cents"), col("day"))
        .orderBy(col("cents").desc, col("o_orderkey"))
    },
    Some(s"""WITH o AS (SELECT o_orderkey,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                    CAST(CAST(o_orderdate AS DATE) - DATE '$Epoch'
                      AS BIGINT) AS day
                  FROM orders),
                  g AS (SELECT cents, max(day) AS maxd FROM o GROUP BY 1),
                  r AS (SELECT cents, maxd, max(maxd) OVER (
                          ORDER BY cents DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          AS mstrict
                        FROM g),
                  sk AS (SELECT cents, maxd FROM r
                         WHERE maxd > coalesce(mstrict, -1))
             SELECT o.o_orderkey, o.cents, o.day
             FROM o JOIN sk ON o.cents = sk.cents AND o.day = sk.maxd
             ORDER BY o.cents DESC, o.o_orderkey""")
  )

  val all: Seq[GQuery] = Seq(q229)
}
