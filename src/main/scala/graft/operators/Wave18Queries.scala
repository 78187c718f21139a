package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 wave 18: pipeline governance and selection mechanics — the
  * right-to-be-forgotten cascade audit (q162), global-vs-per-source
  * threshold selection skew (q163), the context-length packing planner
  * (q164), and confident-learning label-noise estimation (q165). Each is
  * map + bounded-aggregate shaped; q163's only window rides over an
  * already-aggregated distinct-value relation.
  */
object Wave18Queries {

  /** Deletion-list sampling modulus for q162 (≈1% of customers). */
  private val DelMod = 97

  /** q162 — deletion-propagation audit (right-to-be-forgotten manifest):
    * given a deletion list of customers (hash-sampled here, an uploaded
    * key list in production), measure the cascade — how many rows each
    * downstream table loses: customer directly, orders via custkey,
    * lineitem via the order keys of those orders (a TWO-hop semi-join
    * cascade, which is what makes deletion planning a distributed
    * problem: the lineitem hit set is reachable only through orders).
    * The manifest (per table: total rows, rows to delete, fraction) is
    * what a GDPR/CCPA erasure job reviews before executing, and what
    * capacity planning reads to size the rewrite.
    *
    * Determinism: all counts exact; one rounded division per row; fixed
    * 3-row output ordered by table name.
    *
    * Scale notes: the deletion list is corpus-fraction-sized; both hops
    * are key equi-semi-joins (no row ever widens) through
    * [[KeyPrune.semiJoin]], which broadcasts the key list while it fits
    * the spark.graft.broadcastKeyLimit budget and switches to q90's
    * bloom-pruned shuffle once it outgrows one (value-identical either
    * way — the exact semi-join always runs; PlanShapeSpec locks both
    * regimes). Each table reduces to a 1-row count aggregate. */
  private val q162 = GQuery(
    "q162_deletion_audit",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val del = cust.filter(pmod(TextOps.shingleHash60(
        concat(col("c_custkey").cast("string"), lit(":del"))),
        lit(DelMod)) === 0)
        .select(col("c_custkey"))
      val orders = Tables.orders(s, d)
      // MATERIALIZED: the hop-1 hit set feeds TWO consumers (the orders
      // audit row and hop 2's key list) — lazy, the whole orders ⋉ del
      // join re-executed per consumer (ADVICE r10). One eager build of
      // the slim key projection; both consumers read a block scan.
      val delOrderKeys = graft.sources.Io.materialize(
        KeyPrune.semiJoin(orders, del, "o_custkey", "c_custkey")
          .select(col("o_orderkey")))
      val li = Tables.lineitem(s, d)
      val delLi = KeyPrune.semiJoin(li, delOrderKeys,
        "l_orderkey", "o_orderkey")
      def row(name: String, total: DataFrame, dele: DataFrame): DataFrame =
        total.agg(count(lit(1)).as("n_total"))
          .crossJoin(dele.agg(count(lit(1)).as("n_delete")))
          .select(lit(name).as("table_name"), col("n_total"), col("n_delete"),
            round(col("n_delete") / col("n_total"), 6).as("frac"))
      row("customer", cust, del)
        .union(row("lineitem", li, delLi))
        .union(row("orders", orders, delOrderKeys))
        .orderBy(col("table_name"))
    },
    Some(s"""WITH del AS (SELECT c_custkey FROM customer
               WHERE CAST(concat('0x', substr(md5(
                       CAST(c_custkey AS VARCHAR) || ':del'), 1, 15))
                     AS BIGINT) % $DelMod = 0),
          delo AS (SELECT o_orderkey FROM orders
                   WHERE o_custkey IN (SELECT c_custkey FROM del)),
          rows_ AS (
            SELECT 'customer' AS table_name,
                   (SELECT count(*) FROM customer) AS n_total,
                   (SELECT count(*) FROM del) AS n_delete
            UNION ALL
            SELECT 'orders', (SELECT count(*) FROM orders),
                   (SELECT count(*) FROM delo)
            UNION ALL
            SELECT 'lineitem', (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IN (SELECT o_orderkey FROM delo)))
          SELECT table_name, n_total, n_delete,
                 round(n_delete / CAST(n_total AS DOUBLE), 6) AS frac
          FROM rows_ ORDER BY table_name""")
  )

  /** q163 — global-threshold selection skew: apply ONE corpus-global
    * quality cutoff (the exact lower median of n_chars — the integer
    * rank-quantile, no interpolation) and measure how unevenly the kept
    * fraction lands across sources. A global threshold at 50% keep-rate
    * does NOT keep 50% of each source — long-document sources sail
    * through, short-document sources are decimated — and this skew sheet
    * (per source: kept fraction and its ratio to the global rate) is the
    * evidence for switching to per-source thresholds (q88's stratified
    * discipline). The cutoff is data-derived, not a constant: the
    * smallest value whose cumulative count reaches half the corpus.
    *
    * Determinism: the cutoff is an exact integer rank statistic; counts
    * exact; two rounded divisions per row; skew is NULL-guarded for the
    * degenerate single-value corpus (both engines through the same
    * CASE).
    *
    * Scale notes: the value-frequency relation is distinct-length-sized
    * (hundreds of rows), so its running-sum window is over an AGGREGATE,
    * never the corpus (the sweep-sanctioned shape); the cutoff is a
    * 1-row broadcast back onto a source-keyed aggregate. */
  private val q163 = GQuery(
    "q163_threshold_skew",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val freq = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
        .select(col("n_chars").as("v"), col("c"))
      val tot = freq.agg(sum(col("c")).as("n"))
      val cum = freq.withColumn("cc",
        sum(col("c")).over(Window.orderBy(col("v"))))
      val cut = cum.crossJoin(broadcast(tot))
        .filter(col("cc") * 2 >= col("n"))
        .agg(min(col("v")).as("cutoff"))
      val k = docs.crossJoin(broadcast(cut))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_chars") > col("cutoff"), 1L).otherwise(0L))
            .as("n_kept"),
          first(col("cutoff")).as("cutoff"))
      val g = k.agg((sum(col("n_kept")).cast("double") / sum(col("n_docs")))
        .as("gf"))
      k.crossJoin(broadcast(g))
        .select(col("source"), col("n_docs"), col("n_kept"),
          round(col("n_kept") / col("n_docs"), 6).as("kept_frac"),
          col("cutoff"),
          when(col("gf") > 0,
            round((col("n_kept") / col("n_docs")) / col("gf"), 4)).as("skew"))
        .orderBy(col("source"))
    },
    Some("""WITH f AS (SELECT n_chars AS v, count(*) AS c
              FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM f),
          cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cc FROM f),
          cut AS (SELECT min(v) AS cutoff FROM cum, t WHERE 2 * cc >= n),
          k AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN n_chars > cutoff THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_kept,
                   any_value(cutoff) AS cutoff
                FROM documents, cut GROUP BY source),
          g AS (SELECT CAST(sum(n_kept) AS DOUBLE) / sum(n_docs) AS gf FROM k)
          SELECT source, n_docs, n_kept,
                 round(n_kept / CAST(n_docs AS DOUBLE), 6) AS kept_frac,
                 cutoff,
                 CASE WHEN gf > 0 THEN
                   round((n_kept / CAST(n_docs AS DOUBLE)) / gf, 4) END AS skew
          FROM k, g ORDER BY source""")
  )

  /** Candidate context lengths (tokens) for q164 — the grid a training
    * run actually chooses among. */
  private val CtxGrid = Seq(128L, 512L, 2048L)

  /** q164 — context-length packing planner: for each candidate context
    * window, the full cost sheet of committing the corpus to it — how
    * many documents truncate and how many tokens they lose (bigger ctx
    * wins), how much padding one-doc-per-sequence wastes and the
    * perfect-packing sequence lower bound with its utilization (smaller
    * ctx wins) — i.e. the measured tradeoff curve q154 (padding waste at
    * one config) and q69 (the packer itself) sit on either side of.
    * Planning is a measurement problem over the token-length
    * distribution, exactly like q151 plans watermarks over arrival skew;
    * this is the same grid pattern applied to sequence budgeting.
    *
    * Determinism: everything is exact integer arithmetic (ceil-division
    * included) except the three rounded ratio columns.
    *
    * Scale notes: one map pass (token count per doc) fanned ×|grid| into
    * a |grid|-group aggregate with map-side combine — nothing data-sized
    * survives the aggregate; the ×3 pre-combine expansion is the q151
    * watermark-grid precedent. */
  private val q164 = GQuery(
    "q164_context_planner",
    (s, d) => {
      val ntok = Tables.documents(s, d)
        .select(size(TextOps.tokens(col("text"))).cast("bigint").as("tok"))
      ntok
        .withColumn("ctx", explode(array(CtxGrid.map(lit(_)): _*)))
        .groupBy(col("ctx"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tok") > col("ctx"), 1L).otherwise(0L)).as("n_trunc"),
          sum(col("tok")).as("tok_total"),
          sum(greatest(lit(0L), col("tok") - col("ctx"))).as("tok_lost"),
          sum(col("ctx") - least(col("tok"), col("ctx"))).as("pad_unpacked"),
          sum(least(col("tok"), col("ctx"))).as("kept"))
        .withColumn("seqs_lb",
          expr("(kept + ctx - 1) DIV ctx"))
        .select(col("ctx"), col("n_docs"), col("n_trunc"),
          round(col("n_trunc") / col("n_docs"), 6).as("trunc_frac"),
          col("tok_total"), col("tok_lost"), col("pad_unpacked"),
          round(col("pad_unpacked") / (col("n_docs") * col("ctx")), 6)
            .as("pad_frac"),
          col("seqs_lb"),
          round(col("kept") / (col("seqs_lb") * col("ctx")), 6).as("util"))
        .orderBy(col("ctx"))
    },
    Some(s"""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                    AS tok FROM documents),
          e AS (SELECT tok, ctx FROM d,
                  (SELECT CAST(unnest([${CtxGrid.mkString(", ")}]) AS BIGINT)
                     AS ctx)),
          a AS (SELECT ctx, count(*) AS n_docs,
                   CAST(sum(CASE WHEN tok > ctx THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_trunc,
                   CAST(sum(tok) AS BIGINT) AS tok_total,
                   CAST(sum(greatest(0, tok - ctx)) AS BIGINT) AS tok_lost,
                   CAST(sum(ctx - least(tok, ctx)) AS BIGINT) AS pad_unpacked,
                   CAST(sum(least(tok, ctx)) AS BIGINT) AS kept
                FROM e GROUP BY ctx)
          SELECT ctx, n_docs, n_trunc,
                 round(n_trunc / CAST(n_docs AS DOUBLE), 6) AS trunc_frac,
                 tok_total, tok_lost, pad_unpacked,
                 round(pad_unpacked / CAST(n_docs * ctx AS DOUBLE), 6)
                   AS pad_frac,
                 CAST((kept + ctx - 1) // ctx AS BIGINT) AS seqs_lb,
                 round(kept / CAST(((kept + ctx - 1) // ctx) * ctx AS DOUBLE), 6)
                   AS util
          FROM a ORDER BY ctx""")
  )

  /** q165 — label-noise estimation (confident learning, binary): given
    * labels (embeddings.label parity) and model confidences (md5-derived
    * milli-grid scores, the q158 synthetic-truth convention), count the
    * confident joint — examples whose score clears the mean confidence
    * of a class DIFFERENT from their given label are the suspected
    * label errors, and the off-diagonal fraction is the corpus
    * label-noise estimate a labeling pipeline reads before deciding to
    * relabel. Class thresholds are the per-class mean scores; membership
    * tests are EXACT integer cross-multiplications (p·n₁ ≥ Σp₁ instead
    * of p ≥ Σp₁/n₁), so no engine ever compares against a rounded mean
    * — including the both-confident margin tie-break.
    *
    * Determinism: all counts and comparisons are exact integer
    * arithmetic; the noise fraction is one guarded rounded division.
    *
    * Scale notes: one map pass into a 1-row threshold aggregate
    * (broadcast back), one more map pass into a grouping-free confusion
    * aggregate — the q157 shape with a 1-row broadcast in between. */
  private val q165 = GQuery(
    "q165_label_noise",
    (s, d) => {
      val sc = Tables.embeddings(s, d).select(
        (col("label") % 2).cast("int").as("y"),
        pmod(TextOps.shingleHash60(
          concat(col("vec_id").cast("string"), lit(":cl"))), lit(1000)).as("p"))
      val th = sc.agg(
        sum(when(col("y") === 1, col("p"))).as("sp1"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("y") === 0, col("p"))).as("sp0"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n0"))
      val pred = when(col("p") * col("n1") >= col("sp1") &&
          !(col("p") * col("n0") <= col("sp0")), 1)
        .when(col("p") * col("n0") <= col("sp0") &&
          !(col("p") * col("n1") >= col("sp1")), 0)
        .when(col("p") * col("n1") >= col("sp1") &&
          col("p") * col("n0") <= col("sp0"),
          when((col("p") * col("n1") - col("sp1")) * col("n0")
            >= (col("sp0") - col("p") * col("n0")) * col("n1"), 1).otherwise(0))
        .otherwise(-1)
      sc.crossJoin(broadcast(th))
        .withColumn("pred", pred)
        .agg(count(lit(1)).as("n"),
          sum(when(col("y") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("c11"),
          sum(when(col("y") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("c10"),
          sum(when(col("y") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("c01"),
          sum(when(col("y") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("c00"),
          sum(when(col("pred") === -1, 1L).otherwise(0L)).as("n_unconf"))
        .select(col("n"), col("c11"), col("c10"), col("c01"), col("c00"),
          col("n_unconf"),
          when(col("c11") + col("c10") + col("c01") + col("c00") > 0,
            round((col("c10") + col("c01"))
              / (col("c11") + col("c10") + col("c01") + col("c00")), 6))
            .as("noise_frac"))
    },
    Some("""WITH s AS (SELECT CAST(label % 2 AS INTEGER) AS y,
                    CAST(concat('0x', substr(md5(
                        CAST(vec_id AS VARCHAR) || ':cl'), 1, 15))
                      AS BIGINT) % 1000 AS p
              FROM embeddings),
          t AS (SELECT CAST(sum(CASE WHEN y = 1 THEN p END) AS BIGINT) AS sp1,
                       CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN y = 0 THEN p END) AS BIGINT) AS sp0,
                       CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
                FROM s),
          j AS (SELECT y,
                   CASE WHEN p * n1 >= sp1 AND NOT (p * n0 <= sp0) THEN 1
                        WHEN p * n0 <= sp0 AND NOT (p * n1 >= sp1) THEN 0
                        WHEN p * n1 >= sp1 AND p * n0 <= sp0 THEN
                          CASE WHEN (p * n1 - sp1) * n0 >= (sp0 - p * n0) * n1
                               THEN 1 ELSE 0 END
                        ELSE -1 END AS pred
                FROM s, t)
          SELECT count(*) AS n,
                 CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c11,
                 CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c10,
                 CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c01,
                 CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c00,
                 CAST(sum(CASE WHEN pred = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unconf,
                 CASE WHEN sum(CASE WHEN pred <> -1 THEN 1 ELSE 0 END) > 0 THEN
                   round(sum(CASE WHEN (y = 1 AND pred = 0)
                                    OR (y = 0 AND pred = 1) THEN 1 ELSE 0 END)
                         / CAST(sum(CASE WHEN pred <> -1 THEN 1 ELSE 0 END)
                           AS DOUBLE), 6) END AS noise_frac
          FROM j""")
  )

  val all: Seq[GQuery] = Seq(q162, q163, q164, q165)
}
