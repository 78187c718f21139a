package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 wave 41: q219 — cascade filter-ordering planner. A quality
  * funnel (q70) evaluates its rules in SOME order and stops at the
  * first rejection; at 100 TB the order is a real cost lever — the
  * classic predicate-ordering result says evaluate the
  * cheapest-per-rejection rule first, and a rule battery whose biting
  * rule runs LAST pays every preceding rule on every doomed document.
  * This sheet prices exactly that on q200's four Gopher-style rules
  * (same kernels, same integer thresholds — one rule definition, two
  * sheets): the DECLARED order (symbol → wordlen → numeric → short, the
  * order q200 lists them) vs the GREEDY order (marginal rejection rate
  * descending, ties by rule name), each priced EXACTLY from the joint
  * 2⁴-cell rule-bit distribution — rows entering each stage, rows
  * rejected there, and the per-policy total rule evaluations (the cost
  * a unit-cost cascade actually pays).
  *
  * Exactness: stage costs come from the measured JOINT distribution
  * (a ≤16-row contingency aggregate), not an independence assumption —
  * two rules with equal marginal rates but nested failure sets price
  * differently, and this sheet shows it. The greedy ORDER itself is
  * derived relationally (window over the 4-row marginal-rate
  * relation), so both engines must agree on it or the hash gate trips.
  *
  * Scale notes (100 TB): ONE map-only pass over the corpus computes
  * the four rule bits per document (the q200 kernel — array folds, no
  * explode) into a ≤16-group aggregate with map-side combine;
  * everything downstream — the unpivot, the marginal rates, the two
  * orderings, the prefix-pass arithmetic — is constant-sized (≤ 64
  * rows). The planner costs one scan regardless of corpus size, which
  * is what makes re-planning the cascade per source or per snapshot
  * affordable. */
object Wave41Queries {

  import Wave27Queries.{SymPerTokTenths, MeanWlMilliLo, MeanWlMilliHi,
    MaxWl, NumPerTokTenths, MinTok}

  private val q219 = GQuery(
    "q219_filter_ordering",
    (s, d) => {
      import s.implicits._
      val nTok = size(graft.functions.TextOps.tokens(col("text")))
        .cast("bigint")
      val nSym = (length(col("text"))
        - length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
        .cast("bigint")
      val sumWl = expr(
        "aggregate(split(text, ' '), 0L, (a, w) -> a + length(w))")
      val maxWl = expr(
        "aggregate(split(text, ' '), 0L, (a, w) -> greatest(a, length(w)))")
      val nNum = expr(
        "aggregate(split(text, ' '), 0L, (a, w) -> " +
          // \\A..\\z (absolute anchors), not ^..$: Spark's rlike uses Java
          // find semantics where $ also matches before a trailing line
          // terminator, but DuckDB's regexp_full_match does not — a token
          // like "123\n" must count as numeric in NEITHER engine (ADVICE
          // r13). Doubled backslashes survive the SQL string literal.
          "a + CASE WHEN w rlike '\\\\A[0-9]+\\\\z' THEN 1 ELSE 0 END)")
      val bits = Io.fanOut(Tables.documents(s, d).select(col("text")))
        .select(nTok.as("nt"), nSym.as("ns"), sumWl.as("swl"),
          maxWl.as("mwl"), nNum.as("nn"))
        .select(
          (col("ns") * 10 > col("nt") * SymPerTokTenths)
            .cast("long").as("r_sym"),
          (col("swl") * 1000 < col("nt") * MeanWlMilliLo
            || col("swl") * 1000 > col("nt") * MeanWlMilliHi
            || col("mwl") > MaxWl).cast("long").as("r_wl"),
          (col("nn") * 10 > col("nt") * NumPerTokTenths)
            .cast("long").as("r_num"),
          (col("nt") < MinTok).cast("long").as("r_short"))
      val cells = Io.materialize(
        bits.groupBy(col("r_sym"), col("r_wl"), col("r_num"), col("r_short"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("ckey", col("r_sym") * 8 + col("r_wl") * 4
            + col("r_num") * 2 + col("r_short")))
      val cellr = cells.select(col("ckey"), explode(array(
        struct(lit("symbol").as("rule"), col("r_sym").as("fail")),
        struct(lit("wordlen").as("rule"), col("r_wl").as("fail")),
        struct(lit("numeric").as("rule"), col("r_num").as("fail")),
        struct(lit("short").as("rule"), col("r_short").as("fail"))))
        .as("e"))
        .select(col("ckey"), col("e.rule").as("rule"),
          col("e.fail").as("fail"))
      val rates = cellr.join(cells.select(col("ckey"), col("cnt")),
          Seq("ckey"))
        .groupBy(col("rule"))
        .agg(sum(col("fail") * col("cnt")).as("fails"))
      val wG = Window.orderBy(col("fails").desc, col("rule"))
      val greedy = rates.select(lit("greedy").as("policy"),
        row_number().over(wG).as("pos"), col("rule"))
      val declared = Seq(("declared", 1, "symbol"), ("declared", 2, "wordlen"),
        ("declared", 3, "numeric"), ("declared", 4, "short"))
        .toDF("policy", "pos", "rule")
      val ord = declared.unionByName(greedy)
      // prefix failure per (policy, pos, cell): does any EARLIER rule in
      // this policy reject this cell? pos 1 has an empty prefix
      val o2 = ord.select(col("policy"), col("pos").as("pos2"),
        col("rule").as("rule2"))
      val cr2 = cellr.select(col("ckey"), col("rule").as("rule2"),
        col("fail").as("fail2"))
      val prefFail = ord.join(o2, Seq("policy"))
        .filter(col("pos2") < col("pos"))
        .join(cr2, Seq("rule2"))
        .groupBy(col("policy"), col("pos"), col("ckey"))
        .agg(max(col("fail2")).as("anyf"))
      val stage = ord.crossJoin(cells.select(col("ckey"), col("cnt")))
        .join(prefFail, Seq("policy", "pos", "ckey"), "left")
        .withColumn("anyf", coalesce(col("anyf"), lit(0L)))
        .join(cellr, Seq("ckey", "rule"))
        .groupBy(col("policy"), col("pos"), col("rule"))
        .agg(
          sum(when(col("anyf") === 0, col("cnt")).otherwise(0L))
            .as("rows_in"),
          sum(when(col("anyf") === 0 && col("fail") === 1, col("cnt"))
            .otherwise(0L)).as("rejected"))
      val totals = stage.groupBy(col("policy"))
        .agg(sum(col("rows_in")).as("rows_in"),
          sum(col("rejected")).as("rejected"))
        .select(col("policy"), lit(0).as("pos"), lit("TOTAL").as("rule"),
          col("rows_in"), col("rejected"))
      stage.select(col("policy"), col("pos"), col("rule"),
          col("rows_in"), col("rejected"))
        .unionByName(totals)
        .orderBy(col("policy"), col("pos"))
    },
    Some(s"""WITH f AS (SELECT
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                   CAST(length(text)
                     - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                     AS BIGINT) AS ns,
                   CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> length(w))) AS BIGINT) AS swl,
                   CAST(list_max(list_transform(string_split(text, ' '),
                     w -> length(w))) AS BIGINT) AS mwl,
                   CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> CASE WHEN regexp_full_match(w, '[0-9]+')
                               THEN 1 ELSE 0 END)) AS BIGINT) AS nn
                 FROM documents),
          rbits AS (SELECT
                   CASE WHEN ns * 10 > nt * $SymPerTokTenths
                        THEN 1 ELSE 0 END AS r_sym,
                   CASE WHEN swl * 1000 < nt * $MeanWlMilliLo
                          OR swl * 1000 > nt * $MeanWlMilliHi
                          OR mwl > $MaxWl THEN 1 ELSE 0 END AS r_wl,
                   CASE WHEN nn * 10 > nt * $NumPerTokTenths
                        THEN 1 ELSE 0 END AS r_num,
                   CASE WHEN nt < $MinTok THEN 1 ELSE 0 END AS r_short
                FROM f),
          cells AS MATERIALIZED (SELECT r_sym, r_wl, r_num, r_short,
                   count(*) AS cnt,
                   r_sym * 8 + r_wl * 4 + r_num * 2 + r_short AS ckey
                 FROM rbits GROUP BY 1, 2, 3, 4),
          cellr AS (SELECT ckey, 'symbol' AS rule, r_sym AS fail FROM cells
                    UNION ALL SELECT ckey, 'wordlen', r_wl FROM cells
                    UNION ALL SELECT ckey, 'numeric', r_num FROM cells
                    UNION ALL SELECT ckey, 'short', r_short FROM cells),
          rates AS (SELECT cr.rule, CAST(sum(cr.fail * c.cnt) AS BIGINT)
                      AS fails
                    FROM cellr cr JOIN cells c USING (ckey) GROUP BY 1),
          ord AS (SELECT 'declared' AS policy, pos, rule FROM (VALUES
                    (1, 'symbol'), (2, 'wordlen'), (3, 'numeric'),
                    (4, 'short')) v(pos, rule)
                  UNION ALL
                  SELECT 'greedy',
                         CAST(row_number() OVER (ORDER BY fails DESC, rule)
                           AS INT), rule
                  FROM rates),
          pf AS (SELECT o.policy, o.pos, cr.ckey, max(cr.fail) AS anyf
                 FROM ord o JOIN ord o2
                   ON o2.policy = o.policy AND o2.pos < o.pos
                 JOIN cellr cr ON cr.rule = o2.rule
                 GROUP BY 1, 2, 3),
          stage AS (SELECT o.policy, o.pos, o.rule,
                   CAST(sum(CASE WHEN coalesce(pf.anyf, 0) = 0
                     THEN c.cnt ELSE 0 END) AS BIGINT) AS rows_in,
                   CAST(sum(CASE WHEN coalesce(pf.anyf, 0) = 0
                     AND cr.fail = 1 THEN c.cnt ELSE 0 END) AS BIGINT)
                     AS rejected
                 FROM ord o
                 CROSS JOIN cells c
                 LEFT JOIN pf ON pf.policy = o.policy AND pf.pos = o.pos
                   AND pf.ckey = c.ckey
                 JOIN cellr cr ON cr.rule = o.rule AND cr.ckey = c.ckey
                 GROUP BY 1, 2, 3)
          SELECT policy, pos, rule, rows_in, rejected FROM stage
          UNION ALL
          SELECT policy, 0, 'TOTAL', CAST(sum(rows_in) AS BIGINT),
                 CAST(sum(rejected) AS BIGINT)
          FROM stage GROUP BY policy
          ORDER BY policy, pos""")
  )

  val all: Seq[GQuery] = Seq(q219)
}
