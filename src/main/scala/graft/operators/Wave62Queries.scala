package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._

/** Round-15 wave 62: q240 — the end-to-end curation pipeline sheet.
  *
  * Every stage in this DAG already exists as its own audited operator —
  * q70 prices the quality rules, q58 the content-hash split, q68 the
  * benchmark decontamination — but a production pipeline runs them as
  * ONE JOB, and what its owner signs off on is the composite funnel:
  * how many documents and tokens survive each stage, per split. This
  * query is that artifact: ingest → quality filter (the q70 pass rule:
  * 20 ≤ tokens ≤ 90, diversity ≥ 0.35, trigram repetition ≤ 0.01) →
  * decontamination (train docs sharing ≥1 distinct 5-shingle with the
  * test split are dropped; val/test pass through — the q68 rule), with
  * (stage, split, n_docs, sum_tokens) per cell. It also certifies the
  * COMPOSITION: the single-DAG counts must equal what the standalone
  * operators imply, which the oracle recomputes from scratch.
  *
  * Scale notes (100 TB): the corpus is tokenized ONCE into a
  * materialized (doc_id, split, toks, nt, pass) relation (five
  * consumers — three stage aggregates and two shingle probes — would
  * each re-run the tokenize otherwise; the blocks are transient and
  * released after the query). The test-side shingle set is
  * benchmark-sized and broadcast (the q68 geometry), so the train-side
  * probe is a map-side semi-join over 8-byte hashes; the contaminated
  * id set is smaller still and broadcast into the anti-join. Every
  * sheet aggregate is a ≤3-group map-side combine. Nothing
  * corpus-sized shuffles at any stage — the whole funnel is one scan,
  * one tokenize, and bounded exchanges.
  *
  * Reference: generalizes max_aggregation.cpp's map/combine shape
  * (/root/reference/max_aggregation.cpp:40) to a multi-stage audit.
  */
object Wave62Queries {

  private val ShingleN = 5

  private val q240 = GQuery(
    "q240_curation_e2e",
    (s, d) => {
      graft.functions.ShingleStrings.register(s, 3)
      val raw = Io.fanOut(Tables.documents(s, d)
        .select(col("doc_id"), col("text")))
      val base = raw.select(col("doc_id"),
          TextOps.contentSplitHash(col("text")).as("h"),
          TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          when(col("h") < 80, "train").when(col("h") < 90, "val")
            .otherwise("test").as("split"),
          col("toks"), CurationQueries.trigrams(col("toks")).as("tri"))
        .select(col("doc_id"), col("split"), col("toks"),
          size(col("toks")).cast("bigint").as("nt"),
          (size(array_distinct(col("toks"))).cast("double")
            / size(col("toks"))).as("div"),
          when(size(col("tri")) > 0,
            lit(1.0) - size(array_distinct(col("tri"))).cast("double")
              / size(col("tri")))
            .otherwise(lit(0.0)).as("rep"))
        .withColumn("pass",
          col("nt") >= 20 && col("nt") <= 90 &&
            col("div") >= 0.35 && col("rep") <= 0.01)
      val f = Io.materialize(
        base.select(col("doc_id"), col("split"), col("toks"), col("nt"),
          col("pass")))
      // r17: fused distinct-shingle-hash kernel (see CorpusOps
      // .shingleHashes); downstream distinct()/join semantics unchanged
      graft.functions.ShingleHash60Distinct.register(s, ShingleN)
      val testSet = f.filter(col("split") === "test")
        .select(explode(graft.functions.ShingleHash60Distinct(
          col("toks"), ShingleN)).as("sgh"))
        .distinct()
      val contam = f.filter(col("split") === "train" && col("pass"))
        .select(col("doc_id"),
          explode(graft.functions.ShingleHash60Distinct(
            col("toks"), ShingleN)).as("sgh"))
        .join(broadcast(testSet), "sgh")
        .select(col("doc_id"))
        .distinct()
      val clean = f.filter(col("pass"))
        .join(broadcast(contam.withColumnRenamed("doc_id", "cid")),
          col("doc_id") === col("cid") && col("split") === "train",
          "left_anti")
      def sheet(stage: String, rel: org.apache.spark.sql.DataFrame) =
        rel.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
          .select(lit(stage).as("stage"), col("split"), col("n_docs"),
            col("sum_tokens"))
      sheet("a_ingest", f)
        .unionAll(sheet("b_quality", f.filter(col("pass"))))
        .unionAll(sheet("c_decontam", clean))
        .orderBy(col("stage"), col("split"))
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
                      % 100 AS h
                  FROM documents),
          g AS (SELECT doc_id,
                    CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                         ELSE 'test' END AS split,
                    toks, CAST(len(toks) AS BIGINT) AS nt,
                    len(list_distinct(toks)) * 1.0 / len(toks) AS div,
                    CASE WHEN len(toks) >= 3
                         THEN 1.0 - len(list_distinct(list_transform(
                                range(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1] || ' '
                                  || toks[i+2]))) * 1.0 / (len(toks) - 2)
                         ELSE 0.0 END AS rep
                  FROM d),
          f AS (SELECT doc_id, split, toks, nt,
                    (nt >= 20 AND nt <= 90 AND div >= 0.35 AND rep <= 0.01)
                      AS pass
                  FROM g),
          tsh AS (SELECT DISTINCT CAST(concat('0x', substr(md5(sg), 1, 15))
                      AS BIGINT) AS sgh
                  FROM (SELECT unnest(list_distinct(list_transform(
                            range(1, len(toks) - ${ShingleN - 2}),
                            i -> array_to_string(
                              toks[i : i + ${ShingleN - 1}], ' ')))) AS sg
                        FROM f
                        WHERE split = 'test' AND len(toks) >= $ShingleN)),
          csh AS (SELECT doc_id, CAST(concat('0x', substr(md5(sg), 1, 15))
                      AS BIGINT) AS sgh
                  FROM (SELECT doc_id,
                            unnest(list_distinct(list_transform(
                              range(1, len(toks) - ${ShingleN - 2}),
                              i -> array_to_string(
                                toks[i : i + ${ShingleN - 1}], ' ')))) AS sg
                        FROM f
                        WHERE split = 'train' AND pass
                          AND len(toks) >= $ShingleN)),
          contam AS (SELECT DISTINCT c.doc_id
                     FROM csh c JOIN tsh t USING (sgh))
          SELECT 'a_ingest' AS stage, split, count(*) AS n_docs,
                 CAST(sum(nt) AS BIGINT) AS sum_tokens
          FROM f GROUP BY 2
          UNION ALL
          SELECT 'b_quality', split, count(*), CAST(sum(nt) AS BIGINT)
          FROM f WHERE pass GROUP BY 2
          UNION ALL
          SELECT 'c_decontam', split, count(*), CAST(sum(nt) AS BIGINT)
          FROM f
          WHERE pass AND NOT (split = 'train'
            AND doc_id IN (SELECT doc_id FROM contam))
          GROUP BY 2
          ORDER BY stage, split""")
  )

  val all: Seq[GQuery] = Seq(q240)
}
