package graft.operators

import graft.GQuery
import graft.sources.{Io, Tables}
import graft.util.Geometry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 wave 35: q213 — coarse-centroid Lloyd refinement sheet.
  *
  * The IVFADC family seeds its coarse quantizer with the first Bc
  * vectors by id (the q37 convention — Wave29Queries.buildIndex), and
  * q211 MEASURES the occupancy skew that seeding produces. This query
  * answers the follow-up question a production index build actually
  * asks: how much does ONE exact-integer Lloyd round on the coarse
  * centroids buy — in quantization error (the term recall rides on:
  * a vector far from its centroid carries a large residual the PQ
  * codes must absorb) and in cell balance (the term probe latency
  * rides on: max-occupancy is the worst-case per-probe scan). The
  * sheet prices the retrain dial the same way q146 prices bands and
  * q203 prices nprobe: before/after, both terms, exact integers.
  *
  * Semantics: round 0 = first-Bc seeding and its assignment (ties to
  * the lowest cid, the family's convention); round 1 = per-cell
  * elementwise integer-mean centroids (`div`, truncating like
  * DuckDB's `//` — the q102 Lloyd recipe) over round-0 members, with
  * the q102 drop-out rule (a cell with no members leaves the
  * codebook), then re-assignment. err_drop_ppm = (err0 − err1)·10^6
  * DIV err0 is the sheet's headline: the fraction of total squared
  * quantization error one retrain round removes.
  *
  * Scale notes (100 TB): both assignment passes are the
  * [[Wave29Queries.assignResiduals]] shape — a broadcast join against
  * the centroid relation carrying 24-byte (vec_id, cid, dist) rows
  * through the n·Bc expansion, reduced by a min_by aggregate; the
  * centroid update is one posexplode → (cid, pos)-keyed integer-mean
  * aggregate whose partial state is Bc·Dim-bounded per task (the
  * trainBooksOn update shape), reassembled into Bc arrays by a
  * Bc·Dim-row aggregate. Everything after is cell-count-sized. The
  * milli-vector projection materializes once and feeds all three
  * passes. Nothing corpus-sized crosses a single task and the corpus
  * never shuffles.
  */
object Wave35Queries {

  import Wave24Queries.Dim
  import Wave29Queries.{IvfCap, IvfFloor, l2}

  /** Nearest-centroid assignment retaining the winning distance:
    * (vec_id, cid, dist) — exact integer squared L2, ties to the
    * lowest cid (min_by keyed (dist, cid), the assignResiduals rule). */
  private def assignDist(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), l2(col("qv"), col("cvec")).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"),
        min(col("dist")).as("dist"))

  private def occStats(a: DataFrame, maxCol: String, neCol: String): DataFrame =
    a.groupBy(col("cid")).agg(count(lit(1)).as("nv"))
      .agg(max(col("nv")).as(maxCol), count(lit(1)).as(neCol))

  private val q213 = GQuery(
    "q213_ivf_retrain",
    (s, d) => {
      graft.functions.VecDist.register(s)
      val n = Tables.embeddings(s, d).count()
      if (n == 0)
        Wave24Queries.qvecs(s, d).select(
          col("vec_id").as("n_vecs"), col("vec_id").as("n_cells"),
          col("vec_id").as("err0"), col("vec_id").as("err1"),
          col("vec_id").as("err_drop_ppm"), col("vec_id").as("empty0"),
          col("vec_id").as("empty1"), col("vec_id").as("max_occ0"),
          col("vec_id").as("max_occ1")).limit(0)
      else {
        val bc = Geometry.adaptiveCodebook(n, IvfFloor, IvfCap)
        val vecs = Io.materialize(Wave24Queries.qvecs(s, d))
        val cents0 = vecs.filter(col("vec_id") < bc)
          .select(col("vec_id").as("cid"), col("qv").as("cvec"))
        val nCells = cents0.count()
        val a0 = Io.materialize(assignDist(vecs, cents0))
        // one Lloyd update: per-cell elementwise integer mean (q102
        // recipe); cells emptied by round 0 drop out (q102 rule)
        val cents1 = a0.select(col("vec_id"), col("cid"))
          .join(vecs, Seq("vec_id"))
          .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy(col("cid"), col("pos"))
          .agg(expr("sum(v) div count(1)").as("v"))
          .groupBy(col("cid"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("v")))),
            x => x.getField("v")).as("cvec"))
        val a1 = assignDist(vecs, cents1)
        val e0 = a0.agg(sum(col("dist")).as("err0"))
        val e1 = a1.agg(sum(col("dist")).as("err1"))
        val o0 = occStats(a0, "max_occ0", "ne0")
        val o1 = occStats(a1, "max_occ1", "ne1")
        e0.crossJoin(broadcast(e1))
          .crossJoin(broadcast(o0)).crossJoin(broadcast(o1))
          .select(
            lit(n).as("n_vecs"), lit(nCells).as("n_cells"),
            col("err0"), col("err1"),
            // drop·10^6 DIV err0 in split form (q·10^3 then remainder
            // ·10^3) so no product exceeds err0·10^3 — err0·10^6 would
            // overflow BIGINT past ~9·10^12 total squared error, which
            // sf1 already reaches; the clamp floors a (theoretically
            // possible under integer-mean truncation) negative drop at
            // 0 so both engines only ever divide non-negatives
            when(col("err0") > 0, expr(
              "(greatest(err0 - err1, 0L) * 1000 div err0) * 1000" +
                " + ((greatest(err0 - err1, 0L) * 1000 % err0) * 1000)" +
                " div err0"))
              .otherwise(lit(0L)).as("err_drop_ppm"),
            (lit(nCells) - col("ne0")).as("empty0"),
            (col("ne0") - col("ne1")).as("empty1"),
            col("max_occ0"), col("max_occ1"))
      }
    },
    Some {
      def l2s(a: String, b: String): String =
        s"""list_sum(list_transform(range(1, ${Dim + 1}),
            i -> ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])
               * ($a[CAST(i AS INT)] - $b[CAST(i AS INT)])))"""
      def asg(name: String, cRel: String): String =
        s"""$name AS MATERIALIZED (SELECT vec_id, cid, dist FROM (
              SELECT vec_id, cid, dist,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, cid) AS rn
              FROM (SELECT em.vec_id, c.cid,
                           ${l2s("em.qv", "c.cvec")} AS dist
                    FROM em, $cRel c)) WHERE rn = 1)"""
      s"""WITH em AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
              FROM embeddings),
          bsz AS (SELECT ${Geometry.adaptiveCodebookSql("count(*)",
            IvfFloor, IvfCap)} AS b FROM embeddings),
          cents AS (SELECT vec_id AS cid, qv AS cvec FROM em, bsz
                    WHERE vec_id < bsz.b),
          ${asg("a0", "cents")},
          c1 AS MATERIALIZED (SELECT cid, list(v ORDER BY i) AS cvec FROM (
                SELECT a.cid, t.i,
                       CAST(sum(em.qv[CAST(t.i AS INT)]) AS BIGINT)
                         // count(*) AS v
                FROM a0 a JOIN em USING (vec_id), range(1, ${Dim + 1}) t(i)
                GROUP BY a.cid, t.i) GROUP BY cid),
          ${asg("a1", "c1")},
          s0 AS (SELECT CAST(sum(dist) AS BIGINT) AS err0 FROM a0),
          s1 AS (SELECT CAST(sum(dist) AS BIGINT) AS err1 FROM a1),
          o0 AS (SELECT CAST(max(nv) AS BIGINT) AS max_occ0,
                        count(*) AS ne0
                 FROM (SELECT cid, count(*) AS nv FROM a0 GROUP BY cid)),
          o1 AS (SELECT CAST(max(nv) AS BIGINT) AS max_occ1,
                        count(*) AS ne1
                 FROM (SELECT cid, count(*) AS nv FROM a1 GROUP BY cid))
          SELECT (SELECT count(*) FROM em) AS n_vecs,
                 (SELECT count(*) FROM cents) AS n_cells,
                 s0.err0, s1.err1,
                 CASE WHEN s0.err0 > 0
                      THEN (GREATEST(s0.err0 - s1.err1, 0) * 1000
                              // s0.err0) * 1000
                           + ((GREATEST(s0.err0 - s1.err1, 0) * 1000
                               % s0.err0) * 1000) // s0.err0
                      ELSE 0 END AS err_drop_ppm,
                 (SELECT count(*) FROM cents) - o0.ne0 AS empty0,
                 o0.ne0 - o1.ne1 AS empty1,
                 o0.max_occ0, o1.max_occ1
          FROM s0, s1, o0, o1
          WHERE EXISTS (SELECT 1 FROM embeddings)"""
    }
  )

  val all: Seq[GQuery] = Seq(q213)
}
