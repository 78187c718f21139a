package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-14 wave 46: q224 — consistent-hash ring vs rendezvous (HRW)
  * rebalance audit.
  *
  * q150 prices HRW resharding against naive modulo; the OTHER standard
  * production placement — the consistent-hash ring with virtual nodes
  * (Karger et al. 1997; the memcached/Dynamo layout) — has different
  * economics: movement on growth is still ~optimal, but load balance
  * depends on the vnode count, and THAT tradeoff (vnodes cost routing-
  * table size, few vnodes cost balance) is what a cache/shard planner
  * needs measured. This sheet assigns every order key under both
  * policies for the same 8 → 12 shard growth (q150's constants) and
  * reports, per policy: keys moved (count + ppm, vs the optimal 4/12)
  * and the hottest-shard load factor (ppm of perfect balance) on the
  * new layout.
  *
  * Determinism: ring points are md5-52 hashes of "ring:shard:vnode"
  * PACKED with (shard·16 + vnode) into the low 8 bits, so every point
  * value is UNIQUE by construction and first-point-clockwise needs no
  * tie rule; key positions pack ·256 into the same space. Both engines
  * rebuild the identical integer ring.
  *
  * Scale notes (100 TB): the ring is a 192-point literal (the q90
  * bloom-bits pattern — constant model state, never a relation scan);
  * per-key owner lookup is one ordered-array scan fused into the map
  * pass (a production router uses binary search — same output, and the
  * array form stays whole-stage-codegen'd at 192 points); HRW is the
  * fused HrwPack kernel (q150). ONE pass over keys into two
  * shard-count-sized aggregates (map-side combine), unioned. */
object Wave46Queries {

  private val ShardsOld = 8
  private val ShardsNew = 12
  private val Vnodes = 16

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Packed unique ring position of (shard, vnode). */
  private def point(sh: Int, v: Int): Long =
    java.lang.Long.parseLong(md5Hex(s"ring:$sh:$v").substring(0, 13), 16) *
      256L + sh * Vnodes + v

  /** Sorted (pos, shard) ring for the first `n` shards. */
  private def ring(n: Int): Seq[(Long, Int)] =
    (for (sh <- 0 until n; v <- 0 until Vnodes) yield (point(sh, v), sh))
      .sortBy(_._1)

  private def ownerCol(pts: Seq[(Long, Int)],
      h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val arr = typedLit(pts.map { case (ph, sh) => (ph, sh.toLong) })
    val hit = filter(arr, x => x.getField("_1") >= h)
    coalesce(get(hit, lit(0)).getField("_2"),
      lit(pts.head._2.toLong))
  }

  private val q224 = GQuery(
    "q224_ring_rebalance",
    (s, d) => {
      graft.functions.HrwPack.register(s, ShardsOld, ShardsNew)
      val hKey = conv(substring(md5(concat(col("k").cast("string"),
        lit(":ring"))), 1, 13), 16, 10).cast("long") * 256L
      // fanOut (r16): the per-key hash grid is 13 md5s/row fused into
      // HrwPack + two ring lookups — CPU-heavy map work that a
      // single-file orders scan would otherwise run on ONE task (the
      // q118 lesson; at cluster scale the many-file scan makes this the
      // identity)
      val assigned = graft.sources.Io.fanOut(Tables.orders(s, d)
          .select(col("o_orderkey").as("k")))
        .withColumn("h", hKey)
        .withColumn("ring_old", ownerCol(ring(ShardsOld), col("h")))
        .withColumn("ring_new", ownerCol(ring(ShardsNew), col("h")))
        .withColumn("packed", graft.functions.HrwPack(col("k")))
        .select(col("k"),
          col("ring_new"), (col("ring_old") =!= col("ring_new"))
            .cast("long").as("ring_moved"),
          expr("packed DIV 100").as("hrw_old"),
          expr("packed % 100").as("hrw_new"))
        .withColumn("hrw_moved",
          (col("hrw_old") =!= col("hrw_new")).cast("long"))
      def sheet(policy: String, shard: String, moved: String) =
        assigned.groupBy(col(shard)).agg(count(lit(1)).as("n"),
            sum(col(moved)).as("mv"))
          .agg(sum(col("n")).as("n_keys"), sum(col("mv")).as("moved"),
            max(col("n")).as("max_load"))
          .select(lit(policy).as("policy"), col("n_keys"), col("moved"),
            expr("(moved * 1000000) div n_keys").as("moved_ppm"),
            col("max_load"),
            expr(s"(max_load * $ShardsNew * 1000000) div n_keys")
              .as("max_load_ppm"))
      sheet("hrw", "hrw_new", "hrw_moved")
        .unionAll(sheet("ring", "ring_new", "ring_moved"))
        .orderBy(col("policy"))
    },
    Some {
      def ptsSql(n: Int, name: String): String =
        s"""$name AS (SELECT CAST(concat('0x', substr(md5(concat('ring:',
               CAST(s.s AS VARCHAR), ':', CAST(v.v AS VARCHAR))), 1, 13))
               AS BIGINT) * 256 + s.s * $Vnodes + v.v AS ph, s.s AS sh
             FROM range(0, $n) s(s), range(0, $Vnodes) v(v))"""
      s"""WITH keys AS (SELECT o_orderkey AS k,
                 CAST(concat('0x', substr(md5(concat(
                   CAST(o_orderkey AS VARCHAR), ':ring')), 1, 13))
                   AS BIGINT) * 256 AS h
               FROM orders),
          ${ptsSql(ShardsOld, "po")}, ${ptsSql(ShardsNew, "pn")},
          hrw AS (SELECT k,
                    [CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)
                       || ':' || CAST(s AS VARCHAR)), 1, 15)) AS BIGINT)
                     FOR s IN range(0, $ShardsNew)] AS hs
                  FROM keys),
          hrwo AS (SELECT k,
                     CAST(list_position(hs[1:$ShardsOld],
                       list_max(hs[1:$ShardsOld])) - 1 AS BIGINT) AS hrw_old,
                     CAST(list_position(hs, list_max(hs)) - 1 AS BIGINT)
                       AS hrw_new
                   FROM hrw),
          ro AS (SELECT keys.k,
                   coalesce(
                     arg_min(CASE WHEN po.ph >= keys.h THEN po.sh END,
                       CASE WHEN po.ph >= keys.h THEN po.ph END),
                     arg_min(po.sh, po.ph)) AS ring_old
                 FROM keys, po GROUP BY keys.k),
          rn AS (SELECT keys.k,
                   coalesce(
                     arg_min(CASE WHEN pn.ph >= keys.h THEN pn.sh END,
                       CASE WHEN pn.ph >= keys.h THEN pn.ph END),
                     arg_min(pn.sh, pn.ph)) AS ring_new
                 FROM keys, pn GROUP BY keys.k),
          a AS (SELECT hrwo.k, hrwo.hrw_old, hrwo.hrw_new,
                  ro.ring_old, rn.ring_new
                FROM hrwo JOIN ro ON hrwo.k = ro.k
                JOIN rn ON hrwo.k = rn.k),
          hs AS (SELECT hrw_new AS sh, count(*) AS n,
                   sum(CASE WHEN hrw_old <> hrw_new THEN 1 ELSE 0 END) AS mv
                 FROM a GROUP BY 1),
          rs AS (SELECT ring_new AS sh, count(*) AS n,
                   sum(CASE WHEN ring_old <> ring_new THEN 1 ELSE 0 END) AS mv
                 FROM a GROUP BY 1)
          SELECT 'hrw' AS policy, CAST(sum(n) AS BIGINT) AS n_keys,
                 CAST(sum(mv) AS BIGINT) AS moved,
                 CAST(sum(mv) * 1000000 // sum(n) AS BIGINT) AS moved_ppm,
                 CAST(max(n) AS BIGINT) AS max_load,
                 CAST(max(n) * $ShardsNew * 1000000 // sum(n) AS BIGINT)
                   AS max_load_ppm
          FROM hs
          UNION ALL
          SELECT 'ring', CAST(sum(n) AS BIGINT),
                 CAST(sum(mv) AS BIGINT),
                 CAST(sum(mv) * 1000000 // sum(n) AS BIGINT),
                 CAST(max(n) AS BIGINT),
                 CAST(max(n) * $ShardsNew * 1000000 // sum(n) AS BIGINT)
          FROM rs
          ORDER BY policy"""
    }
  )

  val all: Seq[GQuery] = Seq(q224)
}
