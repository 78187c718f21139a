package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 44: q222 — unbiased pass@k estimation sheet.
  *
  * The experiment/readout family (q143 A/B, q157/q165 labels, q166
  * ROC-AUC, q172 PR thresholds) lacks the estimator every code/eval
  * pipeline publishes: pass@k from n sampled attempts with c successes
  * per task, via the unbiased combinatorial estimator (Chen et al.
  * 2021, "Evaluating Large Language Models Trained on Code" §2.1):
  * pass@k = 1 − C(n−c, k)/C(n, k). Computed EXACTLY in integer ppm —
  * the binomial ratio unrolls to Π_{i<k} (n−c−i)/(n−i), emitted as the
  * same k literal factors in both engines (n ≤ 16, k ≤ 8, so the
  * scaled numerator 10^6·Π(n−c−i) ≤ 10^6·16!/8! < 2^60 never
  * overflows), with one trailing truncating division. greatest(·, 0)
  * zeroes the product exactly when n − c < k, the case where every
  * k-subset contains a success.
  *
  * Tasks are users; attempts are each user's FIRST 16 events by
  * event_id (a deterministic, bounded attempt budget — an estimator
  * over unbounded n would overflow and mismeasure: real eval harnesses
  * fix n per task for exactly this reason); success = a 'purchase'
  * event. Sheet per k ∈ {1,2,4,8}: eligible task count (n ≥ k), the
  * mean pass@k in ppm, and the degenerate tails (tasks at exactly
  * 10^6 — success guaranteed — and at 0 — no successes at all).
  *
  * Scale notes (100 TB): the per-task attempt slice is a rank ≤ 16
  * filter under a (user)-keyed window — WindowGroupLimit keeps 16 rows
  * per task map-side, so the n·attempts relation never exceeds
  * 16·|tasks| anywhere; per-task (n, c) is one aggregate; the four
  * per-k branches are scalar arithmetic over the task relation into
  * single-row aggregates (map-side combine), unioned. Nothing
  * corpus-sized shuffles twice; |tasks| is the only scale axis. */
object Wave44Queries {

  private val MaxN = 16
  private val Ks = Seq(1, 2, 4, 8)

  private val q222 = GQuery(
    "q222_passk",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val tasks = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= MaxN)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c"))
      val perK = Ks.map { k =>
        val num = (0 until k).map(i => s"greatest(n - c - $i, 0)")
          .mkString(" * ")
        val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
        tasks.filter(col("n") >= k)
          .select(expr(s"1000000 - (1000000 * ($num)) div ($den)")
            .as("pass_ppm"))
          .agg(count(lit(1)).as("n_tasks"),
            expr("sum(pass_ppm) div count(1)").as("mean_pass_ppm"),
            sum(when(col("pass_ppm") === 1000000L, 1L).otherwise(0L))
              .as("all_pass"),
            sum(when(col("pass_ppm") === 0L, 1L).otherwise(0L))
              .as("none_pass"))
          .select(lit(k.toLong).as("k"), col("n_tasks"),
            col("mean_pass_ppm"), col("all_pass"), col("none_pass"))
      }
      perK.reduce(_ unionAll _).orderBy(col("k"))
    },
    Some {
      def perK(k: Int): String = {
        val num = (0 until k).map(i => s"greatest(n - c - $i, 0)")
          .mkString(" * ")
        val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
        s"""SELECT ${k}::BIGINT AS k,
               count(*) AS n_tasks,
               CAST(sum(1000000 - (1000000 * ($num)) // ($den))
                 // count(*) AS BIGINT) AS mean_pass_ppm,
               CAST(sum(CASE WHEN 1000000 - (1000000 * ($num)) // ($den)
                 = 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS all_pass,
               CAST(sum(CASE WHEN 1000000 - (1000000 * ($num)) // ($den)
                 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS none_pass
            FROM tasks WHERE n >= $k"""
      }
      s"""WITH att AS (SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY event_id) AS rn
               FROM events),
          tasks AS MATERIALIZED (SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS c
               FROM att WHERE rn <= $MaxN GROUP BY user_id)
          ${Ks.map(perK).mkString(" UNION ALL ")}
          ORDER BY k"""
    }
  )

  val all: Seq[GQuery] = Seq(q222)
}
