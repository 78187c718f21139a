package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Connected components (q60's kernel). The chain fixture is the
  * regression for the round-2 weak spot: plain min-label propagation
  * moves the min one hop per round, so a 200-edge chain needs 200
  * rounds and died at the old 50-round bound; pointer doubling
  * converges in O(log diameter) and must finish well inside
  * maxRounds=64. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCensus: golden topologies (K5, cycle, chain, disoriented input)") {
    // complete graph K5: C(5,3)=10 triangles, every vertex in C(4,2)=6
    val k5 = (for { a <- 0 until 5; b <- 0 until 5 if a < b }
      yield (a.toLong, b.toLong)).toDF("s", "t")
    val gotK5 = Graph.triangleCensus(k5, "s", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(gotK5.toSeq == (0L until 5L).map(_ -> 6L))
    assert(gotK5.map(_._2).sum == 30) // 10 triangles x 3 vertices
    // a 6-cycle has no triangles
    val c6 = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong)).toDF("s", "t")
    assert(Graph.triangleCensus(c6, "s", "t").collect().isEmpty)
    // orientation + duplicates + self-loops are normalized away: the same
    // triangle given as (b,a) edges with repeats and a self-loop counts once
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L), (3L, 1L))
      .toDF("s", "t")
    val gotMessy = Graph.triangleCensus(messy, "s", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(gotMessy.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCensus: hot-vertex star stays correct under degree orientation") {
    // hub 0 joined to 1..40 plus one rim edge (1,2): the only triangle is
    // {0,1,2}. Under id orientation hub 0 (lowest id, degree 40) would
    // source C(40,2)=780 wedges; degree orientation points every spoke
    // INTO the hub (rank = (degree, id) puts the hub last), so the hub
    // sources zero wedges and the wedge count is O(m^1.5)-bounded. The
    // count itself must be orientation-independent.
    val star = ((1 to 40).map(i => (0L, i.toLong)) :+ (1L, 2L)).toDF("s", "t")
    val got = Graph.triangleCensus(star, "s", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("chain graph of 201 vertices collapses to one component") {
    val edges = (0 until 200).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
    val cc = Graph.connectedComponents(edges, "s", "t").collect()
    assert(cc.length == 201)
    assert(cc.forall(_.getLong(1) == 0L))
  }

  test("ring plus separate clique: two components, min labels") {
    val ring = (10 until 40).map(i => (i.toLong, ((i - 9) % 30 + 10).toLong))
    val clique = for (a <- 100 until 105; b <- (a + 1) until 105)
      yield (a.toLong, b.toLong)
    val cc = Graph.connectedComponents((ring ++ clique).toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (10 until 40).foreach(i => assert(cc(i.toLong) == 10L))
    (100 until 105).foreach(i => assert(cc(i.toLong) == 100L))
  }

  test("matches per-vertex min over brute-force closure on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    // brute-force union-find oracle
    val parent = scala.collection.mutable.Map((0L until 60L).map(v => v -> v): _*)
    def find(v: Long): Long = if (parent(v) == v) v else { val r = find(parent(v)); parent(v) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    val cc = Graph.connectedComponents(edges.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == expected)
  }

  test("empty edge relation yields an empty labeling without error") {
    val empty = Seq.empty[(Long, Long)].toDF("s", "t")
    assert(Graph.connectedComponents(empty, "s", "t").count() == 0)
  }

  test("custom output column names and self-loop tolerance") {
    val edges = Seq((1L, 1L), (1L, 2L), (3L, 3L)).toDF("s", "t")
    val cc = Graph.connectedComponents(edges, "s", "t",
      vertexOut = "doc_id", componentOut = "cluster_id")
    assert(cc.columns.toSeq == Seq("doc_id", "cluster_id"))
    // vertices with only self-loops have no undirected edge and drop out
    assert(cc.orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 1L), (2L, 1L)))
  }

  test("giant component: converges with no single task holding the label join") {
    // One giant 4096-vertex component with mixed topology: a long chain
    // (diameter stressor — plain propagation would need ~2000 rounds and
    // die at maxRounds=64, so passing PROVES the pointer-doubling round
    // bound), a high-degree star whose hub is NOT the component min (hook
    // stressor), and random shortcuts. Near convergence every vertex's
    // label edge points at vertex 0 — the giant-component hot key the
    // scaladoc's skew claim is about.
    val n = 4096
    val rnd = new scala.util.Random(13)
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
    val star = (1 to 64).map(i => (2048L, 2048L + i))
    val shortcuts = Seq.fill(256)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val edges = (chain ++ star ++ shortcuts).toDF("s", "t")

    // Per-stage shuffle-read skew listener: records (max single-task
    // records, stage total). Broadcast joins would make the metric
    // vacuous, so the label joins are forced to shuffle for this test.
    val stageMax = scala.collection.concurrent.TrieMap[Int, Long]()
    val stageTot = scala.collection.concurrent.TrieMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val recs = te.taskMetrics.shuffleReadMetrics.recordsRead
        if (recs > 0) {
          stageMax.updateWith(te.stageId)(m => Some(math.max(m.getOrElse(0L), recs)))
          stageTot.updateWith(te.stageId)(t => Some(t.getOrElse(0L) + recs))
        }
      }
    }
    // Broadcast joins and AQE's small-partition coalescing both make the
    // per-task metric vacuous at fixture scale (everything lands in one
    // task BY DESIGN when the data is kilobytes) — force real hash-
    // partitioned shuffles so the distribution is observable.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val cc = Graph.connectedComponents(edges, "s", "t").collect()
      assert(cc.length == n)
      assert(cc.forall(_.getLong(1) == 0L), "every vertex labels to the component min")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
      spark.sparkContext.removeSparkListener(listener)
    }
    // listener events are delivered async; wait until the metric map settles
    var snap = -1L
    var settled = false
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!settled && System.nanoTime() < deadline) {
      Thread.sleep(300)
      val now = stageTot.values.sum
      settled = now == snap && now > 0
      snap = now
    }
    // Skew lock: in every shuffle stage big enough to matter, the largest
    // single task read well under the whole stage's input — the hot label
    // key (everything -> vertex 0) never collapsed a join onto one task.
    val big = stageTot.filter(_._2 >= 1000)
    assert(big.nonEmpty, "expected at least one non-trivial shuffle stage")
    big.foreach { case (stage, tot) =>
      val mx = stageMax(stage)
      assert(mx.toDouble / tot <= 0.75,
        s"stage $stage: one task read $mx of $tot shuffle records — label-join skew")
    }
  }
}
