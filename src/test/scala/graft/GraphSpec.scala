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
}
