package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic-fixture generator for scale factors the driver
  * did not ship (TESTDATA.md stops at sf0.1). Reproduces the FIXTURES.md
  * schemas and observed value domains (vocab, dup-marker structure, key
  * ranges, date spans) so the registry's oracle SQL stays meaningful, and
  * every value is a pure function of (table, row id) via splitmix64 — the
  * output is identical under any partitioning or parallelism.
  *
  * Usage: runMain graft.tools.DataGen <outDir> <sf> [tables,...]
  * e.g.   runMain graft.tools.DataGen /root/repo/testdata-sf1 1.0
  *        runMain graft.tools.DataGen /root/repo/testdata-docs-sf6 6.0 documents
  * The optional third arg restricts generation to the named tables —
  * single-family scale points (e.g. a 6× documents corpus for the q32
  * adaptive-band check) shouldn't pay for 36M lineitem rows.
  *
  * Scale rules (matching the driver's sf0.001→0.1 progression):
  *   customer 150k·sf? — observed: customer=150000·sf, supplier=10000·sf,
  *   part=200000·sf, orders=1500000·sf, lineitem=4·orders,
  *   events=1000000·sf (users = customer count at the same sf),
  *   documents=50000·sf, embeddings=20000·sf, region/nation fixed.
  */
object DataGen extends Serializable {

  // --- splitmix64: the standard public-domain mix (Steele et al.) ---
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  def h(tag: Long, id: Long, k: Long = 0): Long = mix(mix(mix(tag) ^ id) ^ k)
  /** uniform double in [0,1) from a hash */
  def unit(x: Long): Double = (x >>> 11) * (1.0 / (1L << 53))
  def uni(tag: Long, id: Long, k: Long, lo: Double, hi: Double): Double =
    lo + unit(h(tag, id, k)) * (hi - lo)
  def uniInt(tag: Long, id: Long, k: Long, n: Int): Int =
    ((h(tag, id, k) >>> 1) % n).toInt
  def round2(d: Double): Double = math.round(d * 100.0) / 100.0

  val Regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  val Segments = Seq("MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE", "BUILDING")
  val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  val OrderStatus = Seq("O", "P", "F")
  val ReturnFlags = Seq("N", "A", "R")
  val LineStatus = Seq("O", "F")
  val PTypes = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  val PAdjs = Seq("large", "hot", "blue", "small", "red", "green", "shiny", "dull")
  val PNouns = Seq("ring", "bolt", "nut", "gear", "cog", "pin", "rod", "cap")
  // the 30-word corpus vocabulary observed in the driver's documents table
  val Vocab = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "the", "row", "agg",
    "key", "query", "a", "scan", "batch")
  val Langs = Seq("en", "es", "de", "fr", "zh")

  val DayMs = 86400000L
  val OrdersEpoch = Timestamp.valueOf("1995-01-01 00:00:00").getTime
  val OrdersSpanDays = 2404 // 1995-01-01 .. 2001-08-01
  val EventsEpoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  val EventsSpanMs = 30L * DayMs // .. 2024-01-31

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = args(1).toDouble
    val tableFilter = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nCustomer = (150000 * sf).toLong max 10
    val nSupplier = (10000 * sf).toLong max 5
    val nPart = (200000 * sf).toLong max 10
    val nOrders = (1500000 * sf).toLong max 20
    val nLineitem = 4 * nOrders
    val nEvents = (1000000 * sf).toLong max 50
    val nUsers = nCustomer / 10 max 5 // sf0.1: 1500 users over 15000 customers
    val nDocs = (50000 * sf).toLong max 20
    val nEmb = (20000 * sf).toLong max 20
    val parts = math.max(cpus.toInt, (nLineitem / 500000).toInt)

    def save(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      if (tableFilter.forall(_.contains(name))) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
        println(s"[datagen] wrote $name")
      }

    save("region")(Regions.zipWithIndex
      .map { case (n, i) => (i, n) }.toDF("r_regionkey", "r_name"))

    save("nation")((0 until 25)
      .map(i => (i, s"NATION_$i", i % 5)).toDF("n_nationkey", "n_name", "n_regionkey"))

    save("customer")(spark.range(0, nCustomer, 1, parts).map { id =>
      (id, f"Customer#$id%09d", uniInt(1, id, 0, 25),
        round2(uni(1, id, 1, -1000, 10000)), Segments(uniInt(1, id, 2, 5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))

    save("supplier")(spark.range(0, nSupplier, 1, parts).map { id =>
      (id, f"Supplier#$id%09d", uniInt(2, id, 0, 25), round2(uni(2, id, 1, -1000, 10000)))
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))

    save("part")(spark.range(0, nPart, 1, parts).map { id =>
      val name = PAdjs(uniInt(3, id, 0, 8)) + " " + PNouns(uniInt(3, id, 1, 8))
      (id, name, "Brand#" + (uniInt(3, id, 2, 25) + 1), PTypes(uniInt(3, id, 3, 6)),
        uniInt(3, id, 4, 50) + 1, 900.0 + (id % 1000) / 10.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))

    save("orders")(spark.range(0, nOrders, 1, parts).map { id =>
      val date = new Timestamp(OrdersEpoch + uniInt(4, id, 2, OrdersSpanDays) * DayMs)
      (id, (h(4, id, 0) >>> 1) % nCustomer, OrderStatus(uniInt(4, id, 1, 3)),
        round2(uni(4, id, 3, 1000, 500000)), date, Priorities(uniInt(4, id, 4, 5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))

    // lineitem: each row draws a uniform orderkey (≈Poisson(4) lines/order,
    // matching the driver's observed per-order distribution); shipdate =
    // that order's date (re-derived from the same hash) + 1..95 days.
    save("lineitem")(spark.range(0, nLineitem, 1, parts).map { id =>
      val ok = (h(5, id, 0) >>> 1) % nOrders
      val odate = OrdersEpoch + uniInt(4, ok, 2, OrdersSpanDays) * DayMs
      val ship = new Timestamp(odate + (uniInt(5, id, 6, 95) + 1) * DayMs)
      (ok, (h(5, id, 1) >>> 1) % nPart, (h(5, id, 2) >>> 1) % nSupplier,
        uniInt(5, id, 3, 7) + 1, (uniInt(5, id, 4, 50) + 1).toDouble,
        round2(uni(5, id, 5, 900, 105000)), uniInt(5, id, 7, 11) / 100.0,
        uniInt(5, id, 8, 9) / 100.0, ReturnFlags(uniInt(5, id, 9, 3)),
        LineStatus(uniInt(5, id, 10, 2)), ship)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate"))

    save("events")(spark.range(0, nEvents, 1, parts).map { id =>
      val ts = new Timestamp(EventsEpoch + (h(6, id, 0) >>> 1) % EventsSpanMs)
      ts.setNanos(((h(6, id, 5) >>> 1) % 1000000).toInt * 1000)
      val etype = Seq("click", "view", "purchase", "signup", "error")(uniInt(6, id, 1, 5))
      // exponential(mean 50): matches observed avg≈50 / max≈560 tail
      val v = round2(-50.0 * math.log1p(-unit(h(6, id, 2))))
      (id, ts, (h(6, id, 3) >>> 1) % nUsers, etype, v,
        s"""{"k": ${uniInt(6, id, 4, 100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))

    // documents: ~5% are near-duplicates of an earlier non-dup doc (same
    // text + " dup" appended), reproducing the driver's dup-marker family;
    // base-choice collisions yield the observed handful of exact dup pairs.
    def isDup(id: Long): Boolean = id > 0 && (h(7, id, 100) >>> 1) % 20 == 0
    def baseText(id: Long): String = {
      val len = uniInt(7, id, 0, 91) + 10
      (0 until len).map(k => Vocab(uniInt(7, id, 200 + k, 30))).mkString(" ")
    }
    save("documents")(spark.range(0, nDocs, 1, parts).map { id =>
      val text =
        if (isDup(id)) {
          var cand = (h(7, id, 101) >>> 1) % id
          while (isDup(cand)) cand = (cand + 1) % id
          baseText(cand) + " dup"
        } else baseText(id)
      val lr = unit(h(7, id, 102))
      val lang = if (lr < 0.4) "en" else Langs(1 + ((lr - 0.4) / 0.15).toInt.min(3))
      (id, text, lang, "src" + uniInt(7, id, 103, 20), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"))

    // embeddings: 64-dim unit vectors (Box–Muller gaussian, L2-normalized)
    save("embeddings")(spark.range(0, nEmb, 1, parts).map { id =>
      val g = Array.tabulate(64) { k =>
        val u1 = unit(h(8, id, 2L * k)) max 1e-12
        val u2 = unit(h(8, id, 2L * k + 1))
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
      val norm = math.sqrt(g.map(x => x * x).sum)
      (id, g.map(x => (x / norm).toFloat), uniInt(8, id, 999, 10))
    }.toDF("vec_id", "embedding", "label"))

    spark.stop()
  }
}
