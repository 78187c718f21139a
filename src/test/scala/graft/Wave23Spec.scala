package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-10 wave-23 operators (q185-q190):
  * driver-side from-scratch replays plus analytic cross-checks. */
class Wave23Spec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q185: DP sum release matches a from-scratch clipped-Laplace replay") {
    val evs = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = evs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val cents = es.map(e => roundHalfUp(e._2 * 100))
      val clipped = cents.map(c => math.min(c, 10000L))
      val u = ((h60(s"$t:dps") % 1048576L) + 0.5) / 1048576.0 - 0.5
      val noise = -100000.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
      val released = math.max(0L, roundHalfUp(clipped.sum + noise))
      (t, es.length.toLong, cents.sum, clipped.sum,
        cents.count(_ > 10000L).toLong,
        if (cents.sum > 0) Some(r6(1.0 - clipped.sum.toDouble / cents.sum))
        else None,
        r6(noise), released)
    }
    val got = SparkEntry.queries("q185_dp_sum_release")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6), r.getLong(7)))
    assert(got.toSeq == want)
    // clipping only shrinks; the release is post-processing of the
    // clipped sum, so |released − clipped| is exactly the rounded noise
    got.foreach { r =>
      assert(r._4 <= r._3)
      assert(math.abs(r._8 - r._4) <= math.abs(r._7) + 1.0)
    }
  }

  test("q186: norm audit matches a from-scratch fold replay") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0) % 2, r.getSeq[Float](1)))
    def normQ(v: Seq[Float]): Long = {
      var acc = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; acc += x * x; i += 1 }
      roundHalfUp(math.sqrt(acc) * 1000000.0)
    }
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (y, vs) =>
      val qs = vs.map(v => normQ(v._2))
      val n = qs.length.toLong
      val s = qs.map(BigInt(_)).sum
      val sqq = qs.map(q => BigInt(q) * BigInt(q)).sum
      (y, n, r6(qs.min / 1000000.0), r6(qs.max / 1000000.0),
        r6(s.toDouble / n / 1000000.0),
        r6((sqq * n - s * s).toDouble / (n.toDouble * n) / 1e12))
    }
    val got = SparkEntry.queries("q186_embedding_norm_audit")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // norms are strictly positive and variance non-negative
    got.foreach(r => assert(r._3 > 0.0 && r._6 >= 0.0))
  }

  test("q187: cluster profile is consistent with q60's labels and the corpus count") {
    val labels = SparkEntry.queries("q60_dup_clusters")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = spark.read.parquet(s"$sfSmoke/documents.parquet").count()
    val sizes = labels.groupBy(_._2).values.map(_.length.toLong).toSeq
    val want = sizes.groupBy(identity).toSeq.sortBy(_._1).map { case (k, ks) =>
      (k, ks.length.toLong, k * ks.length,
        sizes.length.toLong, nDocs - labels.length,
        r6((k * ks.length).toDouble / nDocs))
    }
    val got = SparkEntry.queries("q187_dup_cluster_profile")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // accounting: clustered docs + singletons = corpus; clusters have k >= 2
    assert(got.map(_._3).sum + got.head._5 == nDocs)
    assert(got.forall(_._1 >= 2L), "a CC cluster has at least 2 members")
  }

  test("q188: majority vote matches a from-scratch PRF replay and beats each annotator") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1) % 2))
    val flips = Seq(100L, 200L, 300L)
    val want = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (y, es) =>
      val anns = es.map { case (id, yy) =>
        val a = (1 to 3).map(j =>
          if (h60(s"$id:an$j") % 1000 < flips(j - 1)) 1 - yy else yy)
        (yy, a)
      }
      val n = anns.length.toLong
      val nMaj = anns.count { case (yy, a) =>
        (if (a.sum >= 2) 1 else 0) == yy }.toLong
      val nUnan = anns.count(p => p._2.distinct.length == 1).toLong
      val accs = (0 until 3).map(j => anns.count(p => p._2(j) == p._1).toLong)
      (y, n, 1000000L * nMaj / n, 1000000L * nUnan / n,
        1000000L * accs(0) / n, 1000000L * accs(1) / n, 1000000L * accs(2) / n,
        r6(nMaj.toDouble / n))
    }
    val got = SparkEntry.queries("q188_annotator_majority")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    assert(got.toSeq == want)
    // the vote exists because it beats the noisiest annotator; with flip
    // rates 10/20/30% the majority should beat a3 on every class
    got.foreach(r => assert(r._3 >= r._7, s"majority must beat a3: $r"))
  }

  test("q189: band mixture matches a from-scratch top-V replay and masses add up") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val occ = docs.flatMap { case (s, t) => t.split(" ", -1).map(tok => (s, tok)) }
    val vocab = occ.groupBy(_._2).map { case (tok, os) => tok -> os.length.toLong }
    val ranked = vocab.toSeq.sortBy { case (tok, c) => (-c, tok) }
    val head = ranked.take(16).map(_._1).toSet
    val body = ranked.slice(16, 256).map(_._1).toSet
    val want = occ.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, os) =>
      val n = os.length.toLong
      val h = os.count(o => head(o._2)).toLong
      val b = os.count(o => body(o._2)).toLong
      val t = n - h - b
      (src, n, 1000000L * h / n, 1000000L * b / n, 1000000L * t / n, t)
    }
    val got = SparkEntry.queries("q189_freq_band_mix")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want)
    // ppm bands sum to ~1e6 (floor-division slack < 3)
    got.foreach(r => assert(math.abs(r._3 + r._4 + r._5 - 1000000L) < 3))
  }

  test("q190: PII density matches a from-scratch regex replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val email = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b".r
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val per = ds.map { case (id, _, t) =>
        val body = s"$t contact user$id@mail.example.com from 10.${id % 200}.0.${id % 250}"
        (t.split(" ", -1).length.toLong,
          (email.findAllIn(body).length + ip.findAllIn(body).length).toLong)
      }
      val nTok = per.map(_._1).sum
      val nM = per.map(_._2).sum
      (src, ds.length.toLong, nM,
        r6(per.count(_._2 > 0).toDouble / ds.length),
        1000000L * nM / nTok)
    }
    val got = SparkEntry.queries("q190_pii_density")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == want)
    // the synthetic body guarantees every doc carries PII
    got.foreach(r => assert(r._4 == 1.0 && r._3 >= 2 * r._2))
  }
}
