package graft

import java.security.MessageDigest

/** q240 (end-to-end curation pipeline sheet) replayed from scratch in
  * plain driver Scala — same split hash, same q70 quality rules, same
  * distinct-5-shingle decontamination — plus funnel structure: counts
  * are monotone non-increasing down the stages, and the composite
  * stage cells agree with what the STANDALONE operators' rules imply
  * (the composition certificate). */
class Wave62Spec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("q240 equals a from-scratch driver replay; funnel structure holds") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    final case class D(id: Long, split: String, nt: Long, pass: Boolean,
        shingles: Set[Long])
    val feats = docs.map { case (id, text) =>
      // limit -1: Spark's split keeps trailing empty tokens
      val toks = text.split(" ", -1)
      val h = java.lang.Math.floorMod(h60(text), 100L)
      val split = if (h < 80) "train" else if (h < 90) "val" else "test"
      val nt = toks.length.toLong
      val div = toks.distinct.length.toDouble / toks.length
      val tri =
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq.empty
      val rep =
        if (tri.nonEmpty) 1.0 - tri.distinct.length.toDouble / tri.length
        else 0.0
      val pass = nt >= 20 && nt <= 90 && div >= 0.35 && rep <= 0.01
      val sh =
        if (toks.length >= 5)
          toks.sliding(5).map(w => h60(w.mkString(" "))).toSet
        else Set.empty[Long]
      D(id, split, nt, pass, sh)
    }
    val testSet = feats.filter(_.split == "test").flatMap(_.shingles).toSet
    val contam = feats
      .filter(f => f.split == "train" && f.pass &&
        f.shingles.exists(testSet.contains))
      .map(_.id).toSet
    def cell(stage: String, fs: Seq[D]) = fs.groupBy(_.split).map {
      case (sp, xs) => (stage, sp, xs.length.toLong, xs.map(_.nt).sum)
    }
    val want = (cell("a_ingest", feats.toSeq) ++
      cell("b_quality", feats.filter(_.pass).toSeq) ++
      cell("c_decontam", feats.filter(f =>
        f.pass && !(f.split == "train" && contam.contains(f.id))).toSeq))
      .toSeq.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q240_curation_e2e")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want)
    // the funnel never grows: per split, docs and tokens are monotone
    // non-increasing down the stages
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byStage = rows.sortBy(_._1)
      assert(byStage.map(_._3) == byStage.map(_._3).sorted.reverse, rows)
      assert(byStage.map(_._4) == byStage.map(_._4).sorted.reverse, rows)
    }
    // decontamination only ever drops TRAIN docs
    val q = got.filter(_._1 == "b_quality").map(r => r._2 -> r._3).toMap
    val c = got.filter(_._1 == "c_decontam").map(r => r._2 -> r._3).toMap
    Seq("val", "test").foreach(sp => assert(q.get(sp) == c.get(sp),
      s"$sp changed at decontamination"))
  }
}
