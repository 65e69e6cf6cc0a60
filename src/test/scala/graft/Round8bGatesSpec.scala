package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, CurationOps, Relational, TextOps, TrainingOps}

/** Behavioral contracts of the round-8 late additions beyond their
  * DuckDB hash gates: the binned temporal-proximity join (q37), the
  * salted skew-resistant join (q38), language-pair JS divergence
  * (t71) and per-source quantile thresholding (t72).
  *
  * Each test is a DIFFERENTIAL check where feasible: the operator's
  * distributed formulation against a straight-line driver-side
  * reference on the sf0.001 corpus — the same discipline as the
  * golden/gate pattern, but runnable inside `sbt test`.
  */
class Round8bGatesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("q37 proximity join: binned formulation == brute-force pair count") {
    val w = 300L * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"), r.getAs[Long]("us")))
    val expected = ev.flatMap { case (et, ua, ta) =>
      ev.collect { case (et2, ub, tb)
        if et2 == et && ub != ua && tb > ta && tb - ta <= w => (et, ua) }
    }
    val expPairs = expected.groupBy(_._1).view.mapValues(_.length).toMap
    val expLead = expected.distinct.groupBy(_._1).view.mapValues(_.length).toMap
    val got = Analytics.qProximityJoin(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_pairs") == expPairs(et).toLong, s"n_pairs($et)")
      assert(r.getAs[Long]("n_lead_users") == expLead(et).toLong, s"n_lead_users($et)")
    }
    assert(got.length == expPairs.size)
  }

  test("q38 salted join: identical rows to the plain inner join") {
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(Det.dec2(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - Det.dec2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    val salted = Relational.qSaltedJoin(spark, dir).collect()
    assert(salted.map(_.toString).sameElements(plain.map(_.toString)))
    assert(salted.length > 1)
  }

  test("t71 lang divergence: matches a straight-line JS computation, all pairs, bounded") {
    // driver-side reference: same 256-bucket add-one-smoothed models,
    // same per-bucket nano-nat quantization
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    def bucket(wd: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(wd.getBytes("UTF-8"))
      ((d(0) & 0xff).toInt)
    }
    val counts = scala.collection.mutable.Map.empty[(String, Int), Long]
    docs.foreach { case (lang, text) =>
      text.split(' ').filter(_.nonEmpty).foreach { wd =>
        val k = (lang, bucket(wd)); counts(k) = counts.getOrElse(k, 0L) + 1
      }
    }
    val langs = docs.map(_._1).distinct.sorted
    val tot = langs.map(l => l -> (0 until 256).map(b => counts.getOrElse((l, b), 0L)).sum).toMap
    def js(a: String, b: String): Long =
      (0 until 256).map { bk =>
        val p = (counts.getOrElse((a, bk), 0L) + 1).toDouble / (tot(a) + 256).toDouble
        val q = (counts.getOrElse((b, bk), 0L) + 1).toDouble / (tot(b) + 256).toDouble
        val m = (p + q) / 2
        math.floor((p * math.log(p / m) / 2 + q * math.log(q / m) / 2) * 1e9).toLong
      }.sum
    val got = CurationOps.qLangDivergence(spark, dir).collect()
    assert(got.length == langs.combinations(2).size)
    got.foreach { r =>
      val (la, lb) = (r.getAs[String]("lang_a"), r.getAs[String]("lang_b"))
      assert(la < lb)
      val expected = js(la, lb)
      assert(r.getAs[Long]("js_nano") == expected, s"js($la,$lb)")
      // JS is bounded by ln 2 and languages genuinely differ here
      val v = r.getAs[Double]("js")
      assert(v > 0.0 && v <= math.log(2.0) + 1e-9)
    }
  }

  test("t73 minhash error: estimator bounded, candidates cover every verified t28 pair") {
    val rows = TextOps.qMinhashError(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // a candidate pair shares at least one full band: both of that
      // band's hashes agree (fixed-width md5 hex, so the concat
      // band_sig equality cannot be a boundary collision)
      val agree = r.getAs[Int]("n_agree")
      assert(agree >= 2 && agree <= 8)
      assert(r.getAs[Double]("jacc_est") == agree / 8.0)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Double]("abs_err") == math.abs(agree / 8.0 - j))
    }
    // the verified t28 pairs are exactly the candidates with J >= 0.5
    val verified = TextOps.qMinhashLsh(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val highJ = rows.filter(_.getAs[Double]("jaccard") >= 0.5)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(highJ == verified)
  }

  test("q39 anomaly: matches a straight-line integer z-test on the real corpus") {
    val hours = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("h")))
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.keys.toSeq.flatMap { case (et, h) =>
      val xs = counts.collect { case ((t, _), c) if t == et => c }.toSeq
      val n = xs.length.toLong; val sx = xs.sum; val sq = xs.map(x => x * x).sum
      val x = counts((et, h)); val dev = n * x - sx
      if (dev * dev > 4L * (n * sq - sx * sx)) Some(((et, h), x, dev > 0)) else None
    }.toSet
    val got = Analytics.qAnomaly(spark, dir).collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("h")),
        r.getAs[Long]("x"), r.getAs[Boolean]("spike"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q40 funnel: matches a straight-line conversion count on the real corpus") {
    val evs = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), to_date(col("ts")).as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id"), r.getAs[Long]("us"),
        r.getAs[java.sql.Date]("day").toString))
    val purchases = evs.filter(_._1 == "purchase")
    val expected = evs.filter(_._1 == "signup")
      .map { case (_, u, _, tsu, day) =>
        val hit = purchases.exists { case (_, pu, _, tp, _) =>
          pu == u && tp > tsu && tp - tsu <= 3600L * 1000000 }
        (day, hit)
      }
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.count(_._2).toLong)).toMap
    val got = Analytics.qFunnel(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_signups"), r.getAs[Long]("n_converted"))).toMap
    assert(got == expected)
    assert(got.values.map(_._2).sum > 0, "no conversions found - window too tight")
  }

  test("q41 cohort retention: week-0 covers every cohort user, weeks nonnegative") {
    val rows = Analytics.qCohortRetention(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week") >= 0L)
      assert(r.getAs[Long]("active_users") >= 1L)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("active_users"))
    }
    // every user is active in their own cohort's week 0 by definition,
    // so summing week-0 active_users over cohorts counts every user
    val week0 = rows.filter(_.getAs[Long]("week") == 0L)
      .map(_.getAs[Long]("active_users")).sum
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(week0 == users)
  }

  test("t75 weighted sample: matches a straight-line md5-bucket decision per band") {
    val bands = TextOps.qQualityScore(spark, dir)
      .select(col("doc_id"), col("band")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("band")))
    val rates = Map("good" -> 0.9, "fair" -> 0.5, "low" -> 0.1)
    def bucket(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"qw:$id".getBytes("UTF-8"))
      d(0) & 0xff
    }
    val expected = bands.groupBy(_._2).map { case (b, rs) =>
      val kept = rs.count { case (id, _) =>
        bucket(id) < math.floor(rates(b) * 256).toInt }
      b -> (rs.length.toLong, kept.toLong)
    }
    val got = CurationOps.qWeightedSample(spark, dir).collect()
      .map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    assert(got == expected)
    got.foreach { case (_, (n, k)) => assert(k <= n) }
  }

  test("graft-analyze CLI: report sections land on disk and match the gate builders") {
    val out = java.nio.file.Files.createTempDirectory("analyze").toString
    graft.app.GraftAnalyze.run(spark, dir, out)
    val expect = Map(
      "anomalies" -> Analytics.qAnomaly(spark, dir).count(),
      "funnel" -> Analytics.qFunnel(spark, dir).count(),
      "cohorts" -> Analytics.qCohortRetention(spark, dir).count(),
      "proximity" -> Analytics.qProximityJoin(spark, dir).count())
    expect.foreach { case (name, n) =>
      assert(spark.read.parquet(s"$out/$name").count() == n, name)
    }
    // value-level check, not just cardinality: the anomalies section is
    // byte-for-byte the gate builder's rows
    val wantAnoms = Analytics.qAnomaly(spark, dir).collect().map(_.toString).sorted
    val gotAnoms = spark.read.parquet(s"$out/anomalies")
      .select(col("event_type"), col("h"), col("x"), col("spike"))
      .collect().map(_.toString).sorted
    assert(gotAnoms.sameElements(wantAnoms))
    // rolling peaks: one row per user, values equal the windowed maxima
    val wantPeaks = Analytics.qRollingWindow(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("n_24h")).as("peak_events_24h"),
        max(col("spend_24h")).as("peak_spend_24h"))
      .collect().map(_.toString).sorted
    val gotPeaks = spark.read.parquet(s"$out/rolling_peaks")
      .select(col("user_id"), col("peak_events_24h"), col("peak_spend_24h"))
      .collect().map(_.toString).sorted
    assert(gotPeaks.sameElements(wantPeaks))
  }

  test("m45 media dedup: exact copies at hamming 0, planted near-copies found") {
    val pairs = graft.operators.MediaGate.qMediaDedup(spark, dir).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Int]("hamming"))).toMap
    // byte-for-byte copies: ids 224/225 duplicate originals 1/4
    assert(pairs.get((1L, 224L)).contains(0))
    assert(pairs.get((4L, 225L)).contains(0))
    // the 8 single-byte-nudged copies (ids 100+orig): a +1 nudge moves
    // one block sum by one, so most planted pairs stay within tau
    val planted = (0 until 8).map(i => (i * 3 % 24).toLong)
      .count(o => pairs.contains((o, 100L + o)))
    assert(planted >= 6, s"only $planted/8 planted near-dups found")
    pairs.values.foreach(h => assert(h >= 0 && h <= 3))
  }

  test("t78 cluster split: one row per doc, cluster members share a split, leak flags exact") {
    val rows = TrainingOps.qClusterSplit(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.length == nDocs)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_rep"))
    byCluster.foreach { case (_, rs) =>
      // the WHOLE family inherits the representative's split
      assert(rs.map(_.getAs[String]("split_cluster")).distinct.length == 1)
      // leaky <=> the naive per-doc splits disagree inside the family
      val naive = rs.map(_.getAs[String]("split_doc")).distinct.length
      rs.foreach(r => assert(r.getAs[Boolean]("leaky") == (naive > 1)))
    }
    // the corpus plants near-dup families large enough that some
    // naive split IS leaky - the operator must catch at least one
    assert(rows.exists(_.getAs[Boolean]("leaky")))
    // and fix it: no leaky family under the cluster split
    byCluster.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("split_cluster")).toSet.size == 1)
    }
  }

  test("t77 langid confusion: cells partition the corpus, en column diagonal-dominant") {
    val cells = CurationOps.qLangidConfusion(spark, dir).collect()
    val totalDocs = Tables.documents(spark, dir)
      .filter(expr("size(filter(split(text, ' '), w -> w != '')) > 0")).count()
    assert(cells.map(_.getAs[Long]("n")).sum == totalDocs)
    val byCell = cells.map(r => (r.getAs[String]("lang"),
      r.getAs[String]("lang_pred")) -> r.getAs[Long]("n")).toMap
    // the biggest class must at least recognize itself better than it
    // mislabels any single other class
    val enDiag = byCell.getOrElse(("en", "en"), 0L)
    byCell.collect { case ((l, "en"), n) if l != "en" => n }
      .foreach(n => assert(enDiag >= n, s"en diagonal $enDiag below off-cell $n"))
    assert(enDiag > 0L)
  }

  test("q42 rolling window: trailing-24h frame matches a straight-line two-pointer scan") {
    val evs = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("us"), r.getAs[Double]("value")))
    val day = 24L * 3600 * 1000000
    val expected = evs.map { case (id, u, t, _) =>
      val frame = evs.filter { case (_, u2, t2, _) => u2 == u && t2 >= t - day && t2 <= t }
      val cents = frame.map(e => math.round(e._4 * 100)).sum
      id -> (frame.length.toLong, cents / 100.0)
    }.toMap
    val got = Analytics.qRollingWindow(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_24h"), r.getAs[Double]("spend_24h"))).toMap
    assert(got == expected)
  }

  test("v45 cluster quality: one row per cluster, cohesion/margin bounded, margin >= 0") {
    import graft.operators.VectorOps
    val rows = VectorOps.qClusterQuality(spark, dir).collect()
    val nLabels = Tables.embeddings(spark, dir)
      .select(col("label")).distinct().count()
    // every label centroid attracts at least its own members here
    assert(rows.length.toLong == nLabels)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.embeddings(spark, dir).count())
    rows.foreach { r =>
      val (coh, mar) = (r.getAs[Double]("mean_cohesion"), r.getAs[Double]("mean_margin"))
      assert(coh >= -1.0 && coh <= 1.0)
      // best-minus-second is nonnegative by construction (floor can
      // shave at most 1e-12 per member off the mean)
      assert(mar >= -1e-9, s"margin $mar")
    }
  }

  test("v46 centroid overlap: full upper triangle, cosines bounded") {
    import graft.operators.VectorOps
    val rows = VectorOps.qCentroidOverlap(spark, dir).collect()
    val k = Tables.embeddings(spark, dir).select(col("label")).distinct().count()
    assert(rows.length.toLong == k * (k - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Int]("label_a") < r.getAs[Int]("label_b"))
      val c = r.getAs[Long]("ccos_micro12")
      assert(c >= -1000000000000L && c <= 1000000000000L)
    }
  }

  test("t76 attribution: every attributed train doc is t68-contaminated and vice versa") {
    val report = TrainingOps.qContaminationReport(spark, dir).collect()
    val screened = TrainingOps.qSpanDecontaminate(spark, dir).collect()
      .filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    val attributed = report.map(_.getAs[Long]("train_doc")).toSet
    // the attribution's train docs are exactly the screen's flags
    // (same spans, same split; the df-cap binds only boilerplate,
    // absent in this corpus)
    assert(attributed == screened, s"attributed=$attributed screened=$screened")
    report.foreach(r => assert(r.getAs[Long]("n_shared") >= 1L))
  }

  test("t80 threshold sweep: monotone counts, consistent with t73 and t28") {
    val row = TextOps.qThresholdSweep(spark, dir).head()
    val (nc, n50, n70, n90) = (row.getAs[Long]("n_candidates"),
      row.getAs[Long]("n_j50"), row.getAs[Long]("n_j70"), row.getAs[Long]("n_j90"))
    assert(nc >= n50 && n50 >= n70 && n70 >= n90 && n90 >= 0L)
    // the 0.5 band is exactly t28's verified pair count
    assert(n50 == TextOps.qMinhashLsh(spark, dir).count())
    assert(nc == TextOps.qMinhashError(spark, dir).count())
  }

  test("v44 binary ANN: 5 ranked rows per query, recall@5 >= 0.5 vs brute force") {
    import graft.operators.VectorOps
    val bq = VectorOps.qAnnBinary(spark, dir).collect()
    val bf = VectorOps.qAnnBruteForce(spark, dir).collect()
    val byQ = bq.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == bf.map(_.getAs[Long]("query_id")).distinct.length)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5))
      val cos = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      cos.zip(cos.tail).foreach { case (a, b) => assert(a >= b) }
    }
    var hits = 0; var tot = 0
    bf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, ex) =>
      val exact = ex.map(_.getAs[Long]("neighbor_id")).toSet
      val approx = byQ(q).map(_.getAs[Long]("neighbor_id")).toSet
      hits += exact.intersect(approx).size; tot += exact.size
    }
    // 1 bit/dim on 64 dims with a 50-candidate rescoring pool measures
    // 0.68 on this corpus; 0.5 is the regression floor
    assert(hits.toDouble / tot >= 0.5, s"recall ${hits.toDouble / tot}")
  }

  test("m48 resize plan: box bound, aspect preserved, never upscales") {
    val rows = graft.operators.MediaGate.qResizePlan(spark, dir).collect()
    assert(rows.length == 24)
    var planned = 0
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      if (w <= 0 || h <= 0) {
        // dimensionless payloads pass through with a zero pixel budget
        assert(ow == w && oh == h && r.getAs[Long]("out_bytes") == 0L)
      } else {
        planned += 1
        assert(ow >= 1 && oh >= 1 && ow <= w && oh <= h,
          "resize must never upscale")
        val m = math.max(w, h)
        if (m > 224) {
          assert(ow == math.max(w.toLong * 224 / m, 1L))
          assert(oh == math.max(h.toLong * 224 / m, 1L))
        } else assert(ow == w && oh == h)
        assert(r.getAs[Long]("out_bytes") == ow.toLong * oh * 3L)
      }
    }
    assert(planned == 8) // every third seeded row is an image
  }

  test("m46 audio segments: one row per audio payload, segment algebra holds") {
    val rows = graft.operators.MediaGate.qAudioSegments(spark, dir).collect()
    assert(rows.length == 8) // 24 seeded media, every third is audio/wav
    rows.foreach { r =>
      val (n, v, s, l) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_voiced"),
        r.getAs[Long]("n_segments"), r.getAs[Long]("longest_seg"))
      // at least one frame is at-or-above the average, so >= 1 segment
      assert(v >= 1L && s >= 1L)
      // s segments of >= 1 frame each partition the v voiced frames
      assert(v <= n && s <= v && l <= v)
      assert(l >= (v + s - 1) / s, "longest segment below the mean length")
    }
  }

  test("m47 scene changes: one row per video, scene algebra holds") {
    val rows = graft.operators.MediaGate.qSceneChanges(spark, dir).collect()
    assert(rows.length == 8) // every third seeded media row is video/mp4
    rows.foreach { r =>
      val (n, s, l) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_scenes"),
        r.getAs[Long]("longest_scene"))
      // s scenes of >= 1 frame partition ALL n frames
      assert(s >= 1L && l >= 1L && s <= n && l <= n)
      assert(l >= (n + s - 1) / s, "longest scene below the mean length")
    }
  }

  test("t74 fertility: per-lang rows, bounds hold, ratios derive exactly from the counts") {
    val rows = graft.operators.BpeTrainer.qTokenizerFertility(spark, dir).collect()
    val langs = Tables.documents(spark, dir)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("lang")).toSet == langs)
    rows.foreach { r =>
      val (w, t, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[Long]("n_chars"))
      // BPE never merges across words, so every word is >= 1 token;
      // every token is >= 1 char
      assert(t >= w && c >= t && r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Double]("fertility") == t.toDouble / w)
      assert(r.getAs[Double]("chars_per_token") == c.toDouble / t)
    }
  }

  test("t72 quantile threshold: ranks contiguous per source, keep = top 70% by score") {
    val rows = TextOps.qQuantileThreshold(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val n = rs.length
      assert(rs.forall(_.getAs[Long]("n_src") == n.toLong), s"n_src($src)")
      val ranks = rs.map(_.getAs[Long]("src_rank")).sorted
      assert(ranks.sameElements((1L to n.toLong)), s"ranks($src)")
      // rank order must be score desc, doc_id asc
      val byRank = rs.sortBy(_.getAs[Long]("src_rank"))
      byRank.zip(byRank.tail).foreach { case (hi, lo) =>
        val (sh, sl) = (hi.getAs[Double]("score"), lo.getAs[Double]("score"))
        assert(sh > sl ||
          (sh == sl && hi.getAs[Long]("doc_id") < lo.getAs[Long]("doc_id")))
      }
      // keep ⇔ rank within the top 70% (integer rule)
      rs.foreach { r =>
        assert(r.getAs[Boolean]("keep") ==
          (r.getAs[Long]("src_rank") * 10 <= n.toLong * 7))
      }
      val kept = rs.count(_.getAs[Boolean]("keep"))
      assert(kept == (n * 7) / 10, s"kept($src)")
    }
  }
}
