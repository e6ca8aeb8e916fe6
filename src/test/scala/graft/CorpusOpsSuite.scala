package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The round-10 corpus operators vs independent driver-side recomputation
  * on sf0.001 — the DuckDB gate proves Spark-vs-oracle over ONE composed
  * SQL mirror; these tests re-derive every intermediate (hashes, counts,
  * fixed-point ratios, cluster pair predicates) in plain Scala from the raw
  * fixture, so a bug appearing identically in both the Spark expression and
  * its hand-written SQL twin (the one failure mode the gate cannot see)
  * still fails here.
  */
class CorpusOpsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-corpus-ops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(Tables.nanosConf._1, Tables.nanosConf._2)
    .getOrCreate()

  override def beforeAll(): Unit = { spark; () }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def Tables = graft.Tables

  /** 60-bit md5-derived hash, the driver-side twin of `Dedup.h60S`. */
  private def h60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def docs(): Seq[(Long, String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def toks(text: String): Array[String] = text.trim.split("\\s+")

  // ------------------------------------------------------- text_lm_score

  test("text_lm_score equals a driver-side bigram-MLE recomputation") {
    val dm = scala.collection.mutable.Map.empty[(Long, String, String), Long]
    docs().foreach { case (id, text, _) =>
      val t = toks(text)
      if (t.length >= 2) t.sliding(2).foreach { p =>
        dm(( id, p(0), p(1) )) = dm.getOrElse((id, p(0), p(1)), 0L) + 1L
      }
    }
    val c2 = dm.groupBy { case ((_, w1, w2), _) => (w1, w2) }
      .view.mapValues(_.values.sum).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val pm = c2.map { case ((w1, w2), c) => (w1, w2) -> c * 1000L / c1(w1) }
    val expected = dm.groupBy(_._1._1).map { case (id, rows) =>
      val n = rows.values.sum
      val s = rows.map { case ((_, w1, w2), m) => m * pm((w1, w2)) }.sum
      id -> (n, s / n)
    }
    val got = TextAnalysis.text_lm_score(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, lm)) =>
      val (gn, glm, gcls) = got(id)
      assert(gn === n, s"doc $id n_bigrams")
      assert(glm === lm, s"doc $id lm_milli")
      assert(gcls === (if (lm >= 34L) "fluent" else "unusual"), s"doc $id class")
    }
  }

  // ----------------------------------------------------- text_cms_counts

  test("text_cms_counts equals a driver-side Count-Min recomputation") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs().foreach { case (_, text, _) =>
      toks(text).foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L)
    }
    def bucket(j: Int, t: String): Long = h60(s"cms$j:$t") % 16L
    val counters = (for {
      (t, n) <- counts.toSeq; j <- 0 until 4
    } yield ((j, bucket(j, t)), n))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val got = TextAnalysis.text_cms_counts(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === top.map(_._1).toSet, "audit rows are the exact top-20 terms")
    top.foreach { case (t, n) =>
      val est = (0 until 4).map(j => counters((j, bucket(j, t)))).min
      val (gn, gest, gover) = got(t)
      assert(gn === n, s"term $t exact")
      assert(gest === est, s"term $t estimate")
      assert(gover === est - n, s"term $t overestimate")
      assert(gover >= 0, s"term $t: CMS must never underestimate")
    }
  }

  // ----------------------------------------------------------- pipe_dsir

  test("pipe_dsir equals a driver-side hashed-feature importance recomputation") {
    val dm = scala.collection.mutable.Map.empty[(Long, Long), Long] // (doc, f) -> m
    val langOf = scala.collection.mutable.Map.empty[Long, String]
    docs().foreach { case (id, text, lang) =>
      langOf(id) = lang
      val t = toks(text)
      val feats = t.map(w => s"u:$w") ++
        (if (t.length >= 2) t.sliding(2).map(p => s"b:${p(0)} ${p(1)}").toSeq else Nil)
      feats.foreach { g =>
        val f = h60(g) % 1024L
        dm((id, f)) = dm.getOrElse((id, f), 0L) + 1L
      }
    }
    val rn = dm.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tn = dm.filter { case ((id, _), _) => langOf(id) == "en" }
      .groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val (rtot, ttot) = (rn.values.sum, tn.values.sum)
    val tppm = rn.keys.map(f => f -> tn.getOrElse(f, 0L) * 1000000L / ttot).toMap
    val rppm = rn.map { case (f, c) => f -> c * 1000000L / rtot }
    val expected = dm.groupBy(_._1._1).map { case (id, rows) =>
      val n = rows.values.sum
      val st = rows.map { case ((_, f), m) => m * tppm(f) }.sum
      val sr = rows.map { case ((_, f), m) => m * rppm(f) }.sum
      id -> (n, st / n - sr / n)
    }
    val got = Pipeline.pipe_dsir(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (n, score)) =>
      val (glang, gn, gscore, gsel) = got(id)
      assert(glang === langOf(id))
      assert(gn === n, s"doc $id n_feats")
      assert(gscore === score, s"doc $id dsir_milli")
      assert(gsel === (score > 0), s"doc $id selected")
    }
  }

  // ------------------------------------------------------ dedup_semantic

  test("dedup_semantic keep-marks satisfy the dominated-pair rule within clusters") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // VecDot semantics: widen each float to double, accumulate in index order
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def near(a: Long, b: Long): Boolean = {
      val d = dot(emb(a), emb(b))
      d > 0 && d * d >= 0.16 * dot(emb(a), emb(a)) * dot(emb(b), emb(b))
    }
    val out = Dedup.dedup_semantic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length === emb.size, "every vector gets exactly one row")
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.forall(_._3 == rows.length), s"cluster $cid size column consistent")
      rows.foreach { case (v, _, _, kept) =>
        val dominated = rows.exists { case (u, _, _, _) => u < v && near(u, v) }
        assert(kept === !dominated,
          s"vec $v in cluster $cid: kept=$kept but dominated=$dominated")
      }
    }
    // the rule must actually fire somewhere at this fixture, or the test
    // (and the gate) proves only the trivial all-kept corpus
    assert(out.exists(!_._4), "at least one vector must be dropped at sf0.001")
  }

  // --------------------------------------------------------- sim_kcenter

  test("sim_kcenter equals a driver-side greedy farthest-first recomputation") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val n2 = emb.map { case (id, v) => id -> dot(v, v) }.toMap
    def cos(p: Long, c: Long): Double =
      dot(emb(c.toInt)._2, emb(p.toInt)._2) / math.sqrt(n2(p) * n2(c))
    // greedy farthest-first: next center minimizes its MAX cosine over the
    // chosen set (distance to the nearest center), ties to low id — the
    // rule that catches the min/max inversion a mirrored oracle cannot
    var chosen = Vector(emb.map(_._1).min)
    while (chosen.size < 8) {
      val next = emb.map { case (p, _) =>
        p -> chosen.map(c => cos(p, c)).max
      }.minBy { case (p, mx) => (mx, p) }._1
      chosen :+= next
    }
    val expectedCenter = emb.map { case (p, _) =>
      p -> chosen.map(c => (c, cos(p, c))).maxBy { case (c, s) => (s, -c) }._1
    }.toMap
    val got = Similarity.sim_kcenter(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.size === emb.length)
    assert(got.filter(_._2._2).keySet === chosen.toSet, "exact center sequence")
    expectedCenter.foreach { case (p, c) =>
      assert(got(p)._1 === c, s"vec $p assigned center")
    }
  }

  // ----------------------------------------------------- text_bpe_train

  test("text_bpe_train equals a from-scratch 8-round Scala BPE trainer") {
    // independent recomputation: leftmost non-overlapping replace is
    // String.replace's exact contract, so the merge semantics match by
    // construction and only the counting/tiebreak/loop logic is under test
    var words = docs().flatMap { case (_, text, _) =>
      "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
    }.filter(_.length >= 2)
    val expected = Seq.newBuilder[(Int, String, Long)]
    (1 to TextAnalysis.BpeTrainRounds).foreach { r =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { w =>
        var i = 0
        while (i < w.length - 1) {
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
          i += 1
        }
      }
      val (winner, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      expected += ((r, winner, n))
      // winner elimination: after the merge, the winner pair never survives
      if (r < TextAnalysis.BpeTrainRounds) {
        val marker = ('0' + (r - 1)).toChar.toString
        words = words.map(_.replace(winner, marker)).filter(_.length >= 2)
        words.foreach(w => assert(!w.contains(winner),
          s"round $r winner '$winner' survived its own merge in '$w'"))
      }
    }
    val got = TextAnalysis.text_bpe_train(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === expected.result())
  }

  // -------------------------------------------------- dedup_exact_substr

  test("dedup_exact_substr equals a from-scratch duplicated-span recompute") {
    val L = 50
    val norm = docs().map { case (id, text, _) =>
      id -> text.trim.replaceAll("\\s+", " ")
    }
    // corpus-wide window occurrence counts (window TEXT, not the hash: if
    // the 60-bit hashes collided differently than the strings, this fails)
    val occ = scala.collection.mutable.Map.empty[String, Int]
    norm.foreach { case (_, t) =>
      (1 to t.length - L + 1).foreach { p =>
        val w = t.substring(p - 1, p - 1 + L)
        occ(w) = occ.getOrElse(w, 0) + 1
      }
    }
    val expected = norm.map { case (id, t) =>
      val dupPos = (1 to t.length - L + 1)
        .filter(p => occ(t.substring(p - 1, p - 1 + L)) >= 2)
      var spans = Vector.empty[(Int, Int)] // (start, end) inclusive
      dupPos.foreach { p =>
        spans match {
          case init :+ ((s0, e0)) if p <= e0 + 1 => // overlap or touching
            if (p + L - 1 > e0) spans = init :+ (s0, p + L - 1)
          case _ => spans = spans :+ (p, p + L - 1)
        }
      }
      id -> (t.length.toLong, spans.size.toLong,
        spans.map { case (s0, e0) => (e0 - s0 + 1).toLong }.sum,
        spans.headOption.map(_._1.toLong).getOrElse(0L))
    }.toMap
    val got = Dedup.dedup_exact_substr(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) === e, s"doc $id (n_chars, n_spans, dup_chars, first_start)")
    }
    // the fixture must actually exercise the operator both ways
    assert(expected.values.exists(_._2 > 0L), "no duplicated spans in fixture")
    assert(expected.values.exists(_._2 === 0L), "no clean docs in fixture")
  }

  test("dedup_substr_clean cuts exactly the recomputed spans") {
    val L = 50
    val norm = docs().map { case (id, text, _) =>
      id -> text.trim.replaceAll("\\s+", " ")
    }
    val occ = scala.collection.mutable.Map.empty[String, Int]
    norm.foreach { case (_, t) =>
      (1 to t.length - L + 1).foreach { p =>
        val w = t.substring(p - 1, p - 1 + L)
        occ(w) = occ.getOrElse(w, 0) + 1
      }
    }
    val expected = norm.map { case (id, t) =>
      val dupPos = (1 to t.length - L + 1)
        .filter(p => occ(t.substring(p - 1, p - 1 + L)) >= 2)
      var spans = Vector.empty[(Int, Int)]
      dupPos.foreach { p =>
        spans match {
          case init :+ ((s0, e0)) if p <= e0 + 1 =>
            if (p + L - 1 > e0) spans = init :+ (s0, p + L - 1)
          case _ => spans = spans :+ (p, p + L - 1)
        }
      }
      // cut the spans (1-based inclusive) out of t
      val keep = new StringBuilder
      var cur = 1
      spans.foreach { case (s0, e0) =>
        if (s0 > cur) keep.append(t.substring(cur - 1, s0 - 1))
        cur = e0 + 1
      }
      if (cur <= t.length) keep.append(t.substring(cur - 1))
      id -> keep.toString
    }.toMap
    val got = Dedup.dedup_substr_clean(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, txt) =>
      assert(got(id)._1 === txt, s"doc $id cleaned text")
      assert(got(id)._2 === txt.length.toLong, s"doc $id n_chars_clean")
    }
  }

  // --------------------------------------------------- text_pmi_bigrams

  test("text_pmi_bigrams equals a driver-side PMI recomputation") {
    val bc = scala.collection.mutable.Map.empty[(String, String), Long]
    docs().foreach { case (_, text, _) =>
      val t = toks(text)
      if (t.length >= 2) t.sliding(2).foreach { p =>
        bc((p(0), p(1))) = bc.getOrElse((p(0), p(1)), 0L) + 1L
      }
    }
    val nx = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ny = bc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = bc.values.sum
    val expected = bc.collect { case ((x, y), nxy) if nxy >= 4 =>
      (x, y) -> ((nxy, nx(x), ny(y),
        (nxy.toDouble * nn.toDouble) / (nx(x).toDouble * ny(y).toDouble)))
    }.toMap
    val got = TextAnalysis.text_pmi_bigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) === v, s"bigram $k") }
  }

  // ------------------------------------------------------ sim_triangles

  test("sim_triangles equals a driver-side triangle census of the kNN graph") {
    // the graph itself is gate-verified (sim_knn_graph); this pins the
    // symmetrize + wedge-close + coefficient kernel against a brute recount
    val edges = Similarity.sim_knn_graph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.map { case (s0, d) => (math.min(s0, d), math.max(s0, d)) }.distinct
    val undSet = und.toSet
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triOf = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (a, b) <- und
      c <- adj(b) if b < c && undSet.contains((a, c)) && a < b
    } Seq(a, b, c).foreach(v => triOf(v) = triOf.getOrElse(v, 0L) + 1L)
    val expected = adj.map { case (v, ns) =>
      val d = ns.size.toLong
      val t = triOf.getOrElse(v, 0L)
      v -> ((d, t, if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L))
    }
    val got = Similarity.sim_triangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (v, e) => assert(got(v) === e, s"node $v") }
  }

  // --------------------------------------------- sim_label_separability

  test("sim_label_separability equals a driver-side exact-integer recomputation") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong).toArray))
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    case class St(n: Long, cv: Array[Long], varnum: Long)
    val per = byLabel.map { case (l, vs) =>
      val dim = vs.head.length
      val cv = Array.fill(dim)(0L)
      var s2 = 0L
      vs.foreach { v =>
        var i = 0
        while (i < dim) { cv(i) += v(i); s2 += v(i) * v(i); i += 1 }
      }
      l -> St(vs.length.toLong, cv, vs.length * s2 - cv.map(x => x * x).sum)
    }
    val expected = (for {
      (la, a) <- per; (lb, b) <- per if la < lb
    } yield {
      val between = a.cv.zip(b.cv)
        .map { case (x, y) => val d = b.n * x - a.n * y; d * d }.sum
      val denom = b.n * b.n * a.varnum + a.n * a.n * b.varnum
      (la, lb) -> ((a.n, b.n, a.varnum, b.varnum, between,
        between.toDouble / denom.toDouble))
    }).toMap
    val got = Similarity.sim_label_separability(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"pair $k") }
  }

  // ---------------------------------------------- sim_knn_label_purity

  test("sim_knn_label_purity equals a driver-side recount over the kNN graph") {
    val lab = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = Similarity.sim_knn_graph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = edges.groupBy { case (s0, _) => lab(s0) }.map { case (l, es) =>
      val same = es.count { case (a, b) => lab(a) == lab(b) }.toLong
      l -> ((es.length.toLong, same, 1000000L * same / es.length))
    }
    val got = Similarity.sim_knn_label_purity(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (l, e) => assert(got(l) === e, s"label $l") }
  }

  // --------------------------------------------------- mm_audio_dedup

  test("mm_audio_dedup equals a driver-side fine-window fingerprint recount") {
    // the WAV data chunk IS the text bytes, so the fingerprint recomputes
    // from the text directly (the oracle's formulation)
    val win = 8
    val fps = docs().map { case (id, text, _) =>
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val len = bytes.length
      val nw = math.max(1, (len + win - 1) / win)
      def winSum(w: Int): Long =
        (w * win until math.min((w + 1) * win, len)).map(bytes(_).toLong).sum
      val afp = (0 until math.min(nw - 1, 60).toInt)
        .foldLeft(0L)((acc, w) => if (winSum(w) > winSum(w + 1)) acc | (1L << w) else acc)
      (id, nw.toLong, afp)
    }
    val expected = (for {
      (a, nwa, fa) <- fps; (b, nwb, fb) <- fps
      if a < b && nwa == nwb
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b) -> h).toMap
    val got = Multimodal.mm_audio_dedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, h) => assert(got(k) === h, s"pair $k") }
  }

  // --------------------------------------------------- pipe_mix_apply

  test("pipe_mix_apply equals a driver-side rate-derivation + hash-keep recompute") {
    val d = docs().map { case (id, text, lang) => (id, lang, toks(text).length.toLong) }
    val perLang = d.groupBy(_._2).view.mapValues(v =>
      (v.size.toLong, v.map(_._3).sum)).toMap
    val minTok = perLang.values.map(_._2).min
    val rates = perLang.view.mapValues { case (n, t) => (n, minTok * 1000 / t) }.toMap
    val expected = d.groupBy(_._2).flatMap { case (lang, v) =>
      val (nDocs, pm) = rates(lang)
      val kept = v.filter { case (id, _, _) => h60(s"mix:$id") % 1000 < pm }
      if (kept.isEmpty) None
      else Some(lang -> ((nDocs, pm, kept.size.toLong, kept.map(_._3).sum)))
    }
    val got = Pipeline.pipe_mix_apply(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (l, e) => assert(got(l) === e, s"lang $l") }
  }

  // ----------------------------------------------- pipe_epoch_shuffle

  test("pipe_epoch_shuffle equals a driver-side seeded-hash rank recompute") {
    val ids = docs().map(_._1)
    val expected = (for (epoch <- 0 until 2) yield {
      val keyed = ids.map(id => (id, h60(s"ep:$epoch:$id"))).sortBy { case (id, k) => (k, id) }
      keyed.zipWithIndex.map { case ((id, _), ord) => (epoch, id) -> ord.toLong }
    }).flatten.toMap
    val got = Pipeline.pipe_epoch_shuffle(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // the two epochs must actually permute differently (seeded independence)
    val e0 = expected.collect { case ((0, id), o) => id -> o }
    val e1 = expected.collect { case ((1, id), o) => id -> o }.toMap
    assert(e0.exists { case (id, o) => e1(id) != o })
  }

  // ---------------------------------------- pipe_decontaminate_semantic

  test("pipe_decontaminate_semantic equals a driver-side cosine-threshold recompute") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = (for {
      (te, tv) <- vecs if te % 20 != 0
      (ee, ev) <- vecs if ee % 20 == 0
      d = dot(ev, tv) // query-side first, matching VecDot.dot(qe, embedding)
      if d > 0 && d * d >= 0.16 * dot(tv, tv) * dot(ev, ev)
    } yield (te, ee)).toSet
    val got = Pipeline.pipe_decontaminate_semantic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  // ---------------------------------------------- dedup_source_overlap

  test("dedup_source_overlap equals a driver-side shingle-set recomputation") {
    val bySource = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def shingles(text: String): Set[Long] = {
      val t = toks(text)
      val raw = if (t.length < 3) Seq(text.trim)
        else t.sliding(3).map(_.mkString(" ")).toSeq
      raw.map(h60).toSet
    }
    val sets0 = bySource.view.mapValues(_.flatMap(shingles).toSet).toMap
    val srcCount = sets0.values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size).toMap
    val sets = sets0.view.mapValues(_.filter(srcCount(_) <= 10)).toMap
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa & sb).size.toLong if common > 0
    } yield (a, b) -> ((sa.size.toLong, sb.size.toLong, common,
      1000000L * common / sa.size, 1000000L * common / sb.size))).toMap
    val got = Dedup.dedup_source_overlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"pair $k") }
  }

  // ------------------------------------------------------ text_fertility

  test("text_fertility equals a driver-side per-(lang,source) recomputation") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = rows.groupBy(r => (r._1, r._2)).map { case (k, ds) =>
      val nDocs = ds.length.toLong
      val sumToks = ds.map(d => toks(d._3).length.toLong).sum
      val sumChars = ds.map(_._3.length.toLong).sum
      val sumTokChars = ds.map(d => toks(d._3).map(_.length.toLong).sum).sum
      k -> ((nDocs, sumToks, sumChars, sumTokChars,
        1000L * sumToks / sumChars, 1000L * sumTokChars / sumToks))
    }
    val got = TextAnalysis.text_fertility(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"slice $k") }
  }

  // ------------------------------------------------- pipe_shard_manifest

  test("pipe_shard_manifest equals a driver-side hash-shard recompute") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val perDoc = rows.map { case (id, nc, text) =>
      val h = h60(s"shard:$id")
      (h % 32, id, nc, toks(text).length.toLong, h)
    }
    val expected = perDoc.groupBy(_._1).map { case (shard, ds) =>
      shard -> ((ds.length.toLong, ds.map(_._4).sum, ds.map(_._3).sum,
        ds.map(_._2).min, ds.map(_._2).max,
        ds.map(_._5).reduce(_ ^ _),
        (ds.map(d => BigInt(d._5)).sum mod BigInt(2305843009213693952L)).toLong))
    }
    val got = Pipeline.pipe_shard_manifest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"shard $k") }
  }

  // ------------------------------------------------- pipe_length_buckets

  test("pipe_length_buckets equals a driver-side log2-histogram recompute") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1)).length.toLong))
    val byBucket = rows.groupBy { case (lang, n) =>
      (lang, 63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L)))
    }
    val langToks = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = byBucket.map { case ((lang, bkt), ds) =>
      val bt = ds.map(_._2).sum
      (lang, bkt) -> ((ds.size.toLong, bt, 1000000L * bt / langToks(lang)))
    }
    val got = Pipeline.pipe_length_buckets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"bucket $k") }
  }
}
