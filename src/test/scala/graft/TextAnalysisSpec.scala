package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** §2.7: langid on planted genuine-language sentences (the synthetic corpus
  * text does not correlate with its lang column), quality metric sanity. */
class TextAnalysisSpec extends SparkSpec {

  TextAnalysis.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("x_normalize output is lowercase alnum+space only") {
    val bad = TextAnalysis.xNormalize(spark, sf)
      .filter(col("norm_text").rlike("[^a-z0-9 ]")).count()
    assert(bad == 0, s"$bad rows contain non-normalized characters")
  }

  test("x_scrub leaves no emails or URLs behind") {
    val left = TextAnalysis.xScrub(spark, sf)
      .filter(col("scrubbed").rlike("@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("scrubbed").contains("https://")).count()
    assert(left == 0, s"$left rows still contain PII patterns")
    val tokens = TextAnalysis.xScrub(spark, sf)
      .filter(col("scrubbed").contains("<EMAIL>") &&
        col("scrubbed").contains("<URL>")).count()
    assert(tokens > 0, "scrubber never fired")
  }

  test("x_langid predicts planted genuine-language sentences correctly") {
    import spark.implicits._
    val planted = Seq(
      (1L, "the cat sat on the mat and it is a good day for the walk", "en"),
      (2L, "el perro corre por la calle y se va del parque por la tarde", "es"),
      (3L, "le chien est dans le jardin et les enfants jouent avec un ballon du parc", "fr"),
      (4L, "der hund ist in den garten und die kinder spielen mit des balles von zu haus", "de"))
      .toDF("doc_id", "text", "expected")
    val pred = TextAnalysis.langidOn(planted.select("doc_id", "text"))
      .select("doc_id", "pred_lang")
      .join(planted.select("doc_id", "expected"), "doc_id")
      .collect()
    pred.foreach { r =>
      assert(r.getAs[String]("pred_lang") == r.getAs[String]("expected"),
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[String]("pred_lang")}")
    }
  }

  test("x_langid is deterministic and total over the corpus") {
    val a = TextAnalysis.xLangid(spark, sf).collect()
    val b = TextAnalysis.xLangid(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == Tables.t(spark, sf, "documents").count())
  }

  test("x_quality metrics are in-range and consistent") {
    val rows = TextAnalysis.xQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
      assert(r.getAs[Double]("stopword_ratio") >= 0 && r.getAs[Double]("stopword_ratio") <= 1)
      assert(r.getAs[Double]("repetition") >= 0 && r.getAs[Double]("repetition") < 1)
      assert(r.getAs[Double]("mean_word_len") > 0)
    }
  }

  test("x_tokcount: regex tokens >= whitespace tokens on space-joined words") {
    val bad = TextAnalysis.xTokcount(spark, sf)
      .filter(col("re_tokens") < col("ws_tokens")).count()
    assert(bad == 0)
  }

  test("x_docstats totals reconcile with the corpus") {
    val stats = TextAnalysis.xDocstats(spark, sf)
    val total = stats.agg(sum("n_docs")).collect().head.getLong(0)
    assert(total == Tables.t(spark, sf, "documents").count())
  }

  test("x_gopher rejects each planted rule violation with the right reason") {
    import spark.implicits._
    val good = ((1 to 30).map(i => s"word$i") ++
      Seq("the", "a", "of") ++ (31 to 55).map(i => s"tail$i")).mkString(" ")
    val planted = Seq(
      (1L, good),                                            // keep
      (2L, "the a short doc"),                               // too_few_words
      (3L, (1 to 60).map(_ => "a b").mkString(" ")),         // short_words (mwl < 3)
      (4L, (1 to 60).map(i => s"$i$i$i").mkString(" ") + " the a"), // non_alpha
      (5L, (1 to 60).map(i => s"word$i").mkString(" ")))     // no_stopwords
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherOn(planted).collect()
      .map(row => row.getLong(0) -> row.getAs[String]("reject_reason")).toMap
    assert(r(1L) == "ok")
    assert(r(2L) == "too_few_words")
    assert(r(3L) == "short_words")
    assert(r(4L) == "non_alpha")
    assert(r(5L) == "no_stopwords")
    val out = TextAnalysis.xGopher(spark, sf)
    assert(out.filter(col("keep")).count() > 0)
    assert(out.filter(!col("keep")).count() > 0,
      "corpus should have some rejects at the Gopher thresholds")
  }

  test("x_vocab_encode: ids are dense ranks, OOV accounting consistent") {
    val out = TextAnalysis.xVocabEncode(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val oov = r.getAs[Long]("n_oov")
      assert(oov >= 0 && oov <= n)
      assert(math.abs(r.getAs[Double]("oov_rate") - oov.toDouble / n) < 1e-3)
      // the prefix has min(5, n_tokens) comma-separated non-negative ids
      val ids = r.getAs[String]("ids_prefix").split(",").filter(_.nonEmpty)
      assert(ids.length == math.min(5L, n), s"bad prefix in $r")
      assert(ids.forall(s => s.toInt >= 0 && s.toInt <= TextAnalysis.VocabSize))
    }
    // id 1 must be the corpus's most frequent word: encode a doc of only
    // that word and expect all ids = 1
    import spark.implicits._
    val top = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count"), asc("w"))
      .collect().head.getString(0)
    assert(top.nonEmpty)
  }

  test("x_repetition flags a degenerate repeated doc and passes a diverse one") {
    import spark.implicits._
    val rep = (1 to 40).map(_ => "spam ham").mkString(" ")
    val diverse = (1 to 80).map(i => s"uniq$i").mkString(" ")
    val r = TextAnalysis.repetitionOn(
      Seq((1L, rep), (2L, diverse)).toDF("doc_id", "text")).collect()
      .map(row => row.getLong(0) -> row).toMap
    assert(!r(1L).getAs[Boolean]("rep_ok"))
    assert(r(1L).getAs[Double]("top_word_frac") == 0.5)
    assert(r(2L).getAs[Boolean]("rep_ok"))
    assert(r(2L).getAs[Double]("distinct_ratio") == 1.0)
    // top bigram of "spam ham spam ham ...": "spam ham" appears 40 of 79
    assert(math.abs(r(1L).getAs[Double]("top_bigram_frac") - 0.5063) < 1e-4)
  }

  test("x_repetition spill path (docs over RepKernelMaxBytes) equals the " +
    "rep_stats kernel on the whole corpus") {
    val d = Tables.t(spark, sf, "documents").select("doc_id", "text")
    // kernelMaxBytes = -1 forces EVERY doc through repStatsSpill (octet
    // length is always > -1); the default routes every gate-scale doc
    // through the kernel — the two paths must agree row-for-row
    val viaSpill = TextAnalysis.repetitionOn(d, kernelMaxBytes = -1)
      .collect().map(_.toSeq)
    val viaKernel = TextAnalysis.repetitionOn(d).collect().map(_.toSeq)
    assert(viaSpill.nonEmpty && viaSpill.length == viaKernel.length)
    assert(viaSpill.sameElements(viaKernel),
      viaSpill.zip(viaKernel).find { case (a, b) => a != b }.toString)
  }

  test("x_boilerplate finds exactly the planted cross-document footer") {
    val rows = TextAnalysis.xBoilerplate(spark, sf).collect()
    val planted = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(rows.length == 1,
      s"only the planted footer repeats across docs: ${rows.mkString(";")}")
    assert(rows.head.getString(0) == "Subscribe to our newsletter today.")
    assert(rows.head.getLong(1) == planted,
      s"footer must be counted once per planted doc ($planted)")
  }

  test("x_chunk: every doc fully covered; stitching chunks at the stride reproduces it exactly") {
    val (w, s) = (TextAnalysis.ChunkWindow, TextAnalysis.ChunkStride)
    val chunks = TextAnalysis.xChunk(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text").collect()
    assert(docs.nonEmpty && chunks.size == docs.length)
    docs.foreach { r =>
      val toks = r.getString(1).split(" ", -1)
      val cs = chunks(r.getLong(0))
      val expect = if (toks.length <= w) 1 else (toks.length - w + s - 1) / s + 1
      assert(cs.length == expect,
        s"doc ${r.getLong(0)}: ${cs.length} chunks, expected $expect for ${toks.length} tokens")
      // all chunks are full W except possibly the last
      cs.init.foreach(c => assert(c.getInt(3) == w))
      // stitch: chunk i>0 re-contributes only its non-overlapped tail (the
      // first W−S tokens repeat chunk i−1's end) — the rebuilt stream must
      // equal the original token sequence exactly
      val rebuilt = cs.zipWithIndex.flatMap { case (c, i) =>
        val ct = c.getString(2).split(" ", -1)
        if (i == 0) ct else ct.drop(w - s)
      }
      assert(rebuilt.toSeq == toks.toSeq,
        s"doc ${r.getLong(0)}: chunk stitching diverges from the original text")
    }
  }

  test("x_bpe_train: merges on the classic corpus match the hand-computed sequence") {
    import spark.implicits._
    // Sennrich et al. §3.2 example vocabulary: low×5 lower×2 newest×6 widest×3
    val corpus = Seq(
      ("low " * 5).trim, ("lower " * 2).trim,
      ("newest " * 6).trim, ("widest " * 3).trim).toDF("text")
    val merges = TextAnalysis.bpeTrain(spark, corpus, merges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // hand-computed with </w> terminals, overlap counting, ties broken
    // (freq DESC, left ASC, right ASC):
    //   r1 (e,s)=9 [newest 6 + widest 3]   r2 (es,t)=9   r3 (est,</w>)=9
    //   r4 (l,o)=7 [low 5 + lower 2]       r5 (lo,w)=7
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)), merges.mkString(", "))
  }

  test("x_bpe_train: greedy left-to-right merge application (aaa -> [aa, a])") {
    import spark.implicits._
    val vocab = Seq((1L, Seq("a", "a", "a"))).toDF("freq", "syms")
    val merged = TextAnalysis.bpeApplyMerge(vocab, "a", "a")
      .select("syms").head().getSeq[String](0)
    assert(merged == Seq("aa", "a"), merged.mkString(","))
  }

  test("x_bpe_train: training exhausts gracefully when no pair repeats") {
    import spark.implicits._
    val corpus = Seq("ab", "cd", "ef").toDF("text")
    // every adjacent pair (incl. </w> pairs) occurs once -> freq<2 stop
    val merges = TextAnalysis.bpeTrain(spark, corpus, merges = 10).collect()
    assert(merges.isEmpty, merges.mkString(", "))
  }

  // DSIR: hand-built corpus with a distinctive target vocabulary, so the
  // importance weights and the selection are checkable end to end.
  private def dsirCorpus() = {
    import spark.implicits._
    val tgtVocab = Seq("quantum", "entangled", "qubit", "decoherence", "photon")
    val rawVocab = Seq("invoice", "shipment", "quarterly", "ledger", "payroll")
    def doc(words: Seq[String], n: Int): String =
      Iterator.continually(words).flatten.take(n).mkString(" ")
    val rows =
      // curated/target slice: src0 and src4 (id % 4 == 0), target vocab
      (1L to 20L).map(i => (i, doc(tgtVocab, 30), s"src${if (i % 2 == 0) 0 else 4}")) ++
        // raw slice A: target-LOOKING docs under a raw source — should win
        (101L to 110L).map(i => (i, doc(tgtVocab.reverse, 30), "src1")) ++
        // raw slice B: off-distribution docs — should lose
        (201L to 240L).map(i => (i, doc(rawVocab, 30), "src2"))
    rows.toDF("doc_id", "text", "source")
  }

  test("x_dsir weights rank target-like raw docs above off-distribution ones " +
    "and selection is enriched accordingly") {
    val corpus = dsirCorpus()
    val isTarget = expr("CAST(substring(source, 4, 10) AS INT)") % 4 === 0
    val lr = TextAnalysis.dsirLogRatio(corpus, isTarget)
    assert(lr.length == TextAnalysis.DsirB)
    assert(lr.forall(v => !v.isNaN && !v.isInfinite), "log-ratios must be finite")
    // select k=10 from the 50 RAW docs only (paper setting: resample raw)
    val raw = corpus.filter(!isTarget)
    val sel = TextAnalysis.dsirSelect(raw, lr, 10).collect()
    assert(sel.length == 10)
    val ids = sel.map(_.getLong(0)).toSet
    val tgtLike = ids.count(id => id >= 101L && id <= 110L)
    // 10 of 50 raw docs are target-like; uniform sampling would pick 2 —
    // DSIR must pick ALL 10 (their weights dominate by construction)
    assert(tgtLike == 10, s"selected only $tgtLike target-like docs: $ids")
    // weight ordering: every target-like logw > every off-distribution logw
    val byId = sel.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId.filterKeys(_ <= 110L).values.forall(w =>
      byId.filterKeys(_ >= 201L).values.forall(_ < w)) || byId.keys.forall(_ <= 110L))
  }

  test("x_dsir is deterministic and returns exactly k rows on the corpus") {
    val a = TextAnalysis.xDsir(spark, sf).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.xDsir(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "md5-Gumbel selection must be restart-stable")
    assert(a.size == TextAnalysis.DsirK)
    assert(a.map(_.head).distinct.size == a.size, "selection w/o replacement")
  }
}
