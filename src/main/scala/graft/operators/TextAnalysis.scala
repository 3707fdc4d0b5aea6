package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over `documents` (SURVEY.md §2.7): language ID,
  * quality scoring, token counting, corpus stats — the pre-training data
  * hygiene layer.
  *
  * All metrics are pure Catalyst expressions (split / filter / transform /
  * aggregate / regexp_count) — codegen'd, embarrassingly parallel, zero
  * shuffles except the final per-source aggregate in x_docstats. At 100 TB
  * these run at scan speed; no UDF, no Python.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")

  // --------------------------------------------------------------- x_langid
  /** Function-word profiles (top stopwords per language). */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "se", "del", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "ist", "des"))

  /** Stopword-hit fraction for one language profile, via the native
    * `stopword_hits` kernel (the round-1 filter+array_contains HOF ran
    * interpreted per row). */
  private def profileScore(lowerText: Column, words: Column, profile: Seq[String]): Column =
    round(call_function("stopword_hits", lowerText, lit(profile.mkString(",")))
      .cast("double") / size(words), 4)

  /** Language-ID scoring. Predicted language = argmax profile score with
    * 'und' (undetermined) when no profile scores above the floor. Applied to
    * any (doc_id, text[, lang]) frame — the planted-sentence spec reuses it. */
  def langidOn(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    val words = split(lower(col("text")), " ")
    // presentation sort BELOW the scoring kernels (round 17, guide §1/§2.4):
    // a trailing orderBy makes the range partitioner SAMPLE its child, so
    // every expression above the sort runs twice — once for the boundary
    // sample, once for real (round-17 profile: two back-to-back kernel
    // stage jobs per x_* entry). Sorting the raw (doc_id, text) rows first
    // and projecting above keeps the output order identical (narrow
    // projections preserve range-partitioned order) while the kernels run
    // ONCE; at 100 TB that halves corpus compute for every ordered narrow
    // output. Same pattern across the x_* family.
    val scored = d.orderBy("doc_id").withColumn("words", words)
      .filter(size(col("words")) > 0)
    val scoreCols = Profiles.map { case (l, p) =>
      profileScore(lower(col("text")), col("words"), p).as(s"score_$l") }
    val best = Profiles.map { case (l, _) =>
      struct(col(s"score_$l").as("s"), lit(l).as("l"))
    }.reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.select(Seq(col("doc_id")) ++ scoreCols: _*)
      .withColumn("pred_lang",
        when(best.getField("s") > 0.02, best.getField("l")).otherwise(lit("und")))
  }

  /** Rows-only (heuristic); TextAnalysisSpec plants genuine-language
    * sentences and asserts correct predictions + determinism. */
  def xLangid(spark: SparkSession, dir: String): DataFrame =
    langidOn(docs(spark, dir).select("doc_id", "text"))

  // -------------------------------------------------------------- x_quality
  /** Quality metrics: length, punctuation ratio, stopword ratio, mean word
    * length, repetition (1 - type/token ratio), composite score. */
  def xQuality(spark: SparkSession, dir: String): DataFrame =
    qualityOn(docs(spark, dir))

  /** The quality pass over any (doc_id, text) frame — graft.api.TextApi's
    * entry point; the gate entry above is this core on the driver corpus. */
  def qualityOn(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    val words = split(col("text"), " ")
    // orderBy below the kernels — see langidOn (the range-sample pass
    // otherwise re-runs every metric expression)
    d.orderBy("doc_id")
      .withColumn("words", words)
      .filter(size(col("words")) > 0)
      .select(
        col("doc_id"),
        length(col("text")).as("len"),
        size(col("words")).as("n_words"),
        // sum(len(word)) over a single-char split is ALWAYS
        // len(text) − (n_words − 1): pure arithmetic replaces the round-1
        // aggregate(transform(...)) HOF chain (interpreted per row)
        round((length(col("text")) - size(col("words")) + 1).cast("double") /
          size(col("words")), 4).as("mean_word_len"),
        round(regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") /
          length(col("text")), 4).as("punct_ratio"),
        round(call_function("stopword_hits", col("text"),
            lit(Profiles.head._2.mkString(","))).cast("double") /
          size(col("words")), 4).as("stopword_ratio"),
        round(lit(1.0) - size(array_distinct(col("words"))).cast("double") /
          size(col("words")), 4).as("repetition"))
  }

  val xQualitySql: String = {
    val en = Profiles.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id,
       |  length(text) AS len,
       |  len(string_split(text, ' ')) AS n_words,
       |  round(CAST(list_aggregate(list_transform(string_split(text, ' '),
       |    w -> length(w)), 'sum') AS DOUBLE)
       |    / len(string_split(text, ' ')), 4) AS mean_word_len,
       |  round(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
       |    / length(text), 4) AS punct_ratio,
       |  round(CAST(len(list_filter(string_split(text, ' '),
       |    w -> list_contains($en, w))) AS DOUBLE)
       |    / len(string_split(text, ' ')), 4) AS stopword_ratio,
       |  round(1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / len(string_split(text, ' ')), 4) AS repetition
       |FROM documents
       |WHERE len(string_split(text, ' ')) > 0
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- x_tokcount
  /** Token counting: whitespace tokens, BPE-ish regex tokens (word pieces +
    * standalone punctuation), characters. */
  def xTokcount(spark: SparkSession, dir: String): DataFrame =
    tokcountOn(docs(spark, dir))

  /** Token counting over any (doc_id, text) frame. */
  def tokcountOn(d: DataFrame): DataFrame =
    // orderBy below the projection — see langidOn
    d.orderBy("doc_id")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]+|[^a-z0-9\\s]")).as("re_tokens"),
        length(col("text")).as("chars"))

  val xTokcountSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS re_tokens,
      |  length(text) AS chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- x_docstats
  /** Per-source corpus statistics — the single aggregating query of the
    * family (one partial-aggregated shuffle on `source`). */
  def xDocstats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        round(avg("n_chars"), 2).as("avg_chars"),
        countDistinct("lang").as("n_langs"),
        round(avg(size(split(col("text"), " "))), 2).as("avg_ws_tokens"))
      .orderBy("source")

  val xDocstatsSql: String =
    """SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  round(avg(n_chars), 2) AS avg_chars,
      |  count(DISTINCT lang) AS n_langs,
      |  round(avg(len(string_split(text, ' '))), 2) AS avg_ws_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------- x_normalize
  /** Canonical text normalization — the first stage of every training-data
    * pipeline: lowercase, strip non-alphanumerics, collapse whitespace.
    * Pure narrow codegen'd regexps; identical regex dialect in DuckDB so the
    * whole transform is hash-checked. */
  def xNormalize(spark: SparkSession, dir: String): DataFrame =
    normalizeOn(docs(spark, dir))

  /** Text normalization over any (doc_id, text) frame. */
  def normalizeOn(d: DataFrame): DataFrame =
    // orderBy below the regexp chain — see langidOn
    d.orderBy("doc_id")
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9\\s]", ""), "\\s+", " ")).as("norm_text"))

  val xNormalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm_text
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x_scrub
  /** PII scrubbing: emails and URLs replaced with placeholder tokens. The
    * corpus is synthetic, so each doc gets a deterministic synthetic email +
    * URL prepended (same injection in the oracle) — the scrubber must
    * remove exactly those. */
  def xScrub(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      lit("contact user"), col("doc_id"), lit("@example.com or https://ex"),
      col("doc_id"), lit(".org/a?b=1 "), col("text"))
    scrubOn(docs(spark, dir).select(col("doc_id"), injected.as("text")))
  }

  /** Email/URL scrubbing over any (doc_id, text) frame (the gate entry is
    * this core on the synthetic-injection corpus). */
  def scrubOn(d: DataFrame): DataFrame =
    // orderBy below the regexp chain — see langidOn
    d.orderBy("doc_id")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "https?://[^\\s]+", "<URL>").as("scrubbed"))

  val xScrubSql: String =
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(
      |    'contact user' || doc_id || '@example.com or https://ex' || doc_id
      |      || '.org/a?b=1 ' || text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    'https?://[^\s]+', '<URL>', 'g') AS scrubbed
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ x_pii
  /** Structured PII redaction with a per-category audit trail — the
    * compliance pass a shipped corpus runs after x_scrub's email/URL sweep:
    * phone numbers, IPv4 addresses, and 13–16-digit card-like runs each
    * get their own placeholder AND a per-document count (the redaction
    * report a governance review asks for — "what was removed, how much,
    * from where"). The corpus is synthetic, so each doc gets deterministic
    * doc_id-derived PII of all three kinds injected (same injection in the
    * oracle); the scrubber must account for exactly those plus any natural
    * matches. Patterns live in the Java∩RE2 dialect subset (no lookaround,
    * no backrefs) so both engines match identically. Card runs first so a
    * later pattern never sees partial card digits; counts are measured on
    * the pristine injected text. Narrow regexp projection fused into the
    * scan — zero shuffle, codegen'd. */
  def xPii(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(
      lit("tel 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
      lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), col("doc_id") % 256, lit("."),
      expr("doc_id div 7") % 256, lit(".1 card 4111 1111 1111 1111 "),
      col("text"))
    redactOn(docs(spark, dir).select(col("doc_id"), injected.as("text")))
  }

  /** Structured PII redaction + audit counts over any (doc_id, text)
    * frame (the gate entry is this core on the synthetic-injection
    * corpus). Card runs first so later patterns never see partial card
    * digits; counts are measured on the pristine text. */
  def redactOn(d: DataFrame): DataFrame = {
    val phonePat = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
    val ipPat = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    val cardPat = "\\b(?:\\d[ -]?){13,16}\\b"
    // orderBy below the regexp passes — see langidOn
    d.orderBy("doc_id")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(phonePat)).as("n_phone"),
        regexp_count(col("text"), lit(ipPat)).as("n_ip"),
        regexp_count(col("text"), lit(cardPat)).as("n_card"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          cardPat, "<CARD>"), phonePat, "<PHONE>"), ipPat, "<IP>")
          .as("redacted"))
  }

  val xPiiSql: String =
    """WITH inj AS (SELECT doc_id,
      |  'tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
      |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |  ' from 10.' || (doc_id % 256) || '.' || ((doc_id // 7) % 256) ||
      |  '.1 card 4111 1111 1111 1111 ' || text AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INT) AS n_phone,
      |  CAST(len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ip,
      |  CAST(len(regexp_extract_all(t, '\b(?:\d[ -]?){13,16}\b')) AS INT) AS n_card,
      |  regexp_replace(regexp_replace(regexp_replace(t,
      |    '\b(?:\d[ -]?){13,16}\b', '<CARD>', 'g'),
      |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
      |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
      |FROM inj ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- x_readability
  /** Flesch reading-ease scoring — the classic document-difficulty signal
    * quality filters and curriculum builders both consume (Flesch 1948;
    * the C4/Gopher-era pipelines bucket on exactly this family): FRE =
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with the
    * standard vowel-group syllable estimate (runs of [aeiouy] in the
    * lowered text — the portable approximation every large-scale pipeline
    * uses, since true syllabification needs a dictionary). All three
    * counts are regexp_extract_all cardinalities in the Java∩RE2 subset;
    * sentences floor at 1 so headline-only docs don't divide by zero.
    * Narrow projection fused into the scan — zero shuffle. */
  def xReadability(spark: SparkSession, dir: String): DataFrame =
    readabilityOn(docs(spark, dir))

  /** Flesch reading-ease over any (doc_id, text) frame. */
  def readabilityOn(d: DataFrame): DataFrame = {
    val words = size(split(col("text"), " ")).cast("double")
    val sents = greatest(lit(1),
      size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))).cast("double")
    val sylls = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("double")
    // orderBy below the regexp counts — see langidOn
    d.orderBy("doc_id")
      .select(col("doc_id"),
        words.cast("int").as("n_words"),
        sents.cast("int").as("n_sents"),
        sylls.cast("int").as("n_sylls"),
        round(lit(206.835) - lit(1.015) * (words / sents)
          - lit(84.6) * (sylls / words), 4).as("fre"))
  }

  val xReadabilitySql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
      |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS INT) AS n_sents,
      |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INT) AS n_sylls,
      |  round(206.835
      |    - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
      |               / greatest(1, len(regexp_extract_all(text, '[.!?]'))))
      |    - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
      |              / len(string_split(text, ' '))), 4) AS fre
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ x_sentences
  /** Sentence segmentation stats: count + first sentence per doc. */
  def xSentences(spark: SparkSession, dir: String): DataFrame =
    sentencesOn(docs(spark, dir))

  /** Sentence stats over any (doc_id, text) frame. */
  def sentencesOn(d: DataFrame): DataFrame = {
    val sents = split(col("text"), "[.!?] ")
    // orderBy below the split — see langidOn
    d.orderBy("doc_id")
      .select(col("doc_id"),
        size(sents).as("n_sents"),
        element_at(sents, 1).as("first_sent"))
  }

  val xSentencesSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '[.!?] ')) AS INTEGER) AS n_sents,
      |  regexp_split_to_array(text, '[.!?] ')[1] AS first_sent
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- x_top_ngrams
  /** Corpus-level top-20 word bigrams — the classic n-gram frequency pass.
    * One explode + one partial-aggregated count shuffle + TakeOrdered; at
    * 100 TB the map-side combine collapses each partition to its distinct
    * bigrams before anything moves. */
  def xTopNgrams(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(split(col("text"), " ").as("ws"))
    d.select(explode(sequence(lit(1), size(col("ws")) - 1)).as("i"), col("ws"))
      .select(concat_ws(" ", element_at(col("ws"), col("i")),
        element_at(col("ws"), col("i") + 1)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bg"))
      .limit(20)
  }

  val xTopNgramsSql: String =
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |ex AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w),
      |pairs AS (SELECT ws[i] || ' ' || ws[i + 1] AS bg FROM ex)
      |SELECT bg, count(*) AS n FROM pairs
      |GROUP BY bg ORDER BY n DESC, bg LIMIT 20""".stripMargin

  // ----------------------------------------------------------- x_unigram_lp
  /** Unigram log-probability scoring — the perplexity-proxy quality filter
    * (CCNet-style): build the corpus unigram model, then score each doc by
    * its mean word log-probability; low scores flag gibberish/boilerplate.
    *
    * 100 TB shape: the model is ONE partial-aggregated count (words shrink
    * to a vocab-sized relation), the scoring join BROADCASTS the vocab —
    * the corpus explodes to words but never shuffles; per-doc mean is a
    * partial-aggregated groupBy on doc_id. OOV words get a -10.0 floor. */
  def xUnigramLp(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // total word count stays IN the plan (1-row broadcast over the tiny
    // vocab aggregate) — no driver-side action in the operator
    val counts = words.groupBy("w").agg(count(lit(1)).as("n"))
    val vocab = counts
      .crossJoin(broadcast(counts.agg(sum("n").cast("double").as("tot"))))
      .select(col("w"), log(col("n") / col("tot")).as("logp"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(round(avg(coalesce(col("logp"), lit(-10.0))), 4).as("mean_logp"),
        count(lit(1)).as("n_scored"))
      .orderBy("doc_id")
  }

  val xUnigramLpSql: String =
    """WITH words AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |    FROM documents)
      |  WHERE length(w) > 0),
      |vocab AS (
      |  SELECT w, ln(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM words)) AS logp
      |  FROM words GROUP BY w)
      |SELECT doc_id,
      |       round(avg(coalesce(logp, -10.0)), 4) AS mean_logp,
      |       count(*) AS n_scored
      |FROM words LEFT JOIN vocab USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- x_gopher
  /** Gopher-style quality filter (Rae et al. 2021, "Scaling Language Models:
    * … Gopher", §A1.1 quality heuristics) adapted to this corpus: word-count
    * bounds, mean-word-length band, minimum fraction of words containing an
    * alphabetic character, minimum stopword hits. Emits the per-rule stats
    * AND the keep/reject decision with the first failing rule named — the
    * form a pipeline audits.
    *
    * The alpha-word count is codegen-portable without lambda HOFs: doubling
    * every delimiter first (' '→'  ') gives each token its own private
    * delimiters, so a non-overlapping regexp_count of ' [^a-z ]+ ' counts
    * alpha-free words exactly (adjacent matches no longer share the space).
    * One projection, no shuffle, no interpreted code. */
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinMwl = 3.0
  val GopherMaxMwl = 10.0
  val GopherMinAlphaFrac = 0.8
  val GopherMinStop = 2

  def xGopher(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    gopherOn(docs(spark, dir).select("doc_id", "text"))
  }

  /** Gopher scoring applied to any (doc_id, text) frame (spec plants
    * rule-violating docs through the same path). */
  def gopherOn(d: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val padded = concat(lit(" "), regexp_replace(col("text"), lit(" "), lit("  ")), lit(" "))
    // orderBy below the metric kernels — see langidOn
    d.orderBy("doc_id")
      .withColumn("words", words)
      .filter(size(col("words")) > 0)
      .select(
        col("doc_id"),
        size(col("words")).as("n_words"),
        round((length(col("text")) - size(col("words")) + 1).cast("double") /
          size(col("words")), 4).as("mean_word_len"),
        round((size(col("words")) -
            regexp_count(padded, lit(" [^a-z ]+ "))).cast("double") /
          size(col("words")), 4).as("alpha_frac"),
        call_function("stopword_hits", col("text"),
          lit(Profiles.head._2.mkString(","))).as("n_stop"))
      .withColumn("reject_reason",
        when(col("n_words") < GopherMinWords, "too_few_words")
          .when(col("n_words") > GopherMaxWords, "too_many_words")
          .when(col("mean_word_len") < GopherMinMwl, "short_words")
          .when(col("mean_word_len") > GopherMaxMwl, "long_words")
          .when(col("alpha_frac") < GopherMinAlphaFrac, "non_alpha")
          .when(col("n_stop") < GopherMinStop, "no_stopwords")
          .otherwise("ok"))
      .withColumn("keep", col("reject_reason") === "ok")
  }

  val xGopherSql: String = {
    val en = Profiles.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH b AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws,
       |         ' ' || regexp_replace(text, ' ', '  ', 'g') || ' ' AS padded
       |  FROM documents WHERE len(string_split(text, ' ')) > 0),
       |s AS (
       |  SELECT doc_id,
       |    len(ws) AS n_words,
       |    round(CAST(length(text) - len(ws) + 1 AS DOUBLE) / len(ws), 4)
       |      AS mean_word_len,
       |    round(CAST(len(ws) - len(regexp_extract_all(padded, ' [^a-z ]+ '))
       |      AS DOUBLE) / len(ws), 4) AS alpha_frac,
       |    len(list_filter(ws, w -> list_contains($en, w))) AS n_stop
       |  FROM b)
       |SELECT doc_id, n_words, mean_word_len, alpha_frac,
       |  CAST(n_stop AS INTEGER) AS n_stop,
       |  CASE WHEN n_words < $GopherMinWords THEN 'too_few_words'
       |       WHEN n_words > $GopherMaxWords THEN 'too_many_words'
       |       WHEN mean_word_len < $GopherMinMwl THEN 'short_words'
       |       WHEN mean_word_len > $GopherMaxMwl THEN 'long_words'
       |       WHEN alpha_frac < $GopherMinAlphaFrac THEN 'non_alpha'
       |       WHEN n_stop < $GopherMinStop THEN 'no_stopwords'
       |       ELSE 'ok' END AS reject_reason,
       |  (CASE WHEN n_words < $GopherMinWords THEN 'too_few_words'
       |       WHEN n_words > $GopherMaxWords THEN 'too_many_words'
       |       WHEN mean_word_len < $GopherMinMwl THEN 'short_words'
       |       WHEN mean_word_len > $GopherMaxMwl THEN 'long_words'
       |       WHEN alpha_frac < $GopherMinAlphaFrac THEN 'non_alpha'
       |       WHEN n_stop < $GopherMinStop THEN 'no_stopwords'
       |       ELSE 'ok' END) = 'ok' AS keep
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------- x_repetition
  /** Repetition detection (the Gopher/C4 dup-ngram family): per-doc distinct
    * ratio, most-frequent-word fraction, most-frequent-bigram fraction, and
    * the repetition keep flag. Spark shape (round 10): ONE narrow
    * projection — the native `rep_stats` kernel ([[graft.functions.RepStats]])
    * reduces each text to struct(n_words, n_distinct, top_word_c,
    * top_bigram_c) in a single byte pass inside whole-stage codegen, so the
    * operator has zero exchanges before the presentation sort at any corpus
    * size. (The previous explode → lead-window → two grouped counts shape
    * was partial-aggregated but its exploded-token sort went spill-bound at
    * the 1000× stress scale — BASELINE.md r10; per-document statistics
    * never needed a shuffle.) Oracle forms the same bigrams by list index
    * in DuckDB — unchanged, still hash-checks this plan. */
  val RepMaxTopWordFrac = 0.15
  val RepMaxTopBigramFrac = 0.10
  val RepMinDistinctRatio = 0.30

  /** Texts longer than this bypass the rep_stats kernel for the
    * spill-capable decomposition: the kernel's per-doc gram HashMaps are
    * O(distinct grams) ≈ O(doc bytes) of EXECUTOR HEAP inside one task
    * (ADVICE r10) — fine for web documents (64 MiB of text ⇒ a few hundred
    * MB transient, inside any executor slot) but a single pathological
    * multi-GB doc must not OOM the executor. Above the line, the explode/
    * groupBy shape spills to disk instead. */
  val RepKernelMaxBytes: Int = 64 << 20

  def xRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOn(docs(spark, dir).select("doc_id", "text"))

  def repetitionOn(d: DataFrame): DataFrame =
    repetitionOn(d, RepKernelMaxBytes)

  def repetitionOn(d: DataFrame, kernelMaxBytes: Int): DataFrame = {
    // Round 10: previously posexplode → per-doc lead() window → two
    // (doc_id, gram) groupBys — correct and partial-aggregated, but the
    // exploded-token sort (50× the corpus row count) went disk-spill-bound
    // at the 1000× stress scale. The statistics are PER-DOCUMENT, so the
    // native rep_stats kernel reduces each text to four ints inside
    // whole-stage codegen and the operator is a narrow projection: zero
    // exchanges before the presentation sort, identical output (the DuckDB
    // oracle is unchanged and still hash-checks it). Docs over
    // [[RepKernelMaxBytes]] take the spill path ([[repStatsSpill]]) —
    // bounded kernel heap without changing any result; at gate scale the
    // branch is empty and AQE collapses it (the p_stratified guard
    // pattern).
    graft.functions.GraftFunctions.register(d.sparkSession)
    // n_words > 1 ⟺ the text contains a space (split-on-' ' yields
    // spaces+1 tokens) — filtering on instr BEFORE the kernel keeps the
    // predicate off rep_stats: spelling it s.n_words > 1 lets predicate
    // pushdown substitute the alias and re-evaluate the whole kernel per
    // row inside the scan filter (profiled 2× the kernel cost at the
    // 1000× stress scale).
    val base = d.filter(instr(col("text"), " ") > 0)
    val viaKernel = base.filter(octet_length(col("text")) <= kernelMaxBytes)
      .select(col("doc_id"), expr("rep_stats(text)").as("s"))
      .select(col("doc_id"), col("s.n_words").as("n_words"),
        col("s.n_distinct").as("n_distinct"),
        col("s.top_word_c").as("top_word_c"),
        col("s.top_bigram_c").as("top_bigram_c"))
    val viaSpill =
      repStatsSpill(base.filter(octet_length(col("text")) > kernelMaxBytes))
    viaKernel.unionAll(viaSpill)
      .select(col("doc_id"), col("n_words"),
        round(col("n_distinct").cast("double") / col("n_words"), 4)
          .as("distinct_ratio"),
        round(col("top_word_c").cast("double") / col("n_words"), 4)
          .as("top_word_frac"),
        round(col("top_bigram_c").cast("double") / (col("n_words") - 1), 4)
          .as("top_bigram_frac"))
      .withColumn("rep_ok",
        col("distinct_ratio") >= RepMinDistinctRatio &&
        col("top_word_frac") <= RepMaxTopWordFrac &&
        col("top_bigram_frac") <= RepMaxTopBigramFrac)
      .orderBy("doc_id")
  }

  /** The spill-capable rep-stats decomposition for oversized docs:
    * posexplode the tokens (split-on-single-space, empties included —
    * the kernel's exact tokenization), bigrams via a per-doc lead()
    * window, gram counts via partial-aggregated groupBys. ~50× more rows
    * in flight than the kernel, but every stage spills to disk — the
    * pre-r10 shape, kept as the escape hatch the kernel's per-doc heap
    * bound needs (ADVICE r10). TextAnalysisSpec forces the whole corpus
    * through this path and asserts equality with the kernel. */
  private[graft] def repStatsSpill(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"),
      posexplode(split(col("text"), " ", -1)).as(Seq("i", "w")))
    val wc = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").cast("int").as("n_words"),
        count(lit(1)).cast("int").as("n_distinct"),
        max("c").cast("int").as("top_word_c"))
    val byPos = Window.partitionBy("doc_id").orderBy("i")
    val bc = toks.withColumn("nx", lead("w", 1).over(byPos))
      .filter(col("nx").isNotNull)
      .select(col("doc_id"), concat(col("w"), lit(" "), col("nx")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").cast("int").as("top_bigram_c"))
    // the caller's instr-filter guarantees ≥2 tokens ⇒ ≥1 bigram per doc
    wc.join(bc, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        col("top_word_c"), col("top_bigram_c"))
  }

  val xRepetitionSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) > 1),
       |t AS (SELECT doc_id, ws,
       |        unnest(generate_series(1, len(ws))) AS i FROM b),
       |tok AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w,
       |          CASE WHEN i < len(ws)
       |               THEN ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i + 1 AS INTEGER)]
       |          END AS bg
       |        FROM t),
       |wc AS (SELECT doc_id, max(c) AS top_word_c FROM (
       |         SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2)
       |       GROUP BY doc_id),
       |bc AS (SELECT doc_id, max(c) AS top_bigram_c FROM (
       |         SELECT doc_id, bg, count(*) AS c FROM tok
       |         WHERE bg IS NOT NULL GROUP BY 1, 2)
       |       GROUP BY doc_id),
       |s AS (
       |  SELECT doc_id, len(ws) AS n_words,
       |    round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4)
       |      AS distinct_ratio
       |  FROM b)
       |SELECT s.doc_id, n_words, distinct_ratio,
       |  round(CAST(top_word_c AS DOUBLE) / n_words, 4) AS top_word_frac,
       |  round(CAST(top_bigram_c AS DOUBLE) / (n_words - 1), 4) AS top_bigram_frac,
       |  (distinct_ratio >= $RepMinDistinctRatio
       |   AND round(CAST(top_word_c AS DOUBLE) / n_words, 4) <= $RepMaxTopWordFrac
       |   AND round(CAST(top_bigram_c AS DOUBLE) / (n_words - 1), 4)
       |       <= $RepMaxTopBigramFrac) AS rep_ok
       |FROM s JOIN wc ON s.doc_id = wc.doc_id JOIN bc ON s.doc_id = bc.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // ----------------------------------------------------------- x_vocab_encode
  /** Vocabulary encoding — the id-mapping step of tokenization: build the
    * top-[[VocabSize]] corpus vocabulary (deterministic ids: frequency desc,
    * word asc), broadcast it, and encode every document as token ids with
    * OOV → 0. Output validates the mapping end to end (first-5-ids prefix)
    * plus the OOV accounting a mixing pipeline monitors. Two shuffles total:
    * the vocab count and the per-doc re-assembly; the vocab join is
    * broadcast (a vocabulary is dim-sized at any corpus scale). */
  val VocabSize = 100

  def xVocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(VocabSize)
      .select(col("w"),
        row_number().over(Window.partitionBy(graft.Tables.summaryKey(col("c")))
          .orderBy(desc("c"), asc("w"))).as("id"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .select(col("doc_id"), col("i"), coalesce(col("id"), lit(0)).as("id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0, 1L).otherwise(0L)).as("n_oov"),
        array_join(slice(transform(array_sort(collect_list(struct(col("i"), col("id")))),
          x => x.getField("id")), 1, 5), ",").as("ids_prefix"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
      .orderBy("doc_id")
  }

  val xVocabEncodeSql: String =
    s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |t AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM b),
       |tok AS (SELECT doc_id, i, ws[CAST(i AS INTEGER)] AS w FROM t),
       |vocab AS (
       |  SELECT w, CAST(row_number() OVER (ORDER BY count(*) DESC, w) AS INTEGER) AS id
       |  FROM tok GROUP BY w ORDER BY count(*) DESC, w LIMIT $VocabSize),
       |enc AS (SELECT doc_id, i, coalesce(v.id, 0) AS id
       |        FROM tok LEFT JOIN vocab v USING (w))
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  array_to_string(list_slice(array_agg(id ORDER BY i), 1, 5), ',') AS ids_prefix,
       |  round(CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 4) AS oov_rate
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- x_bpe_train
  /** Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units") — the tokenizer-training
    * step a 100 TB text pipeline runs before x_vocab_encode can exist. The
    * trained artifact is the ordered merge table, which is DRIVER-HELD like
    * the PQ/IVF quantizer topologies: each round's only collect() is the
    * single argmax row.
    *
    * Scale shape — the corpus is touched exactly ONCE: one explode +
    * partial-aggregated groupBy collapses it to the (word, freq) vocabulary
    * (~10M rows at 100 TB vs billions of documents), and all k merge rounds
    * iterate on that vocab table. Per round: adjacent-pair counts via a
    * narrow transform + explode + partial-aggregated sum keyed on the pair
    * (map-side combine collapses each partition to its distinct pairs
    * before the shuffle), a 1-row argmax collect with deterministic
    * tie-breaks (freq DESC, left ASC, right ASC), and a narrow greedy
    * left-to-right fold that applies the merge to every symbol sequence.
    * Rounds are pinned with a lazy localCheckpoint (materialized by the
    * next round's argmax action) and superseded rounds released — the
    * d_cluster iteration convention, so expression nesting and lineage stay
    * constant-depth across k rounds instead of stacking k lambda layers.
    *
    * Convention pins (the spec hand-verifies them on the classic
    * low/lower/newest/widest corpus): words end with a `</w>` terminal
    * symbol; pair counts include overlapping occurrences; application is
    * greedy left-to-right (in `aaa`, merge (a,a) yields [aa, a]).
    * Rows-only: iterative argmax training is not expressible as one DuckDB
    * SQL statement; TextAnalysisSpec carries the hand-computed oracle. */
  def xBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(spark, docs(spark, dir).select(col("text")), merges = 25)

  /** One corpus pass → (freq, syms) vocabulary with `</w>` terminals. */
  private[graft] def bpeVocab(corpus: DataFrame): DataFrame =
    corpus
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(transform(sequence(lit(1), char_length(col("w"))),
          i => col("w").substr(i, lit(1))),
          array(lit("</w>"))).as("syms"))

  /** Adjacent-pair counts weighted by word frequency (overlap included).
    * Fully-merged words (a single remaining symbol) contribute no pairs and
    * must be filtered BEFORE the index transform: `sequence(1, 0)` steps
    * DESCENDING in Spark, so an unguarded 1-element row would index out of
    * bounds rather than produce an empty pair list. */
  private[graft] def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("c"))

  /** Greedy left-to-right application of merge (l, r) → l+r to `syms`. */
  private[graft] def bpeApplyMerge(vocab: DataFrame, l: String, r: String): DataFrame =
    vocab.withColumn("syms", aggregate(
      col("syms"),
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x)))))

  /** Train `merges` BPE merges; returns the ordered merge table. */
  private[graft] def bpeTrain(spark: SparkSession, corpus: DataFrame,
      merges: Int): DataFrame = {
    import spark.implicits._
    var vocab = bpeVocab(corpus).localCheckpoint(eager = false)
    var superseded: DataFrame = null
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      // model-sized collect: exactly one row — the argmax pair. This action
      // materializes `vocab` (reading the previous round's blocks), so only
      // AFTER it may the previous round be released.
      val top = bpePairCounts(vocab)
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1).collect()
      if (superseded != null) { Checkpoints.release(superseded); superseded = null }
      if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
      else {
        val (l, r, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        learned += ((rank, l, r, c))
        superseded = vocab
        vocab = bpeApplyMerge(vocab, l, r).localCheckpoint(eager = false)
        rank += 1
      }
    }
    learned.toSeq.toDF("rank", "left", "right", "pair_freq").orderBy("rank")
  }

  // ------------------------------------------------------------ x_boilerplate
  /** Cross-document boilerplate detection — the corpus-level pass that
    * finds sentences repeated across many documents (nav bars, footers,
    * license blurbs) which per-document dedup can never see. A footer
    * sentence is planted on every 5th doc (the corpus's natural sentences
    * are all distinct), and detection must surface exactly the sentences
    * shared by ≥ 5 distinct docs.
    *
    * Scale shape: explode to (sentence, doc_id), one partial-aggregated
    * count-distinct shuffle keyed on the sentence, threshold filter. At
    * 100 TB the map-side partial collapses each partition to its distinct
    * (sentence, doc) pairs before anything moves; the true production form
    * keys on xxhash64(sentence) (8 bytes moved per sentence, join the
    * strings back for the report) — same plan, thinner shuffle. */
  def xBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(". Subscribe to our newsletter today.")))
        .otherwise(col("text")).as("text"))
    planted
      .select(col("doc_id"), explode(split(col("text"), "[.!?] ")).as("sent"))
      .groupBy("sent")
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 5)
      .orderBy(desc("n_docs"), asc("sent"))
  }

  val xBoilerplateSql: String =
    """WITH p AS (SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0
      |       THEN text || '. Subscribe to our newsletter today.'
      |       ELSE text END AS text
      |  FROM documents),
      |s AS (SELECT doc_id,
      |        unnest(regexp_split_to_array(text, '[.!?] ')) AS sent FROM p)
      |SELECT sent, count(DISTINCT doc_id) AS n_docs
      |FROM s GROUP BY sent HAVING count(DISTINCT doc_id) >= 5
      |ORDER BY n_docs DESC, sent""".stripMargin

  // ---------------------------------------------------------------- x_chunk
  /** Overlapping token-window chunking — the step that turns documents into
    * fixed-size training/embedding windows (RAG chunking, long-doc
    * pretraining examples): windows of [[ChunkWindow]] whitespace tokens at
    * stride [[ChunkStride]] (16-token overlap carries context across the
    * cut). A doc with n tokens yields 1 chunk if n ≤ W, else
    * ceil((n−W)/S)+1, so the tail is always covered and no chunk starts
    * past the text. Pure narrow plan — split, a per-row sequence explode,
    * slice, join — zero shuffle before the presentation sort; at 100 TB
    * this runs at scan speed and the output feeds e_normalize/n_* style
    * embedding stages chunk-wise. */
  val ChunkWindow = 64
  val ChunkStride = 48

  def xChunk(spark: SparkSession, dir: String): DataFrame =
    chunkOn(docs(spark, dir))

  /** Overlapping token-window chunking over any (doc_id, text) frame. */
  def chunkOn(d: DataFrame): DataFrame = {
    val (wW, sS) = (ChunkWindow, ChunkStride)
    d
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .withColumn("n", size(col("tok")))
      .withColumn("k",
        greatest(lit(0), floor((col("n") - wW + sS - 1) / lit(sS)).cast("int")))
      .select(col("doc_id"), col("tok"), col("n"),
        explode(sequence(lit(0), col("k"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("tok"), col("chunk_id") * sS + 1, lit(wW)), " ")
          .as("chunk_text"),
        least(col("n") - col("chunk_id") * sS, lit(wW)).as("n_chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  val xChunkSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
       |n AS (SELECT doc_id, tok, len(tok) AS n FROM d),
       |k AS (SELECT doc_id, tok, n,
       |        greatest(0, CAST(floor((n - $ChunkWindow + $ChunkStride - 1)
       |          / ${ChunkStride}.0) AS INT)) AS k FROM n),
       |e AS (SELECT doc_id, tok, n,
       |        unnest(generate_series(0, k)) AS chunk_id FROM k)
       |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |  array_to_string(tok[chunk_id*$ChunkStride+1 :
       |    least(chunk_id*$ChunkStride+$ChunkWindow, n)], ' ') AS chunk_text,
       |  CAST(least(n - chunk_id*$ChunkStride, $ChunkWindow) AS INT) AS n_chunk
       |FROM e ORDER BY doc_id, chunk_id""".stripMargin

  // ----------------------------------------------------------------- x_dsir
  /** DSIR — data selection via importance resampling (Xie et al., NeurIPS
    * 2023): pick raw-corpus documents whose hashed-n-gram distribution
    * looks like a target (curated) corpus. Two bag-of-hashed-ngrams unigram
    * models — p over the target slice, q over the raw corpus — give each
    * document the importance weight
    * `log w(x) = Σ_b c_b(x)·(log p[b] − log q[b])`, and selection is the
    * paper's Gumbel top-k resampling (sampling w/o replacement ∝ w).
    *
    * Target slice: the "curated" sources (source id % 4 == 0 — the
    * p_upsample convention); features: unigrams + bigrams of lowercased
    * whitespace words hashed into B = [[DsirB]] buckets (paper: 10k).
    *
    * Distributed shape (the 100 TB story):
    *  - model FIT is one explode→groupBy(bucket) pass producing ≤ B rows
    *    (partial-aggregated map-side; both counts in one pass via a
    *    conditional sum); the two B-sized vectors are collected — the
    *    accepted driver-held-model topology (PQ/IVF quantizers, BPE merge
    *    table) — Laplace-smoothed into ONE log-ratio ARRAY LITERAL;
    *  - SCORING is fully narrow: `transform(buckets, b -> lr[b])` +
    *    `aggregate(+)` against that literal — zero shuffle, codegen'd, no
    *    second explode;
    *  - SELECTION is Gumbel top-k with a DETERMINISTIC md5-derived uniform
    *    (p_sample's no-RNG convention, restart-stable): `ORDER BY logw + g
    *    DESC LIMIT k` = TakeOrdered — per-partition heaps, the driver
    *    merges k·P candidate rows, never the corpus. A deployment
    *    selecting billions of docs thresholds the same score at an
    *    approx-quantile instead of LIMIT.
    * Rows-only (hashed-model pipeline, not oracle-expressible);
    * TextAnalysisSpec proves target-vocabulary enrichment of the selected
    * set, weight ordering on planted docs, and determinism. */
  val DsirB = 4096
  val DsirK = 50

  /** Unigram+bigram hashed feature buckets per doc (narrow, codegen'd). */
  private[graft] def dsirFeats(d: DataFrame): DataFrame =
    d.withColumn("ws", split(lower(col("text")), "\\s+"))
      .withColumn("ngrams", expr(
        "filter(concat(ws, zip_with(ws, slice(ws, 2, size(ws)), " +
          "(a, b) -> concat(a, ' ', b))), t -> t IS NOT NULL)"))
      .withColumn("buckets",
        expr(s"transform(ngrams, t -> CAST(pmod(xxhash64(t), $DsirB) AS INT))"))

  /** Fit both hashed-ngram models in one aggregation pass and return the
    * Laplace-smoothed per-bucket log(p_target/q_raw). Driver-held model:
    * the collect is ≤ B rows by construction. */
  private[graft] def dsirLogRatio(corpus: DataFrame, isTarget: Column): Array[Double] = {
    val counts = dsirFeats(corpus)
      .select(explode(col("buckets")).as("b"), isTarget.as("is_t"))
      .groupBy("b")
      .agg(count(lit(1)).as("raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("tgt"))
      .collect()
    val raw = Array.fill(DsirB)(0L)
    val tgt = Array.fill(DsirB)(0L)
    counts.foreach { r =>
      val b = r.getInt(0); raw(b) = r.getLong(1); tgt(b) = r.getLong(2)
    }
    val nRaw = raw.sum.toDouble + DsirB
    val nTgt = tgt.sum.toDouble + DsirB
    Array.tabulate(DsirB) { b =>
      math.log((tgt(b) + 1L) / nTgt) - math.log((raw(b) + 1L) / nRaw)
    }
  }

  /** Score + Gumbel-top-k select against a fitted log-ratio model. */
  private[graft] def dsirSelect(corpus: DataFrame, lr: Array[Double], k: Int): DataFrame = {
    val lrLit = typedLit(lr.toSeq)
    // deterministic uniform in (0,1] from md5(doc_id); 15 hex chars = 60 bits
    val u = greatest(
      expr("CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 15), 16, 10) AS DOUBLE)")
        / lit(math.pow(2, 60)), lit(1e-12))
    val scored = dsirFeats(corpus)
      .withColumn("logw", aggregate(col("buckets"), lit(0.0),
        (acc, b) => acc + element_at(lrLit, b + 1)))
      .withColumn("score", col("logw") - log(-log(u)))
    scored.orderBy(col("score").desc).limit(k)
      .select(col("doc_id"), col("source"), round(col("logw"), 4).as("logw"))
      .orderBy("doc_id")
  }

  def xDsir(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val isTarget = expr("CAST(substring(source, 4, 10) AS INT)") % 4 === 0
    dsirSelect(d, dsirLogRatio(d, isTarget), DsirK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_dsir" -> (xDsir _),
    "x_chunk" -> (xChunk _),
    "x_boilerplate" -> (xBoilerplate _),
    "x_vocab_encode" -> (xVocabEncode _),
    "x_bpe_train" -> (xBpeTrain _),
    "x_normalize" -> (xNormalize _), "x_scrub" -> (xScrub _),
    "x_pii" -> (xPii _), "x_readability" -> (xReadability _),
    "x_sentences" -> (xSentences _), "x_top_ngrams" -> (xTopNgrams _),
    "x_unigram_lp" -> (xUnigramLp _),
    "x_gopher" -> (xGopher _), "x_repetition" -> (xRepetition _),
    "x_langid" -> (xLangid _), "x_quality" -> (xQuality _),
    "x_tokcount" -> (xTokcount _), "x_docstats" -> (xDocstats _))

  val oracle: Map[String, String] = Map(
    "x_chunk" -> xChunkSql,
    "x_boilerplate" -> xBoilerplateSql,
    "x_quality" -> xQualitySql, "x_tokcount" -> xTokcountSql,
    "x_docstats" -> xDocstatsSql,
    "x_normalize" -> xNormalizeSql, "x_scrub" -> xScrubSql,
    "x_pii" -> xPiiSql, "x_readability" -> xReadabilitySql,
    "x_sentences" -> xSentencesSql, "x_top_ngrams" -> xTopNgramsSql,
    "x_unigram_lp" -> xUnigramLpSql,
    "x_gopher" -> xGopherSql, "x_repetition" -> xRepetitionSql,
    "x_vocab_encode" -> xVocabEncodeSql)
}
