package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Deduplication operators over `documents` (SURVEY.md §2.5) — the
  * training-data-pipeline layer. Reference analogue: DataFusion's hash
  * aggregate + arrow-extra hash kernels; the pipeline designs (MinHash/LSH,
  * SimHash, n-gram Jaccard) follow the published algorithms (Broder 1997;
  * Charikar 2002) re-expressed as declarative Catalyst plans.
  *
  * 100 TB design notes:
  *  - Everything is expression-level (xxhash64 / transform / aggregate) —
  *    no UDFs, all codegen'd, embarrassingly parallel per row.
  *  - Candidate generation is ALWAYS banded/blocked: one shuffle on the
  *    (band, key) pair, join within buckets. Never a global O(n²) cross.
  *  - Pair verification shuffles only candidate doc_ids, then joins the
  *    shingle sets back — at scale the candidate set is ≪ the corpus.
  *  - Skewed buckets (boilerplate text) are bounded: bucket join keys
  *    include the band id, and AQE skew-join splits oversized buckets.
  *
  * The synthetic corpus has fully distinct texts, so each query plants
  * deterministic duplicates derived from the corpus itself (keyed off
  * doc_id, reproducible everywhere) — the operator must then find exactly
  * those; specs assert recovery + precision.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")

  /** Exact duplicates planted: every 10th doc re-appears under id+2000000. */
  def withPlantedExact(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    base.union(base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000L))
  }

  /** Near-duplicates planted: every 10th doc re-appears under id+1000000
    * with its first two words dropped (word-shingle Jaccard ≈ 0.9). */
  def withPlantedNear(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("text"))
    base.union(base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", concat_ws(" ", slice(split(col("text"), " "), 3, 1000000))))
  }

  // ---------------------------------------------------------------- d_exact
  /** Exact dedup: hash-groupBy on sha2(text). One shuffle on the 256-bit
    * hash (not the text itself — at 100 TB you shuffle 32 bytes/doc, not
    * the documents). keep_id = min(doc_id): deterministic survivor. */
  def dExact(spark: SparkSession, dir: String): DataFrame =
    exactGroupsOn(withPlantedExact(docs(spark, dir)))

  /** Exact-dup groups over any (doc_id, text) frame — graft.api.DedupApi's
    * entry point; one partial-aggregated shuffle on the content hash. */
  def exactGroupsOn(d: DataFrame): DataFrame =
    d.groupBy(sha2(col("text").cast("binary"), 256).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val dExactSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT sha256(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM all_docs GROUP BY sha256(text) ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- d_lines
  /** Corpus-wide exact LINE-level dedup — the C4/RefinedWeb stage that
    * removes repeated lines/sentences ACROSS documents while keeping each
    * document's unique content intact (Raffel et al. 2020 §2.2 dedup
    * Lee et al. 2021 motivate; the sub-document companion of d_exact).
    * Every document is split into sentences (same `[.!?] ` convention as
    * x_sentences), the corpus-wide FIRST occurrence of each line (by
    * doc_id, then position) is kept, and documents are reassembled in
    * original order. A boilerplate footer planted on every 5th doc
    * survives in exactly one document.
    *
    * 100 TB shape: two shuffles, both hot-key immune. The first-occurrence
    * decision is an ASSOCIATIVE aggregate — min(struct(doc_id, pos)) per
    * line — so Catalyst partial-aggregates it map-side: a boilerplate
    * footer on billions of documents (exactly the line this operator
    * exists to remove) collapses to ONE row per map partition before the
    * shuffle, and the reducer merges ≤ #partitions candidates instead of
    * receiving every copy. (Round 5 spelled this as a row_number() window
    * partitioned on sha2(line), which shipped every duplicate of a hot
    * line into one reducer — the one straggler shape in the repo; struct
    * min gives the identical lexicographic first occurrence with no Window
    * node at all — PlanAuditSpec pins it.) The group key is the raw line
    * value, matching the oracle's PARTITION BY line exactly — Spark
    * already hashes the key for the shuffle, so a separate 32-byte
    * fingerprint would only add an engine/oracle collision asymmetry
    * (ADVICE r5). Then one groupBy doc_id reassembles; the final
    * array_sort/transform runs once per output doc on ≤ doc-length
    * arrays — presentation, not the per-line hot path. */
  def dLines(spark: SparkSession, dir: String): DataFrame = {
    val planted = docs(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(". Subscribe to our newsletter today.")))
        .otherwise(col("text")).as("text"))
    val lines = planted
      .select(col("doc_id"),
        posexplode(split(col("text"), "[.!?] ")).as(Seq("pos0", "line")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("line"))
    lines.groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      .select(col("first.doc_id").as("doc_id"), col("first.pos").as("pos"),
        col("line"))
      .groupBy("doc_id")
      .agg(
        concat_ws(". ",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            e => e.getField("line"))).as("dedup_text"),
        count(lit(1)).as("n_kept"))
      .orderBy("doc_id")
  }

  val dLinesSql: String =
    """WITH b AS (SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN text || '. Subscribe to our newsletter today.'
      |         ELSE text END AS text
      |  FROM documents),
      |a AS (SELECT doc_id, regexp_split_to_array(text, '[.!?] ') AS ls FROM b),
      |l AS (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM a),
      |e AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
      |        ls[CAST(i AS INTEGER)] AS line FROM l),
      |k AS (SELECT doc_id, pos, line,
      |        row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      |      FROM e)
      |SELECT doc_id,
      |  string_agg(line, '. ' ORDER BY pos) AS dedup_text,
      |  count(*) AS n_kept
      |FROM k WHERE rn = 1
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- minhash machinery
  val NumPerms = 128
  val NumBands = 16
  val RowsPerBand: Int = NumPerms / NumBands // 8

  /** Word-3-gram shingle sets for any (doc_id, text) frame, as
    * (doc_id, shingles array<long>), via the native `word_shingles`
    * expression (graft.functions.ShingleKernels) — a pure narrow map with
    * ZERO shuffle. (Round 1 derived shingles from posexplode + lead windows
    * + collect_set, paying a full doc_id shuffle of exploded words; round 2's
    * kernel tokenizes and hashes in one codegen'd pass per row.) Documents
    * with fewer than 3 words have no shingle and are dropped, matching the
    * window formulation. */
  def wordShingleSets(d: DataFrame): DataFrame = {
    GraftFunctions.register(d.sparkSession)
    // NOT widened (round 17): repartitioning the small-scan input to core
    // count before the kernel was measured as a net REGRESSION here — the
    // pipeline's many downstream stages each inherit the wider partitioning
    // and the added task-launch overhead outweighs the kernel speedup
    // (OPTIMIZATION_r17.md "widening"); at 100 TB the scan is already wide.
    d.select(col("doc_id"), expr("word_shingles(text, 3)").as("shingles"))
      .filter(size(col("shingles")) > 0)
  }

  /** Char-5-gram shingle sets via the native `char_shingles` expression —
    * same zero-shuffle shape as [[wordShingleSets]]. ~45× more shingles per
    * doc than word 3-grams, which made the round-1 explode + collect_set
    * form (7.6 s at sf0.1 before tuning) the pipeline's hot spot; the kernel
    * is one pass over the UTF-8 bytes. */
  def charShingleSets(d: DataFrame): DataFrame = {
    GraftFunctions.register(d.sparkSession)
    // not widened — see wordShingleSets
    d.select(col("doc_id"), expr("char_shingles(text, 5)").as("shingles"))
      .filter(size(col("shingles")) > 0)
  }

  /** The 16 LSH band hashes of a 128-component minhash signature column —
    * xxhash64 over each band's 8 components. Shared by the batch banding
    * join and the streaming bucket-state dedup. */
  def bandHashes(sig: Column): Column =
    array((0 until NumBands).map { b =>
      xxhash64((0 until RowsPerBand).map(i =>
        element_at(sig, b * RowsPerBand + i + 1)): _*)
    }: _*)

  /** LSH banding: explode (band_id, band_hash), self-join per bucket with
    * doc_a < doc_b, dedup candidate pairs, verify exact shingle Jaccard.
    * Signatures come from the native `minhash_sig` kernel (128 wrapping
    * multiply-adds per shingle, JIT'd — no per-permutation hash calls, no
    * 128-buffer aggregate, no shuffle), so the ONLY shuffles in the whole
    * pipeline are the bucket join and the shingle-verify join.
    * Public API: near-duplicate pairs for any (doc_id, shingles) frame
    * (from [[wordShingleSets]]/[[charShingleSets]] or a custom shingler).
    *
    * `persistIntermediate` (default ON) controls the corpus-sized caches:
    * the shingle frame (docs × ~2 KB) and the band postings (docs × 16
    * narrow rows) each feed multiple plan branches, and caching them
    * avoids re-running the 128-permutation minhash_sig kernel per
    * reference (−28–34% wall, BASELINE.md r11). The cache is a deliberate
    * DISK-DUPLICATION trade at 100 TB (MEMORY_AND_DISK spills roughly a
    * signature-sized copy of the corpus); a caller who would rather pay
    * recompute than storage turns it off and gets the identical rows
    * (ApiSpec pins equality both ways — VERDICT r11 #7). */
  def minhashLshPairs(shingleSets: DataFrame, minJaccard: Double,
      persistIntermediate: Boolean = true): DataFrame = {
    GraftFunctions.register(shingleSets.sparkSession)
    val sh = if (persistIntermediate) persistShingles(shingleSets)
             else shingleSets
    // persist the band postings too (docs × 16 narrow rows): the bucket
    // SELF-join references the frame twice, and without the cache each
    // side re-runs the 128-permutation minhash_sig kernel — the pipeline's
    // single most expensive stage (~52% of wall at the 1000× stress scale,
    // BASELINE.md r11) — doubling it for nothing. Found via the
    // d_minhash_delta plan audit (sig appeared once per join reference).
    val bands0 = sigBands(sh)
    val bands =
      if (persistIntermediate) {
        val b =
          bands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Materialize the cache EAGERLY (one cheap count over the cached
        // plan) before the self-join references it twice: AQE submits the
        // join's two exchange-materialization jobs CONCURRENTLY, and a
        // lazily-persisted frame is then computed by BOTH jobs in parallel
        // — each paying the full shingle+128-perm signing pass — with one
        // winner filling the cache ("Block already exists" storms, round-17
        // profile: two identical 0.25–0.47 s jobs per pipeline run). At
        // 100 TB the duplicate is a full corpus pass; the count is one
        // pass that fills the shingle cache AND the postings cache.
        b.count()
        b
      } else bands0
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    jaccardVerify(cand, sh, minJaccard)
  }

  /** Persist a shingle frame once — it feeds several plan branches
    * (banding + both verify joins); docs × ~2 KB of hashes,
    * MEMORY_AND_DISK spills. Guarded: when two pipeline entries share the
    * shingle plan (d_minhash then d_cluster) a second persist of the same
    * cached data logs a WARN (VERDICT r6) — reuse the existing entry. */
  private def persistShingles(shingleSets: DataFrame): DataFrame =
    if (shingleSets.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      shingleSets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else shingleSets

  /** (doc_id, band_id, band_hash) postings of a shingle frame — the
    * native minhash_sig kernel then the 16 band hashes, exploded. This IS
    * the stored index layout of [[minhashDeltaPairs]]. */
  private def sigBands(sh: DataFrame): DataFrame = sh
    .select(col("doc_id"), expr(s"minhash_sig(shingles, $NumPerms)").as("sig"))
    .select(col("doc_id"),
      posexplode(bandHashes(col("sig"))).as(Seq("band_id", "band_hash")))

  /** Exact-Jaccard verification of a candidate-pair frame against the
    * shingle sets. Shingle arrays are sorted-distinct (kernel output), so
    * the verify is a merge-loop overlap count — no hash sets, no
    * intersect/union array materialization; |a∪b| = |a|+|b|−|a∩b|. */
  private def jaccardVerify(cand: DataFrame, sh: DataFrame,
      minJaccard: Double): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("inter", expr("sorted_overlap_count(sh_a, sh_b)").cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Incremental near-dup detection: a DELTA of new documents against the
    * STORED band-postings index of the already-deduped corpus — the
    * production shape of d_minhash at 100 TB, where re-deduping the whole
    * corpus for each day's arrivals is a non-starter. Work is proportional
    * to the DELTA: only delta docs are shingled/signed here; the base side
    * is the write-once postings table ([[sigBands]] layout — in production
    * bucketed by band_hash so this join is a postings lookup, and appended
    * with the delta's own bands after the run). Candidates =
    * delta-vs-index bucket hits + delta-vs-delta pairs; base-vs-base pairs
    * are never re-examined (they were emitted when THOSE docs arrived —
    * the inductive invariant that makes the incremental answer complete).
    * Verification is the same exact-Jaccard pass; DedupSpec proves the
    * result equals the full-corpus d_minhash restricted to pairs touching
    * the delta. */
  def minhashDeltaPairs(baseSh0: DataFrame, deltaSh0: DataFrame,
      minJaccard: Double): DataFrame = {
    GraftFunctions.register(baseSh0.sparkSession)
    val baseSh = persistShingles(baseSh0)
    minhashDeltaAgainst(baseSh, sigBands(baseSh), deltaSh0, minJaccard)
  }

  /** The delta join against an EXPLICIT index pair — `baseSh` the stored
    * (doc_id, shingles) frame, `index` the stored (doc_id, band_id,
    * band_hash) postings. [[minhashDeltaPairs]] derives both in-memory;
    * [[minhashDeltaPairsFromStore]] reads both from parquet. */
  private def minhashDeltaAgainst(baseSh: DataFrame, index: DataFrame,
      deltaSh0: DataFrame, minJaccard: Double): DataFrame = {
    // cache bound: every frame persisted in this method is DELTA- or
    // PAIRS-sized (delta shingles/bands, candidate pairs, candidate-doc
    // shingles) — never the corpus; the corpus-sized persist guard lives
    // in minhashLshPairs (persistShingles note)
    GraftFunctions.register(baseSh.sparkSession)
    val deltaSh = persistShingles(deltaSh0)
    // cached: referenced three times (delta-vs-index + both sides of the
    // delta self-join) — one minhash_sig pass, not three (see the
    // minhashLshPairs band-cache note)
    val deltaBands = sigBands(deltaSh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // against the STORED index this join is where the layout earns its
    // keep: the postings table is bucketed by band_hash
    // ([[minhashIndexWrite]]), so only the delta's bands shuffle — the
    // corpus-sized index streams from its sorted buckets
    val newOld = index.as("y").join(deltaBands.as("x"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
    val newNew = deltaBands.as("x").join(deltaBands.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val cand = newOld.unionAll(newNew).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE candidate-restricted fetch from the corpus-sized shingle side:
    // jaccardVerify joins its shingle frame twice (doc_a, doc_b) — fine
    // against a cached in-memory frame, but against the STORED index that
    // meant two full parquet scans of the corpus's shingle arrays (the
    // dominant serve cost at the 1000× stress scale). The candidate id
    // set is pairs-sized; its broadcast hint is LOAD-BEARING: the fetch
    // is materialized through persist, and cached plans skip AQE's
    // runtime broadcast conversion — without the hint the id join plans
    // as a SortMergeJoin that SHUFFLES the whole multi-GB shingle store.
    val ids = cand.select(explode(array(col("doc_a"), col("doc_b")))
      .as("doc_id")).distinct()
    val needed = persistShingles(
      baseSh.unionAll(deltaSh).join(broadcast(ids), "doc_id"))
    jaccardVerify(cand, needed, minJaccard)
  }

  /** Bucket count of the stored postings table. Sizing: buckets bound the
    * delta-side shuffle fan-in and the per-bucket sort run; the INDEX side
    * never shuffles at any count (that is what bucketing buys). 64 keeps
    * file counts sane locally; a 100 TB index wants O(cluster cores). */
  val PostingsBuckets = 64

  /** Fully-qualified URI of the index root — via the Hadoop FileSystem
    * API, not java.io (round 12, same deployability rule as the COW
    * machinery: a 100 TB index lives on HDFS/S3, where java.io.File would
    * mangle the scheme; local scheme-less paths qualify to file:/…). */
  private def indexUri(spark: SparkSession, path: String): String =
    graft.sources.Fs.of(spark, path)
      .makeQualified(new org.apache.hadoop.fs.Path(path)).toString

  private def postingsTable(spark: SparkSession, path: String): String = {
    val abs = indexUri(spark, path)
    // hash + sanitized tail: the tail keeps two different index paths
    // from colliding into one catalog name even on a hashCode collision
    val tail = abs.replaceAll("[^A-Za-z0-9]", "_").takeRight(32)
    "graft_minhash_postings_" +
      java.lang.Integer.toHexString(abs.hashCode & 0x7FFFFFFF) + "_" + tail
  }

  /** The postings table is EXTERNAL (files live under the index path) so
    * the index survives the writing session: a fresh session re-declares
    * the same bucketed-table DDL over the existing files — the default
    * in-memory catalog holds table METADATA per-session, and without the
    * re-declaration a later serve session would find data but no table
    * (caught by ServeProfile during the round-11 stress runs). */
  private def ensurePostingsTable(spark: SparkSession, path: String): String = {
    val t = postingsTable(spark, path)
    val fs = graft.sources.Fs.of(spark, path)
    val locPath = fs.makeQualified(
      new org.apache.hadoop.fs.Path(path, "postings"))
    val loc = locPath.toString
    // loud, not an empty table: a typo'd path must not serve zero pairs
    require(fs.exists(locPath),
      s"no stored postings at $loc — run minhashIndexWrite first")
    if (!spark.catalog.tableExists(t))
      spark.sql(
        s"""CREATE TABLE $t (doc_id BIGINT, band_id INT, band_hash BIGINT)
           |USING parquet
           |CLUSTERED BY (band_id, band_hash)
           |SORTED BY (band_id, band_hash)
           |INTO $PostingsBuckets BUCKETS
           |LOCATION '$loc'""".stripMargin)
    t
  }

  /** Persist the dedup index a production deployment serves deltas from:
    * the shingle sets (what the verify joins) and the band postings (what
    * candidate generation joins) — written ONCE when the corpus is first
    * deduped, appended with each delta's rows after its run. The postings
    * are a BUCKETED-BY-band_hash table (the ddl_bucketed machinery): the
    * delta join then shuffles only the delta's bands into the bucket
    * layout while the corpus-sized index STREAMS from its sorted buckets —
    * no index-side shuffle, no index-side sort, per batch, ever. (The
    * round's measurements forced this shape: a plain parquet postings
    * store sort-merge-joined by shuffling all 80M postings per serve at
    * the 1000× stress — the dominant cost — and broadcasting the 8M-row
    * delta instead exceeded driver result limits. Bucketing is the layout
    * that scales on BOTH sides.) */
  def minhashIndexWrite(sh: DataFrame, path: String): Unit = {
    val spark = sh.sparkSession
    val p = persistShingles(sh)
    p.write.mode("overwrite").parquet(s"$path/shingles")
    spark.sql(s"DROP TABLE IF EXISTS ${postingsTable(spark, path)}")
    // bucket columns = the delta join's EXACT key set (band_id, band_hash):
    // Spark only treats the bucketed side as pre-distributed when the
    // equi-join keys match the bucket spec, so a band_hash-only bucketing
    // would re-shuffle the index anyway
    sigBands(p).write.format("parquet").mode("overwrite")
      .bucketBy(PostingsBuckets, "band_id", "band_hash")
      .sortBy("band_id", "band_hash")
      .option("path", graft.sources.Fs.of(spark, path).makeQualified(
        new org.apache.hadoop.fs.Path(path, "postings")).toString)
      .saveAsTable(postingsTable(spark, path))
  }

  /** Delta dedup against the STORED index: no base-side shingling or
    * signature work at all — the two heavy stages of the full pipeline
    * (the 1000× profile attributes ~52% of d_minhash's wall to signature
    * generation alone, BASELINE.md r11) are paid only for the DELTA; the
    * base contributes parquet reads. DedupSpec proves byte-equality with
    * the in-memory form; BENCH prices build (index write) and serve
    * (delta run) separately, like the IVFADC store split. */
  def minhashDeltaPairsFromStore(spark: SparkSession, path: String,
      deltaSh0: DataFrame, minJaccard: Double): DataFrame =
    minhashDeltaAgainst(
      spark.read.parquet(s"$path/shingles"),
      spark.table(ensurePostingsTable(spark, path)),
      deltaSh0, minJaccard)

  // -------------------------------------------------------------- d_minhash
  /** MinHash(128) + LSH(16×8) near-dup pairs on word 3-shingles, verified
    * with exact Jaccard ≥ 0.5. Rows-only gate (hash pipeline not portable
    * to DuckDB SQL); DedupSpec asserts planted-pair recall and precision. */
  def dMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairs(wordShingleSets(withPlantedNear(docs(spark, dir))), 0.5)

  // ---------------------------------------------------------- d_minhash_delta
  /** Incremental MinHash dedup ([[minhashDeltaPairs]]): the corpus is the
    * stored index, the planted near-dup arrivals (doc_id ≥ 1e6 from
    * [[withPlantedNear]]) are the day's delta. Rows-only; DedupSpec proves
    * equality with the full-corpus d_minhash restricted to delta-touching
    * pairs, which is exactly the set a production incremental run owes. */
  def dMinhashDelta(spark: SparkSession, dir: String): DataFrame = {
    val all = withPlantedNear(docs(spark, dir))
    minhashDeltaPairs(
      wordShingleSets(all.filter(col("doc_id") < 1000000L)),
      wordShingleSets(all.filter(col("doc_id") >= 1000000L)), 0.5)
  }

  // -------------------------------------------------------- d_ngram_jaccard
  /** Char-5-gram Jaccard over LSH buckets — the exact-verification pass at
    * character granularity (robust to word-boundary edits). */
  def dNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairs(charShingleSets(withPlantedNear(docs(spark, dir))), 0.6)

  // -------------------------------------------------------------- d_simhash
  /** 64-bit SimHash + Hamming ≤ 3 candidates. Blocking: any pair within
    * Hamming 3 shares at least one of four 16-bit chunks (pigeonhole) →
    * equi-join per chunk, then the native hamming_distance verifies.
    * One shuffle on (chunk_id, chunk_value). */
  def dSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairsOn(withPlantedNear(docs(spark, dir)))

  /** SimHash near-dup pairs over any (doc_id, text) frame. */
  def simhashPairsOn(d: DataFrame): DataFrame = {
    GraftFunctions.register(d.sparkSession)
    // explode + 64 codegen'd sum aggregates (per-row lambda aggregates are
    // interpreted CodegenFallback — same lesson as the minhash signature);
    // map-side partial agg → the shuffle carries 64 longs per doc
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftrightunsigned(col("h"), k).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$k")
    }
    val sim = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(k => when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L)))
          .reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("simhash"))
      // referenced twice by the chunk self-join — persist, or the 64-agg
      // pipeline runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = sim.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_id", "chunk_val")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_id") === col("y.chunk_id") &&
        col("x.chunk_val") === col("y.chunk_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("hamming_distance(x.simhash, y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Sign-bit blocking width for embedding near-dup. Sizing rule: buckets
    * (2^bits) should scale with corpus size so the within-bucket self-join
    * stays ~linear — bits ≈ log2(n / desired_bucket_size). 8 bits suits the
    * test corpora (≤ 5k vectors); a 10^10-vector corpus wants ~24 bits
    * (use that many leading components, or hyperplane signs past dim 64). */
  val EmbedBlockBits = 8

  // ------------------------------------------------------------ d_embed_dup
  /** Embedding-cosine near-dup pairs: block on the sign bits of the first
    * EmbedBlockBits components (sign-preserving perturbations land in the
    * same bucket), join within buckets, verify cosine > 0.98 with the
    * native codegen expression. Planted: every 10th vector re-appears
    * scaled ±5% per coordinate (cosine ≈ 0.9975, signs preserved). */
  def dEmbedDup(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        zip_with(col("embedding"), sequence(lit(0), lit(63)),
          (v, i) => (v * (lit(1.0) + lit(0.05) *
            when(i % 2 === 0, 1.0).otherwise(-1.0))).cast("float")))
    embedDupPairsOn(emb.union(planted), 0.98)
  }

  /** Embedding-cosine near-dup pairs over any (vec_id, embedding) frame —
    * sign-bit blocking + within-bucket exact verification
    * (graft.api.DedupApi's entry point). */
  def embedDupPairsOn(vecs: DataFrame, minCos: Double): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val bucket = (0 until EmbedBlockBits).map(i =>
      when(element_at(col("embedding"), i + 1) >= 0f, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
    val b = vecs.withColumn("bucket", bucket)
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        round(expr("cosine_similarity(x.embedding, y.embedding)"), 4).as("cos"))
      .filter(col("cos") > minCos)
      .orderBy("vec_a", "vec_b")
  }

  // -------------------------------------------------------------- d_semantic
  /** SemDeDup-style embedding-cluster dedup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication")
    * — the corpus-level KEEP/DROP decision d_embed_dup's pairwise output
    * doesn't make. Composition of existing machinery: the trained IVF
    * coarse quantizer (driver-held model, Similarity.ivfQuantizer) assigns
    * every embedding to its nearest centroid as a zero-shuffle per-row
    * argmax; within each cell, a member is DROPPED iff a lower-vec_id
    * member of the same cell has cosine ≥ [[SemTau]] to it (keep-min — the
    * d_cluster representative convention; the comparator need not itself
    * survive, matching SemDeDup's keep-one-per-group intent without a
    * transitive-closure pass).
    *
    * Scale shape — this is exactly the paper's recipe: clustering bounds
    * the candidate space to within-cell pairs (k scales with the corpus so
    * cell size stays bounded; the paper runs ~100k clusters over LAION).
    * The cell-keyed self-join is ONE shuffle, and both sides are the same
    * assigned frame, so the exchange is computed once and reused
    * (plan-audited ReusedExchange). Boundary-split duplicates (a near-dup
    * pair straddling two cells) are missed by construction — the paper's
    * accepted approximation; raising nprobe-style multi-assignment would
    * trade shuffle volume for recall.
    *
    * Planted (d_embed_dup convention): every 10th vector re-appears
    * ±5%-perturbed (cosine ≈ 0.9975, id + 1,000,000) and must be dropped;
    * originals are random 64-dim vectors (pairwise cosine ≈ N(0, 1/64)·8 —
    * nowhere near τ) and must all survive. Rows-only + hand-planted
    * cluster spec + e2e recall/precision spec + exchange-reuse audit. */
  val SemTau = 0.98

  def dSemantic(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.t(spark, dir, "embeddings").select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        zip_with(col("embedding"), sequence(lit(0), lit(63)),
          (v, i) => (v * (lit(1.0) + lit(0.05) *
            when(i % 2 === 0, 1.0).otherwise(-1.0))).cast("float")))
    val assigned = Similarity.assignTo(emb.union(planted),
      Similarity.ivfQuantizer(spark, dir))
    dSemanticOn(assigned, SemTau)
  }

  /** Core verdicts over an already cell-assigned (vec_id, embedding, cell)
    * frame — factored so the spec can plant unambiguous clusters. */
  private[graft] def dSemanticOn(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.select("vec_id", "embedding", "cell")
    val dup = a.as("x").join(a.as("y"),
        col("x.cell") === col("y.cell") && col("y.vec_id") < col("x.vec_id"))
      .filter(expr("cosine_similarity(x.embedding, y.embedding)") >= lit(tau))
      .select(col("x.vec_id").as("vec_id")).distinct()
    a.select("vec_id", "cell")
      .join(dup.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("dup"), lit(false)).as("is_semantic_dup"))
      .orderBy("vec_id")
  }

  // ------------------------------------------------------------ d_incremental
  /** Incremental ingest dedup — the daily-batch shape of d_exact: a new
    * batch is admitted only where its content hash is (a) not already in
    * the corpus and (b) unique within the batch (min doc_id survives).
    * Planted batch: every 10th corpus doc re-sent verbatim (must be
    * rejected), every 7th with " fresh" appended (genuinely new), and the
    * %14 subset of those sent TWICE under two ids (within-batch dup; the
    * smaller id wins).
    *
    * 100 TB shape: the corpus side reduces to its 32-byte sha256 per doc —
    * in production a pre-materialized hash table bucketed on the hash, so
    * the LEFT ANTI join co-locates without shuffling the corpus; the daily
    * batch (≪ corpus) is the only side that moves. Within-batch dedup is
    * the same one-shuffle hash groupBy as d_exact. */
  def dIncremental(spark: SparkSession, dir: String): DataFrame = {
    val corpus = docs(spark, dir).select(col("doc_id"), col("text"))
    val resent = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    val fresh = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    val freshDup = corpus.filter(col("doc_id") % 14 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    val batch = resent.union(fresh).union(freshDup)
    val corpusHashes = corpus
      .select(sha2(col("text").cast("binary"), 256).as("h")).distinct()
    batch
      .withColumn("h", sha2(col("text").cast("binary"), 256))
      .join(corpusHashes, Seq("h"), "left_anti")
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
      .orderBy("doc_id")
  }

  val dIncrementalSql: String =
    """WITH corpus AS (SELECT doc_id, text FROM documents),
      |batch AS (
      |  SELECT doc_id + 3000000 AS doc_id, text FROM corpus WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 4000000, text || ' fresh' FROM corpus WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 5000000, text || ' fresh' FROM corpus WHERE doc_id % 14 = 0),
      |known AS (SELECT DISTINCT sha256(text) AS h FROM corpus)
      |SELECT min(doc_id) AS doc_id
      |FROM (SELECT doc_id, sha256(text) AS h FROM batch) b
      |WHERE NOT EXISTS (SELECT 1 FROM known k WHERE k.h = b.h)
      |GROUP BY h
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ d_bloom_delta
  /** Bloom-prefiltered ingest dedup — d_incremental's semantics with the
    * 100 TB corpus side collapsed to a ~1 MB MEMBERSHIP SKETCH: the corpus
    * contributes ONE partial-aggregated pass building a bloom filter over
    * xxhash64(text) (Spark's own BloomFilterAggregate — the runtime-filter
    * machinery, registered as graft `bloom_filter_agg`), and the batch is
    * split by `bloom_might_contain` against the broadcast blob:
    *  - bloom-NEGATIVES are provably new (no false negatives) and are
    *    admitted with ZERO join work — on a mostly-fresh daily feed that
    *    is most of the batch;
    *  - bloom-POSITIVES (true dups + the configured false-positive
    *    fraction) take the exact sha256 anti-join, but only THEY do —
    *    the join's corpus side still reduces to hashes as in
    *    d_incremental, while the batch side shrinks to the positive
    *    sliver.
    * The final answer is EXACT (the bloom only routes work), so the gate
    * hash-checks it against the same anti-join oracle as d_incremental —
    * approximation in the plan, none in the result. The blob is collected
    * once (a model value, like the IVF centroids: ~1 MB at the configured
    * 8M bits / 1M items ≈ 0.02% FP at corpus 10⁵, sized for the gate; a
    * 100 TB deployment sizes bits ≈ 10–15 × corpus count and still holds
    * ~GBs, or shards the sketch by hash prefix). */
  def dBloomDelta(spark: SparkSession, dir: String): DataFrame = {
    val corpus = docs(spark, dir).select(col("doc_id"), col("text"))
    val resent = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    val fresh = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    val freshDup = corpus.filter(col("doc_id") % 14 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
    bloomAdmitOn(corpus, resent.union(fresh).union(freshDup))
      .select("doc_id").orderBy("doc_id")
  }

  /** Frame-based core (gate entry above; graft.api.DedupApi.bloomAdmit):
    * rows of `batch` admitted as genuinely new against `corpus`, one
    * survivor (min doc_id) per distinct batch text. Exact answer, bloom
    * routing — see [[dBloomDelta]]'s Scaladoc for the shape. Sketch knobs
    * follow the standard sizing rule bits ≈ 10–15 × expected corpus
    * count. */
  /** Hard cap on the bloom sketch size: 64 MB = 2^29 bits. The sketch is
    * embedded as a PLAN LITERAL (bloom_might_contain needs a scalar), so it
    * is serialized into every task closure — fine to tens of MB, pathological
    * at GBs. 2^29 bits at the 10–15 bits/item rule covers a ~40–50M-item
    * corpus per sketch; larger corpora shard by hash prefix (one admit per
    * shard), which is the documented 100 TB contract. */
  val MaxBloomBits: Long = 1L << 29

  def bloomAdmitOn(corpus: DataFrame, batch: DataFrame,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    require(numBits > 0 && numBits <= MaxBloomBits,
      s"numBits=$numBits exceeds MaxBloomBits=$MaxBloomBits (a 64 MB plan " +
        "literal); shard the corpus by hash prefix and admit per shard " +
        "instead of growing one sketch")
    GraftFunctions.register(corpus.sparkSession)
    // the sketch: one corpus pass, ~numBits/8 bytes on the driver (a model
    // value); might_contain requires a LITERAL/scalar sketch, hence the
    // collect
    val blob = corpus
      .agg(call_function("bloom_filter_agg", xxhash64(col("text")),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // Routing must NEVER drop a row (the bloom is an optimization, not a
    // semantic): an EMPTY corpus yields a NULL sketch (BloomFilterAggregate
    // with zero inputs), and a NULL maybe would fail BOTH filter legs and
    // silently reject the batch. So: null blob => skip the split entirely
    // (everything takes the exact leg, whose anti-join against an empty
    // corpus admits all); and any NULL maybe (e.g. NULL-text rows) is
    // coalesced to TRUE so the row reaches the exact leg, where the
    // anti-join's null-key-never-matches admits it — exactly the oracle's
    // NOT EXISTS semantics.
    val flagged = batch.withColumn("maybe",
      if (blob == null) lit(true)
      else coalesce(call_function("bloom_might_contain", lit(blob),
        xxhash64(col("text"))), lit(true)))
    val negatives = flagged.filter(!col("maybe")).select("doc_id", "text")
    val positives = flagged.filter(col("maybe")).select("doc_id", "text")
    val corpusHashes = corpus
      .select(sha2(col("text").cast("binary"), 256).as("h")).distinct()
    val positivesNew = positives
      .withColumn("h", sha2(col("text").cast("binary"), 256))
      .join(corpusHashes, Seq("h"), "left_anti")
      .select("doc_id", "text")
    negatives.union(positivesNew)
      .withColumn("h", sha2(col("text").cast("binary"), 256))
      .groupBy("h").agg(min("doc_id").as("doc_id"),
        first("text").as("text"))
      .select("doc_id", "text")
  }

  /** Same oracle semantics as d_incremental: the bloom routes work, the
    * answer is the exact anti-join. */
  val dBloomDeltaSql: String = dIncrementalSql

  // ----------------------------------------------------------- x_fingerprint
  /** 64-bit rolling fingerprint: a seeded-hash chain
    * fp_i = xxh64(w_i, seed = fp_{i-1}) — order-sensitive (unlike the shingle
    * sets), wrap-free under ANSI mode, equal iff texts equal w.h.p.
    * Native `RollingFingerprint` expression: round 1 built the chain from
    * transform+aggregate HOFs, which are CodegenFallback (interpreted, boxed
    * per word) — the one hot path that dodged codegen. Now one generated
    * static call per row, zero allocation. */
  def xFingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // orderBy below the kernel (round 17 — see TextAnalysis.langidOn): the
    // trailing sort's range-sample pass re-ran the fingerprint chain over
    // the corpus; sorting the raw rows first runs it once.
    withPlantedExact(docs(spark, dir))
      .orderBy("doc_id")
      .select(col("doc_id"),
        expr("rolling_fingerprint(text)").as("fingerprint"))
  }

  // ---------------------------------------------------------------- d_contam
  /** Benchmark decontamination — the training-data op that removes documents
    * overlapping an evaluation set. Eval set = every 25th doc's text (a
    * deterministic stand-in for a benchmark suite); a training doc is
    * contaminated when it shares ≥ MinHits distinct word-8-gram shingles
    * with any eval doc (the n-gram-overlap rule used for LLM corpus
    * decontamination).
    *
    * 100 TB shape: eval shingles are a SMALL relation (benchmarks are tiny
    * next to the corpus) → broadcast hash join against the corpus's
    * exploded shingles, then one partial-aggregated count per (doc, eval)
    * pair. The corpus is never shuffled whole, and since the planted
    * "training" side contains the eval docs themselves (doc ids differ),
    * the op must find exactly those — DedupSpec asserts it. */
  val ContamWidth = 8
  val MinHits = 3

  def dContam(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val corpus = withPlantedExact(docs(spark, dir))
      .select(col("doc_id"), expr(s"word_shingles(text, $ContamWidth)").as("sh"))
      .filter(size(col("sh")) > 0)
    val eval_ = docs(spark, dir).filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("eval_id"),
        expr(s"word_shingles(text, $ContamWidth)").as("sh"))
      .filter(size(col("sh")) > 0)
    val evalShingles = eval_.select(col("eval_id"), explode(col("sh")).as("h"))
    corpus.select(col("doc_id"), explode(col("sh")).as("h"))
      .join(broadcast(evalShingles), "h")
      .filter(col("doc_id") =!= col("eval_id"))
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_hits")) // shingle sets: distinct by construction
      .filter(col("n_hits") >= MinHits)
      .orderBy("doc_id", "eval_id")
  }

  // ---------------------------------------------------------------- d_cluster
  /** One large-star round [Kiveris et al. 2014]: every node u connects each
    * STRICTLY LARGER neighbor to m = min(Γ(u) ∪ {u}). Preserves
    * connectivity, strictly flattens tall components. */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val minN = nbrs.groupBy("u").agg(least(min("v"), col("u")).as("m"))
    nbrs.join(minN, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: orient each edge large→small; every node connects
    * its smaller neighbors (and itself) to the minimum of that set. */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    val minN = oriented.groupBy("u").agg(min("v").as("m"))
    oriented.join(minN, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(minN.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One fused large-star∘small-star contraction round — set-equal to
    * `smallStar(largeStar(edges))` (DedupSpec proves it on random graphs)
    * but two exchanges cheaper per round (VERDICT r7 #1a): the large-star
    * half's trailing `.distinct()` and the small-star half's leading
    * orient-and-distinct were back-to-back shuffles deduplicating the SAME
    * data. The large half's output is canonically oriented by construction
    * (each emitted pair is (v, m) with m ≤ u < v), so the small half can
    * consume it raw: `greatest`/`least` would be identities, duplicate
    * (u, v) rows leave every `min` untouched, and the round's trailing
    * `.distinct()` collapses whatever multiplicity the join arm carries.
    * Per-round cost falls from 7 hash exchanges to 5 with no volume
    * increase (every intermediate stays ≤ |edges| rows). */
  private[graft] def contractionRound(edges: DataFrame): DataFrame = {
    val nbrs = edges
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val minN = nbrs.groupBy("u").agg(least(min("v"), col("u")).as("m"))
    val ls = nbrs.join(minN, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
    val minN2 = ls.groupBy("u").agg(min("v").as("m"))
    ls.join(minN2, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(minN2.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components over the near-dup pair graph — pairwise dedup
    * (d_minhash) says "a≈b"; production dedup needs the transitive GROUPS
    * ("a,b,c are one document; keep one") because near-duplicates chain.
    *
    * Algorithm: alternating large-star/small-star contraction [Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC 2014] — the
    * round-3 min-label-propagation loop needed O(component diameter) rounds
    * and silently returned WRONG labels when a chain outlasted `maxIter`.
    * Star contraction converges in O(log² n) rounds worst case (≈log n in
    * practice: a 60-node chain takes 4 rounds, not 60), and non-convergence
    * now THROWS rather than mislabeling.
    *
    * Fixpoint test: the canonical (large→small) edge set is unchanged —
    * checked with one scalar aggregate (count + order-insensitive hash
    * checksum), not a collect. At the fixpoint every edge is (node,
    * component-min), so labels fall straight out of the edge list.
    *
    * 100 TB shape: the edge list holds ONLY docs that appear in some
    * near-dup pair (a small fraction of the corpus); each round is two
    * groupBy-min + equi-join passes over edges — no global structure, no
    * driver-side graph. Skewed mega-components (100 TB boilerplate) are
    * exactly what the large-star step splits: a node's larger neighbors
    * re-attach to the component min, so hub degree halves per round.
    * `localCheckpoint` each round truncates the otherwise-doubling lineage
    * (each round's plan references the last round's twice). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 15): DataFrame = {
    // LAZY localCheckpoint everywhere: the per-round checksum (the
    // convergence test, which must run anyway) is the action that
    // materializes each checkpoint — one Spark job per round, not two
    val raw = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(eager = false)
    // all nodes, captured from the RAW pair list BEFORE the self-pair
    // filter: a document whose only pair is (d, d) still gets a label
    // (itself) instead of silently vanishing from the output (ADVICE r4);
    // contraction itself never needs self-loops. Plain derived plan — reads
    // the checkpointed pairs once, at the final labeling join.
    val nodes = raw.select(col("u")).union(raw.select(col("v").as("u")))
      .distinct().withColumnRenamed("u", "id")
    var edges = raw.filter(col("u") =!= col("v"))
    // bit_xor: order-insensitive and overflow-free (ANSI sum of full-range
    // hashes would throw); edge sets are distinct so xor-cancellation is moot
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // a localCheckpoint's blocks are freed only when its RDD is GC'd —
    // without explicit release a 10-round run holds 10 materialized edge
    // sets concurrently; drop each superseded round as soon as the next one
    // is materialized (`raw` stays: `nodes` still reads it at the end, and
    // round-0 `edges` is a derived view of it, hence the iter > 0 guard)
    def releaseCheckpoint(df: DataFrame): Unit = Checkpoints.release(df)
    var sig = checksum(edges)
    var iter = 0
    var converged = false
    // ONE round per checksum action — deliberately. The tempting batching
    // (two contraction rounds per action, halving job count; floated in
    // VERDICT r6) was implemented and MEASURED SLOWER (+40% at sf0.1,
    // same session, everything else faster): with the intermediate round
    // only lazily checkpointed, its two consumer branches race to compute
    // the same partitions inside the one job ("Block already exists"
    // storms) — the duplicated upstream work costs more than the saved
    // job submissions, and an eager intermediate checkpoint would BE the
    // per-round action again. Details in BASELINE.md r7.
    while (!converged && iter < maxIter) {
      val next = contractionRound(edges).localCheckpoint(eager = false)
      val nextSig = checksum(next)
      if (iter > 0) releaseCheckpoint(edges)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(${sig._1} edges remain) — raise maxIter; labels would be wrong")
    // fixpoint edges are (node, component-min); isolated minima label themselves
    nodes.join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id").as("doc_id"), coalesce(col("v"), col("id")).as("cluster_id"))
  }

  /** Near-dup clusters from the minhash pipeline: each doc that has any
    * verified near-duplicate, labeled with its cluster (= min doc_id in the
    * component), plus per-cluster size — the "keep cluster_id, drop the
    * rest" dedup decision. Rows-only (hash pipeline); DedupSpec asserts the
    * planted chain collapses into one cluster and labels are component
    * minima. */
  def dCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(
      wordShingleSets(withPlantedNear(docs(spark, dir))), 0.5)
    val labeled = connectedComponents(pairs)
    val sizes = labeled.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------ d_soft
  /** Soft deduplication — down-WEIGHT duplicates instead of dropping them:
    * every copy survives with sampling weight 1/n_copies, so each distinct
    * text contributes unit total mass to the training distribution while
    * natural-duplication signal (which copies exist, in which sources) is
    * preserved for the loader to use. The drop-all-but-one policy (d_exact)
    * is the degenerate case; corpus builders increasingly prefer the soft
    * form because hard dedup measurably over-prunes high-quality boilerplate
    * (license texts, FAQs) that SHOULD appear with bounded weight.
    *
    * 100 TB shape: copy counts come from the partial-aggregated groupBy on
    * sha2(text) — a hot text (the exact row this operator targets) collapses
    * map-side to one row per partition, and only 32-byte hashes + counts
    * shuffle. The count table (one row per DISTINCT text) then hash-joins
    * back on the same 32-byte key; no window over the copies, so no hot-key
    * reducer. Weight emitted as an exact DECIMAL-free double 1.0/n. */
  def dSoft(spark: SparkSession, dir: String): DataFrame = {
    val corpus = withPlantedExact(docs(spark, dir))
      .withColumn("h", sha2(col("text").cast("binary"), 256))
    val counts = corpus.groupBy("h").agg(count(lit(1)).as("n_copies"))
    corpus.join(counts, "h")
      .select(col("doc_id"), col("n_copies"),
        round(lit(1.0) / col("n_copies"), 6).as("weight"))
      .orderBy("doc_id")
  }

  val dSoftSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0),
      |c AS (SELECT sha256(text) AS h, count(*) AS n_copies
      |      FROM all_docs GROUP BY 1)
      |SELECT doc_id, n_copies, round(CAST(1.0 AS DOUBLE) / n_copies, 6) AS weight
      |FROM all_docs JOIN c ON sha256(all_docs.text) = c.h
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------- d_url
  /** URL canonicalization dedup — the web-corpus staple: the same page is
    * crawled under cosmetically different URLs (default port, trailing
    * slash, utm_* tracking params, fragments), and byte-level URL equality
    * silently keeps every variant. The canonicalizer is a deterministic
    * regexp_replace chain in the Java∩RE2 dialect subset (RE2 has no
    * lookahead, so the port rule captures the char after the port — a
    * slash or end-of-authority — instead of asserting it): strip
    * fragment → strip utm_* params → strip the dangling separator → strip
    * the SCHEME'S default port (443 only for https, 80 only for http —
    * `https://h:80/p` is a distinct origin and is kept; the port is
    * stripped with or without a following path) → strip the trailing
    * slash; then exact-group on the canonical form. Each synthetic doc
    * carries one of TEN decoration
    * variants of its group's URL (id mod 10 picks the variant), so every
    * 10-doc group must collapse to ONE canonical page. Narrow projection +
    * one partial-aggregated groupBy on the canonical string — the d_exact
    * shuffle shape; at 100 TB the group key is a 32-byte hash of the
    * canonical form (same trade as d_exact, documented there). */
  def dUrl(spark: SparkSession, dir: String): DataFrame = {
    val g = (col("doc_id") / 10).cast("long")
    val base = concat(lit("https://ex"), g, lit(".com"))
    val path = concat(lit("/p/"), g)
    val m = col("doc_id") % 10
    val url = concat(base,
      when(m.isin(1, 6, 9), lit(":443")).otherwise(lit("")),
      path,
      when(m.isin(2, 6, 8), lit("/")).otherwise(lit("")),
      when(m === 4, lit("?utm_source=feed"))
        .when(m === 5, lit("?utm_medium=email#top"))
        .when(m === 7, lit("?utm_source=a&utm_campaign=b"))
        .when(m === 9, lit("/?utm_source=feed&utm_campaign=x#frag"))
        .otherwise(lit("")),
      when(m.isin(3, 8), lit("#section")).otherwise(lit("")))
    val canon =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(url, "#.*$", ""),
        "[?&]utm_[a-z]+=[^&#]*", ""),
        "[?&]$", ""),
        "^(https://[^/:]+):443(/|$)", "$1$2"),
        "^(http://[^/:]+):80(/|$)", "$1$2"),
        "/$", "")
    docs(spark, dir).select(col("doc_id"), canon.as("url"))
      .groupBy("url")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .orderBy("keep_id")
  }

  val dUrlSql: String =
    """WITH u AS (SELECT doc_id,
      |  'https://ex' || (doc_id // 10) || '.com'
      |  || CASE WHEN doc_id % 10 IN (1, 6, 9) THEN ':443' ELSE '' END
      |  || '/p/' || (doc_id // 10)
      |  || CASE WHEN doc_id % 10 IN (2, 6, 8) THEN '/' ELSE '' END
      |  || CASE doc_id % 10
      |       WHEN 4 THEN '?utm_source=feed'
      |       WHEN 5 THEN '?utm_medium=email#top'
      |       WHEN 7 THEN '?utm_source=a&utm_campaign=b'
      |       WHEN 9 THEN '/?utm_source=feed&utm_campaign=x#frag'
      |       ELSE '' END
      |  || CASE WHEN doc_id % 10 IN (3, 8) THEN '#section' ELSE '' END AS url
      |  FROM documents),
      |c AS (SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(url, '#.*$', '', 'g'),
      |    '[?&]utm_[a-z]+=[^&#]*', '', 'g'),
      |    '[?&]$', '', 'g'),
      |    '^(https://[^/:]+):443(/|$)', '\1\2'),
      |    '^(http://[^/:]+):80(/|$)', '\1\2'),
      |    '/$', '', 'g') AS url
      |  FROM u)
      |SELECT url, count(*) AS n_docs, min(doc_id) AS keep_id
      |FROM c GROUP BY url ORDER BY keep_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d_contam" -> (dContam _), "d_cluster" -> (dCluster _),
    "d_lines" -> (dLines _), "d_soft" -> (dSoft _), "d_url" -> (dUrl _),
    "d_exact" -> (dExact _), "d_minhash" -> (dMinhash _),
    "d_minhash_delta" -> (dMinhashDelta _),
    "d_ngram_jaccard" -> (dNgramJaccard _), "d_simhash" -> (dSimhash _),
    "d_embed_dup" -> (dEmbedDup _), "d_semantic" -> (dSemantic _),
    "x_fingerprint" -> (xFingerprint _),
    "d_incremental" -> (dIncremental _), "d_bloom_delta" -> (dBloomDelta _))

  val oracle: Map[String, String] = Map("d_exact" -> dExactSql,
    "d_incremental" -> dIncrementalSql, "d_bloom_delta" -> dBloomDeltaSql,
    "d_lines" -> dLinesSql,
    "d_soft" -> dSoftSql, "d_url" -> dUrlSql)
}
