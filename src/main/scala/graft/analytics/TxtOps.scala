package graft.analytics

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-curation operators (txt_*): tokens/quality/langid/classifier,
  * Gopher filter, TF-IDF, BPE training/encode, packing, splits, mixtures,
  * budget planner, rarity. Moved verbatim from LlmOps (round 15). */
private[analytics] trait TxtOps {
  this: OpsKernels with DedupOps with SimOps with IngestOps with LlmOracles =>


  // ---------------------------------------------------------- text analysis


  /** Token counting: whitespace tokens + a BPE-ish regex token stream
    * (letter runs | digit runs | single non-alnum). */
  def txtTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_ws_tokens"),
        expr(raw"size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0))").cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
      .orderBy(col("doc_id"))


  /** The ONE quality-scoring projection, shared by the reporting query
    * and the curation cut (a drifted copy would silently score and curate
    * with different formulas): every document with n_words/n_stop/n_punct
    * counters and the composite `quality` column. */
  private[analytics] def qualityScored(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", expr(toksSpark))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_stop", expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))").cast("long"))
      .withColumn("n_punct", length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")))
      .withColumn("quality",
        least(lit(1.0), col("n_words") / lit(100.0)) * 0.5
          + (lit(1.0) - col("n_punct") / nullif(length(col("text")), lit(0))) * 0.5)


  /** Quality scoring: length, stopword ratio, punctuation ratio, average
    * word length → composite score. */
  def txtQuality(spark: SparkSession, dir: String): DataFrame =
    qualityScored(spark, dir)
      .select(col("doc_id"), col("n_words"), col("n_stop"),
        (col("n_stop") / nullif(col("n_words"), lit(0))).as("stop_ratio"),
        (col("n_punct") / nullif(length(col("text")), lit(0))).as("punct_ratio"),
        col("quality"))
      .orderBy(col("doc_id"))


  /** Percentile QUALITY CURATION, stratified per language — the step that
    * turns [[txtQuality]]'s score into a kept corpus: within each
    * language, keep the top half of documents by (quality, doc_id) rank.
    * The cut is RANK-selected, not threshold-selected (rk <= ceil(n/2)
    * over the dense per-group ranking, q25's exact-selection idea), so
    * both engines agree exactly — a float threshold comparison could
    * disagree at a boundary ulp; a rank never can. Stratification
    * matters at corpus scale: a global cut would let one verbose
    * language crowd out another — per-group windows keep the mixture.
    * Plan: one text scan, one window shuffle on lang (tiny key), linear
    * elsewhere. */
  def txtQualityCut(spark: SparkSession, dir: String): DataFrame = {
    val wq = Window.partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    val wn = Window.partitionBy(col("lang"))
    qualityScored(spark, dir)
      .withColumn("rk", row_number().over(wq))
      .withColumn("n_lang", count(lit(1)).over(wn))
      .filter(col("rk") <= expr("CAST(ceil(n_lang * 0.5) AS BIGINT)"))
      .select(col("lang"), col("doc_id"), col("quality"), col("rk"), col("n_lang"))
      .orderBy(col("lang"), col("rk"))
  }


  /** Feature vocabulary of the classifier head: the flattened language-
    * marker stopword list (deduped, sorted for determinism) — multi-lingual
    * on purpose, the head scores any of the corpus's languages. */
  // lazy: declared ahead of langMarkers in object-init order
  private[analytics] lazy val classifierStops: Seq[String] = langMarkers.flatMap(_._2).distinct.sorted


  /** MODEL-BASED quality-classifier head — the learned-filter step every
    * production curation pipeline runs downstream of rule filters (CCNet's
    * fastText LM filter, Wenzek et al. 2020; GPT-3's WebText logistic
    * classifier, Brown et al. 2020 App. A): a LINEAR head over per-document
    * count features, here with FIXED integer weights standing in for the
    * trained coefficients (the container has no training stack, and the
    * oracle contract needs bit-exact cross-engine scores — a frozen,
    * versioned weight vector is also exactly how a deployed classifier
    * ships). Features are the Gopher-family counters ([[txtGopher]]'s
    * relatives): stopword hits (positive signal — fluent prose), very
    * short / very long tokens and repeated tokens (negative — gibberish,
    * boilerplate). Score = (n_toks + 4·n_stop − 2·n_short − 3·n_long −
    * 2·n_rep) / n_toks: ALL-BIGINT numerator, ONE final int/int IEEE
    * division (the txt_tfidf ratio trick — no transcendentals, no float
    * sums, so the cross-engine hash cannot wobble; a logistic sigmoid
    * would be monotone in this score and change no decision). keep =
    * score ≥ 1.0 with an n_toks ≥ 5 support floor. Plan: one text scan,
    * per-row lambda counters, no shuffle at all before the output sort —
    * embarrassingly parallel at any corpus size. */
  def txtClassifier(spark: SparkSession, dir: String): DataFrame =
    classifierScored(spark, dir)
      .select(col("doc_id"), col("n_toks"), col("n_stop"), col("n_short"),
        col("n_long"), col("n_rep"), col("score"))
      .withColumn("keep", col("n_toks") >= 5 && col("score") >= 1.0)
      .orderBy(col("doc_id"))


  /** The classifier head's scoring TABLE — per-doc count features + the
    * linear score, shared by [[txtClassifier]], [[txtClassifierSweep]],
    * [[ddDedupKeepBest]] and [[SimOps.ddSemdedupKeep]]. MEMOIZED as
    * prewarmed index state (round 20): the scan itself is map-only, but
    * its interpreted filter-lambda counters are the expensive part of any
    * consumer's plan, and FOUR consumers re-ran them over the full text
    * column. The memo keeps only the numeric feature columns (7 longs/
    * doubles per doc — KB-scale at any corpus the cache serves; a 100 TB
    * deployment materializes exactly this verdict table to storage). */
  private[analytics] def classifierScored(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "classifier_scored") {
      val stopsIn = classifierStops.map(w => s"'$w'").mkString(", ")
      Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("toks", expr(toksSpark))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN ($stopsIn)))").cast("long"))
        .withColumn("n_short", expr("size(filter(toks, t -> length(t) <= 2))").cast("long"))
        .withColumn("n_long", expr("size(filter(toks, t -> length(t) >= 12))").cast("long"))
        .withColumn("n_rep", (size(col("toks")) - size(array_distinct(col("toks")))).cast("long"))
        .withColumn("score",
          (col("n_toks") + lit(4L) * col("n_stop") - lit(2L) * col("n_short")
            - lit(3L) * col("n_long") - lit(2L) * col("n_rep"))
            / nullif(col("n_toks"), lit(0L)))
        // doc metadata rides along (ddDedupKeepBest emits it with the
        // keep verdict) — everything but the text/toks columns
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("n_toks"), col("n_stop"), col("n_short"),
          col("n_long"), col("n_rep"), col("score"))
    }


  /** CLASSIFIER THRESHOLD SWEEP — the calibration census a quality
    * classifier ships with: for each cut threshold on the
    * [[classifierScored]] grid (0.0 to 2.5 in half-point steps, the
    * operating range around the deployed score ≥ 1.0 cut), how many
    * documents survive and what corpus fraction that is. This is the
    * curve an operator reads to pick the keep threshold (the
    * aggressiveness/recall trade every CCNet/Gopher-style pipeline tunes)
    * — and it makes threshold drift visible: a weight change that moves
    * any cut's kept-count shows up as a hash mismatch here even if the
    * deployed cut's verdicts happen to agree. All six cuts share the
    * deployed n_toks ≥ 5 support floor. Plan: ONE text scan folded to a
    * single map-side-combinable 1-row aggregate (six conditional counts),
    * then a stack() unpivot of that row — no join, no shuffle beyond the
    * 1-row agg, constant output at any corpus size. */
  def txtClassifierSweep(spark: SparkSession, dir: String): DataFrame = {
    val ks = (0 to 5).map(r =>
      count(when(col("n_toks") >= 5 && col("score") >= lit(r / 2.0), 1)).as(s"k$r"))
    val stackArgs = (0 to 5)
      .map(r => s"CAST(${r / 2.0} AS DOUBLE), k$r").mkString(", ")
    classifierScored(spark, dir)
      .agg(count(lit(1)).as("n_docs"), ks: _*)
      .selectExpr(s"stack(6, $stackArgs) AS (threshold, n_keep)", "n_docs")
      .withColumn("keep_frac", col("n_keep") / col("n_docs"))
      .orderBy(col("threshold"))
  }


  /** N-gram-marker language ID: count marker-token hits per language,
    * argmax with a fixed priority order. (The synthetic corpus shares one
    * vocabulary across langs — the heuristic is exercised for determinism,
    * not accuracy.) */
  def txtLangid(spark: SparkSession, dir: String): DataFrame = {
    val markers = langMarkers.map { case (lang, ws) =>
      lang -> s"size(filter(toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
    }
    val d = Tables.documents(spark, dir).withColumn("toks", expr(toksSpark))
    val withScores = markers.foldLeft(d) { case (df, (lang, e)) =>
      df.withColumn(s"s_$lang", expr(e).cast("long"))
    }
    withScores.select(col("doc_id"), col("lang").as("lang_label"),
        col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
        expr(argmaxCase).as("pred_lang"))
      .orderBy(col("doc_id"))
  }


  /** Language-ID CONFUSION census — the acceptance readout for
    * [[txtLangid]], row-normalized against the corpus's ground-truth
    * `lang` label: one row per (true, predicted) cell with the count, the
    * true-language total, and the row fraction (the diagonal cell's
    * `frac` IS per-language recall). The classifier has no `zh` marker
    * list, so the zh row exposes exactly where its mass lands — the same
    * calibration-census pattern as dd_minhash_recall for banding. Scale
    * shape: the marker scoring is scan-side projection work, the
    * confusion fold is one map-side-combinable aggregation to O(langs²)
    * rows, and the window total runs over that constant-size frame. */
  def txtLangidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang_label"))
    txtLangid(spark, dir)
      .groupBy(col("lang_label"), col("pred_lang")).agg(count(lit(1)).as("n"))
      .withColumn("n_true", sum(col("n")).over(w))
      .withColumn("frac", col("n") / col("n_true"))
      .orderBy(col("lang_label"), col("pred_lang"))
  }


  private[analytics] lazy val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"))


  private[analytics] lazy val argmaxCase: String =
    """CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
      |     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
      |     WHEN s_es >= s_fr THEN 'es'
      |     ELSE 'fr' END""".stripMargin


  /** Term-frequency profile: top-20 tokens per language (explode →
    * map-side-combinable count → per-group rank). The TF building block of
    * a TF-IDF pipeline; shuffle bounded by distinct (lang, token). */
  def txtTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("lang"), explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
    val counts = tok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("t"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("rk"), col("t"), col("n"))
      .orderBy(col("lang"), col("rk"))
  }


  /** Document fingerprinting: md5 of normalized text + a 32-bit integer
    * fingerprint derived portably from the hex digest. */
  def txtFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
      .withColumn("fp", md5(col("norm")))
      .select(col("doc_id"), col("fp"), expr(hex8("fp")).cast("long").as("fp32"))
      .orderBy(col("doc_id"))


  /** TF-IDF profile (log-free variant): score = tf * n_docs / df as one
    * left-associated double expression — both engines produce the
    * bit-identical IEEE value, whereas ln()-based idf could differ in the
    * last ulp between libm implementations. df is counted over the FULL
    * corpus; output is top-3 terms for the first 50 docs. Shuffles are
    * bounded by distinct (doc, term) — the standard TF + DF two-aggregation
    * shape that scales linearly in total token count. */
  def txtTfidf(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"), explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
    val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val nDocs = broadcast(Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("t"))
    tf.filter(col("doc_id") < 50)
      .join(df, Seq("t"))
      .crossJoin(nDocs)
      .withColumn("score",
        expr("CAST(tf AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("t"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }


  /** Context-window chunking: split each document's token stream into
    * fixed 32-token chunks, one output row per chunk — the precursor to
    * training-sequence packing. Pure per-row array work inside one
    * projection (repartitioned for parallelism, posexplode_outer to dodge
    * the generator-filter pushdown), so it scales linearly with token
    * count and never shuffles the text. */
  def txtChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"),
        posexplode_outer(expr(
          "transform(sequence(0, greatest(CAST(ceil(size(toks) / 32.0) AS INT) - 1, 0)), " +
            "i -> array_join(slice(toks, i * 32 + 1, 32), ' '))")))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        length(col("col")).cast("long").as("chunk_chars"))
      .orderBy(col("doc_id"), col("chunk_idx"))


  /** Training-sequence PACKING on top of [[txtChunks]]: chunks are packed
    * into sequences with a 64-token budget by a running token total —
    * seq_id = floor((cumsum - n) / 64) over the (doc, chunk) order within
    * each lang shard. Packing within a partition key (lang here, a shard id
    * in production) is the scalable form: a single global packing order
    * would serialize into one window partition. Emits one row per packed
    * sequence with its chunk count and token total. */
  def txtPack(spark: SparkSession, dir: String): DataFrame =
    packBySequence(spark, dir,
      Window.partitionBy(col("lang")).orderBy(col("doc_id"), col("chunk_idx")))


  /** Length-DESCENDING (next-fit-decreasing) packing — the sorted
    * refinement of [[txtPack]]: within each lang shard the chunks pack in
    * (n_toks DESC, doc_id, chunk_idx) order, so the full 32-token chunks
    * pair into exactly-64-token sequences first and the short document
    * tails backfill the end of the shard. NOT true first-fit-decreasing:
    * sequences are still cut by a running-sum boundary (a chunk can
    * straddle the 64-token budget rather than opening a new bin), which is
    * what keeps it one window pass per shard with no global order.
    * Deterministic (ties break on doc ids) and identical shapes/scale to
    * v1. PackingSpec's fill-rate >= v1 pin is EMPIRICAL on the committed
    * sf0.001 data, not a theorem — descending order can lose to arrival
    * order on adversarial size sequences (e.g. [24,40,24,40]). */
  def txtPackFfd(spark: SparkSession, dir: String): DataFrame =
    packBySequence(spark, dir,
      Window.partitionBy(col("lang"))
        .orderBy(col("n_toks").desc, col("doc_id"), col("chunk_idx")))


  /** Packer-selection census — the report that decides between the two
    * packing strategies: per (strategy, lang shard), sequence count, chunk
    * and token totals, the largest packed sequence, and the fill rate
    * (tokens per 64-token budget slot, ONE int/int IEEE division). Both
    * strategies pack the same chunks, so token totals agree line-for-line
    * and the comparison isolates to n_seqs/fill — exactly the readout a
    * pipeline uses to pick its packer per corpus. Composes [[txtPack]] and
    * [[txtPackFfd]] verbatim (the [[simIvfRecall]] consistency rule: the
    * report cannot drift from what the packers emit); evaluating both
    * packings is the inherent price of comparing them — each side costs
    * its own floor, and the per-seq frames this aggregates are already
    * k-rows-per-shard small. */
  def txtPackReport(spark: SparkSession, dir: String): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_chunks")).as("n_chunks"),
          sum(col("n_toks_total")).as("n_toks"),
          max(col("n_toks_total")).as("max_seq_toks"))
        .withColumn("strategy", lit(tag))
    side(txtPack(spark, dir), "arrival")
      .unionByName(side(txtPackFfd(spark, dir), "length_desc"))
      .withColumn("fill", col("n_toks") / (col("n_seqs") * lit(64)))
      .select(col("strategy"), col("lang"), col("n_seqs"), col("n_chunks"),
        col("n_toks"), col("max_seq_toks"), col("fill"))
      .orderBy(col("strategy"), col("lang"))
  }


  /** Shared chunk-size derivation + running-total packing under the given
    * per-shard window order (see [[txtPack]] for the scheme). */
  private[analytics] def packBySequence(spark: SparkSession, dir: String,
      order: org.apache.spark.sql.expressions.WindowSpec): DataFrame = {
    val chunks = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"), col("lang"),
        posexplode_outer(expr(
          "transform(sequence(0, greatest(CAST(ceil(size(toks) / 32.0) AS INT) - 1, 0)), " +
            "i -> least(greatest(size(toks) - i * 32, 0), 32))")))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), col("lang"), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("n_toks"))
    chunks
      .withColumn("cum", sum(col("n_toks")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seq_id", expr("(cum - n_toks) div 64"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_toks")).as("n_toks_total"))
      .orderBy(col("lang"), col("seq_id"))
  }


  /** Scrubbing / redaction (the cleaning stage of a training pipeline):
    * URLs, e-mail addresses, phone numbers and IPv4 addresses are replaced
    * by placeholder tokens (in that order — URLs first so addresses inside
    * them are already gone); the query emits the scrubbed-text fingerprint
    * plus how many characters each rule removed. All four patterns use
    * only constructs with identical semantics in Java regex and RE2 (no
    * lookaround, no backrefs; \b is the ASCII word boundary in both), so
    * the oracle applies them verbatim. Pure per-row work — scales
    * linearly, no shuffle before the final sort. */
  def txtScrub(spark: SparkSession, dir: String): DataFrame = {
    val urlRe = raw"https?://\S+"
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val phoneRe = raw"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
    val ipRe = raw"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
    Tables.documents(spark, dir)
      .withColumn("no_url", regexp_replace(col("text"), urlRe, "<url>"))
      .withColumn("no_email", regexp_replace(col("no_url"), emailRe, "<email>"))
      .withColumn("no_phone", regexp_replace(col("no_email"), phoneRe, "<phone>"))
      .withColumn("clean", regexp_replace(col("no_phone"), ipRe, "<ip>"))
      .select(col("doc_id"),
        md5(col("clean")).as("clean_fp"),
        (length(col("text")) - length(col("no_url"))).cast("long").as("url_chars_delta"),
        (length(col("no_url")) - length(col("no_email"))).cast("long").as("email_chars_delta"),
        (length(col("no_email")) - length(col("no_phone"))).cast("long").as("phone_chars_delta"),
        (length(col("no_phone")) - length(col("clean"))).cast("long").as("ip_chars_delta"),
        length(col("clean")).cast("long").as("n_chars_clean"))
      .orderBy(col("doc_id"))
  }


  /** Gopher/C4-style repetition + quality signals per document (in the
    * spirit of the publicly described Gopher rules — Rae et al. 2021,
    * "Scaling Language Models", §A1.1): duplicate-line fraction,
    * most-frequent-bigram mass, bullet-line fraction, mean word length,
    * and a composite keep/drop verdict. Everything except the bigram mass
    * is a pure per-row expression; the bigram mass is an explode → two
    * map-side-combinable aggregations keyed by doc_id, so the whole query
    * costs one scan plus one doc-keyed shuffle at any corpus size (the
    * shuffled rows are (doc, bigram, count) partial aggregates, never the
    * text). */
  def txtGopher(spark: SparkSession, dir: String): DataFrame =
    gopherScored(spark, dir).orderBy(col("doc_id"))


  /** The Gopher verdict TABLE behind [[txtGopher]] — MEMOIZED as prewarmed
    * index state (round 20): three consumers re-ran the full stats scan
    * ([[txtGopher]] itself, [[txtCleanCorpus]] and [[txtCurationFunnel]],
    * which each need only (doc_id, passes)), and the scan's interpreted
    * line/bigram lambdas are the expensive part. Per-doc numeric columns
    * only — KB-scale cache; a production curation pipeline materializes
    * exactly this per-stage verdict table. */
  private[analytics] def gopherScored(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "gopher_scored") {
    val base = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
    val perRow = base
      .withColumn("lns",
        filter(transform(split(col("text"), "\n"), l => trim(l)), l => l =!= ""))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        size(col("lns")).cast("long").as("n_lines"),
        (size(col("lns")) - size(array_distinct(col("lns")))).cast("long").as("n_dup"),
        expr("size(filter(lns, l -> substr(l, 1, 2) IN ('- ', '* ')))").cast("long").as("n_bullet"),
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").as("sum_wl"),
        greatest(size(col("toks")).cast("long") - 1L, lit(0L)).as("n_bigrams"))
      // identity aggregation over the unique doc_id: the values are
      // untouched (one row per group) but consumers' predicates on these
      // signals — e.g. txt_clean_corpus filtering on `passes` — can no
      // longer be conjunct-split and pushed below it into the scan, where
      // the interpreted lambda metrics would re-run single-threaded ahead
      // of the repartition (the InferFilters pathology, PLANS.md). The
      // exchange this adds was already needed for the bigram-census join.
      .groupBy(col("doc_id"))
      .agg(min(col("n_words")).as("n_words"), min(col("n_lines")).as("n_lines"),
        min(col("n_dup")).as("n_dup"), min(col("n_bullet")).as("n_bullet"),
        min(col("sum_wl")).as("sum_wl"), min(col("n_bigrams")).as("n_bigrams"))
    // explode_outer + isNotNull (not explode): see buildJaccardPairs for the
    // InferFiltersFromGenerate pushdown pathology this dodges.
    val bg = base.select(col("doc_id"), explode_outer(expr(
        "case when size(toks) >= 2 then transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i+1])) else array() end")).as("b"))
      .filter(col("b").isNotNull)
    val top = bg.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("top_n"))
    perRow.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_lines"),
        (col("n_dup") / nullif(col("n_lines"), lit(0))).as("dup_line_frac"),
        (col("n_bullet") / nullif(col("n_lines"), lit(0))).as("bullet_frac"),
        (col("sum_wl") / nullif(col("n_words"), lit(0))).as("mean_word_len"),
        (col("top_n") / nullif(col("n_bigrams"), lit(0))).as("top_bigram_frac"),
        (col("n_words") >= 5 && col("n_words") <= 100000 &&
          (col("sum_wl") / nullif(col("n_words"), lit(0))).between(2.0, 12.0) &&
          (col("n_dup") / nullif(col("n_lines"), lit(0))) <= 0.5 &&
          (col("top_n") / nullif(col("n_bigrams"), lit(0))) <= 0.3 &&
          (col("n_bullet") / nullif(col("n_lines"), lit(0))) <= 0.5).as("passes"))
  }


  /** Token-LENGTH HISTOGRAM (log2 buckets) per language — the length
    * distribution every corpus data card reports, and the input to
    * sequence-length planning (packing budget, truncation point). Bucket
    * arithmetic is INTEGER on both engines — length(bin(n)) - 1 is
    * floor(log2(n)) without the float log2 whose last-ulp rounding can
    * disagree across libm implementations at exact powers of two. One
    * map-side-combinable aggregation over per-row token counts. */
  def txtLenHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", expr(toksSpark))
      .select(col("lang"), greatest(size(col("toks")).cast("long"), lit(1L)).as("n_toks"))
      .withColumn("bucket_log2", (length(expr("bin(n_toks)")) - 1).cast("long"))
      .groupBy(col("lang"), col("bucket_log2"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_toks")).as("min_toks"),
        max(col("n_toks")).as("max_toks"))
      .orderBy(col("lang"), col("bucket_log2"))


  /** VOCABULARY COVERAGE — the tokenizer-design readout: what fraction of
    * all token OCCURRENCES in the corpus is covered by the top-N most
    * frequent token types, for N in {4, 8, 16}. The curve that decides
    * vocab size before training a tokenizer (diminishing coverage per
    * added type). The cut points are sized to the synthetic corpus's
    * 31-type vocabulary so every row exists at every SF (production runs
    * would use {1k, 16k, 64k}); the SHAPE — rank window over aggregated
    * type counts — is threshold-independent. Scale shape: the occurrence counting is one map-side
    * combinable groupBy over tokens; the ranking window then runs over the
    * AGGREGATED type table only, which is vocabulary-sized (Heaps' law:
    * |V| grows ~sqrt of corpus), not corpus-sized — the standard shape for
    * frequency-rank statistics. Ties rank deterministically by (count
    * desc, token). */
  def txtVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("t"))
    val ranked = counts
      .withColumn("rk", row_number().over(w))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = counts.agg(sum(col("n")).as("total"))
    ranked.filter(col("rk").isin(4, 8, 16))
      .join(broadcast(total))
      .select(col("rk").cast("long").as("vocab_size"),
        col("cum").as("covered_occurrences"),
        col("total").as("total_occurrences"),
        (col("cum") / col("total")).as("coverage"))
      .orderBy(col("vocab_size"))
  }


  /** BPE PAIR CENSUS — the tokenizer-training readout next to
    * [[txtVocabCoverage]]: corpus-wide adjacent-symbol-pair frequencies
    * over the initial character vocabulary, i.e. exactly the count table
    * whose argmax is the FIRST merge of byte-pair-encoding training
    * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
    * with Subword Units", Algorithm 1: pairs are counted WITHIN words,
    * weighted by word occurrence — both properties hold here: pairs never
    * cross token boundaries, and every token instance contributes). Top
    * pair = the first merge; re-running after applying a merge (symbols
    * become merged units) is the training loop itself. Scale shape: two
    * chained explodes (token stream → in-token char pairs), then ONE
    * map-side-combinable count keyed by the 2-char pair — shuffle volume
    * is bounded by the pair vocabulary (≤ alphabet², a constant), not the
    * corpus; the explode stream itself never shuffles. Deterministic
    * (n desc, pair) top-100. */
  def txtBpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
      .select(explode_outer(expr(
        "case when length(t) >= 2 then transform(sequence(1, length(t) - 1), " +
          "i -> substr(t, i, 2)) else array() end")).as("pair"))
      .filter(col("pair").isNotNull)
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(100)


  /** Merge-placeholder symbol for BPE round `r` (0-based): the Unicode
    * NONCHARACTER U+FDD0+r. Noncharacters are permanently unassigned and
    * excluded from interchanged text by Unicode conformance (C2/D14), so
    * no real corpus — including arbitrary web text arriving through
    * [[graft.sources.JsonlDocs]] — can legitimately contain one; a
    * printable placeholder (the old 'º') collides with e.g. Spanish "nº"
    * and conflates merged symbols with literal text in later censuses.
    * Mirrored as chr($BpeSentinelBase + r) in DuckDB — BOTH engines
    * derive the codepoint from the single [[BpeSentinelBase]] constant,
    * so the placeholder alphabet cannot drift between them (the same
    * one-site rule as [[IncrementalSplit]]). */
  private[analytics] lazy val BpeSentinelBase = 0xFDD0

  private[analytics] def bpeSentinel(r: Int): String = (BpeSentinelBase + r).toChar.toString


  /** The token stream + in-token adjacent-pair census shared by the BPE
    * training queries: pairs never cross token boundaries, every token
    * instance contributes (Sennrich Algorithm 1's count), and the shuffle
    * is bounded by the pair vocabulary (≤ symbols²), never the corpus. */
  private[analytics] def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)


  private[analytics] def bpePairCensus(tf: DataFrame, tcol: String): DataFrame = tf
    .select(explode_outer(expr(
      s"case when length($tcol) >= 2 then transform(sequence(1, length($tcol) - 1), " +
        s"i -> substr($tcol, i, 2)) else array() end")).as("pair"))
    .filter(col("pair").isNotNull)
    .groupBy(col("pair")).agg(count(lit(1)).as("n"))


  /** BPE TRAINING STEP — the round [[txtBpePairs]] only counts: APPLY the
    * most frequent pair's merge and emit the round-2 census, i.e. one full
    * iteration of Sennrich et al.'s Algorithm 1 (count pairs → merge the
    * argmax everywhere → recount). The merged pair is rewritten to the
    * single placeholder symbol [[bpeSentinel]](0) (a Unicode noncharacter,
    * so a 2-char sliding window again reads adjacent SYMBOLS and no
    * corpus text can collide; both engines' `replace` is left-to-right
    * non-overlapping — exactly BPE's greedy merge order within a word).
    * The argmax rides a 1-row broadcast onto the token stream; everything
    * else is the same alphabet²-bounded map-side census as round 1. Two
    * document scans total (census + re-census) — production BPE trainers
    * pay the same shape per round. */
  def txtBpeMerge(spark: SparkSession, dir: String): DataFrame = {
    val toks = bpeTokens(spark, dir)
    // round 20: the round-1 argmax IS the memoized merge table's first row
    // (bpeMergeTable computes the identical census/argmax as its round 1),
    // so the trainer-step query reads the 1-row leaf instead of re-paying
    // a full tokenize + pair-census scan for it — one corpus scan total.
    val top1 = bpeMergeTable(spark, dir).filter(col("round") === 1L)
      .select(col("pair").as("mp"))
    val merged = toks.crossJoin(broadcast(top1))
      .select(expr(s"replace(t, mp, '${bpeSentinel(0)}')").as("t2"))
    bpePairCensus(merged, "t2")
      .orderBy(col("n").desc, col("pair"))
      .limit(100)
  }


  /** How many merge rounds [[txtBpeVocab]] trains — bounded like the
    * PageRank unroll; each round is one scan + one alphabet²-bounded
    * census, so k rounds cost k scans, linear at any corpus size. */
  private[analytics] lazy val BpeVocabRounds = 4


  /** MULTI-ROUND BPE TRAINING — the trainer ARTIFACT [[txtBpeMerge]]'s
    * single iteration only gestures at: [[BpeVocabRounds]] rounds of
    * count → argmax → merge-everywhere, emitting the MERGE TABLE
    * (round, pair, n) — the ordered merge list IS what a BPE tokenizer
    * ships (Sennrich et al. 2016, Algorithm 1 run to k merges). Round r's
    * winning pair is rewritten to [[bpeSentinel]](r-1), so later rounds
    * treat merged units as single symbols and can merge ACROSS earlier
    * merges (pair strings from round ≥ 2 may contain earlier sentinels —
    * that is the recursive structure of a real BPE vocabulary). Each
    * round's 1-row argmax is materialized via a local checkpoint (the
    * dd_cluster pattern): without the 1-row barrier the round-r census
    * would replay every earlier census through its own argmax subtree —
    * exponential in rounds — whereas with it each round costs ONE pass
    * over the token stream with r broadcast replaces riding along. */
  def txtBpeVocab(spark: SparkSession, dir: String): DataFrame =
    bpeMergeTable(spark, dir).orderBy(col("round"))


  /** The TRAINED MERGE TABLE — [[BpeVocabRounds]] rows of (round, pair, n),
    * each round's 1-row argmax a local-checkpointed leaf — memoized so the
    * trainer ([[txtBpeVocab]]) and the encoder ([[txtBpeEncode]]) share ONE
    * training run per (session, dir): the tokenizer artifact is built once
    * and consumed twice, exactly the production relationship between a BPE
    * trainer and the encode path it ships merges to. */
  private[analytics] def bpeMergeTable(spark: SparkSession, dir: String): DataFrame =
    memoRaw(spark, dir, "bpe_merges") {
      var cur = bpeTokens(spark, dir)
      val rounds = (1 to BpeVocabRounds).map { r =>
        val top1Plan = bpePairCensus(cur, "t")
          .orderBy(col("n").desc, col("pair")).limit(1)
          .select(lit(r.toLong).as("round"), col("pair"), col("n"))
        val rdd = top1Plan.rdd
        rdd.localCheckpoint()
        rdd.count() // materialize: the 1-row barrier that keeps rounds linear
        trackRdd(rdd)
        val top1 = spark.createDataFrame(rdd, top1Plan.schema)
        cur = cur.crossJoin(broadcast(top1.select(col("pair").as("mp"))))
          .select(expr(s"replace(t, mp, '${bpeSentinel(r - 1)}')").as("t"))
        top1
      }
      rounds.reduce(_ union _)
    }


  /** BPE ENCODE — the trained artifact APPLIED, closing the tokenizer
    * lifecycle the way [[simIvfServe]] closes the index lifecycle: every
    * document's token stream is rewritten through the [[bpeMergeTable]]
    * merge list in training order (merge r's pair may contain earlier
    * sentinels — the recursive vocabulary structure — so application order
    * IS the correctness contract), then summarized per document as raw
    * char count vs post-merge symbol count (each sentinel = one symbol) —
    * the compression a tokenizer buys, the per-doc statistic a training
    * pipeline bills sequence budgets with. Plan: ONE documents scan with
    * [[BpeVocabRounds]] 1-row broadcast merge pairs riding along and all
    * counting in per-row lambdas — no shuffle before the output sort,
    * embarrassingly parallel at any corpus size (the training cost lives
    * in the shared memoized merge table, paid once per session). */
  def txtBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergeTable(spark, dir)
    val replaced = (1 to BpeVocabRounds).foldLeft("t") { (acc, r) =>
      s"replace($acc, mp$r, '${bpeSentinel(r - 1)}')"
    }
    val docs = Tables.documents(spark, dir).withColumn("toks", expr(toksSpark))
    val withMerges = (1 to BpeVocabRounds).foldLeft(docs) { (df, r) =>
      df.crossJoin(broadcast(
        merges.filter(col("round") === r.toLong).select(col("pair").as(s"mp$r"))))
    }
    withMerges
      .withColumn("etoks", expr(s"transform(toks, t -> $replaced)"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("aggregate(toks, CAST(0 AS BIGINT), (a, t) -> a + length(t))").as("n_chars"),
        expr("aggregate(etoks, CAST(0 AS BIGINT), (a, t) -> a + length(t))").as("n_symbols"))
      .withColumn("n_saved", col("n_chars") - col("n_symbols"))
      .withColumn("ratio", col("n_symbols") / nullif(col("n_chars"), lit(0L)))
      .orderBy(col("doc_id"))
  }


  /** Sketch-based TERM-FREQUENCY estimation — the 100 TB path for term
    * statistics (q20/q31/q33's verified-sketch pattern, for counts): a
    * count-min sketch built over all token occurrences (one mergeable
    * map-side-combinable aggregate — no type-table shuffle), shipped as a
    * scalar subquery, probed for the exact top-8 terms via the
    * [[org.apache.spark.sql.graft.CmsEstimate]] expression. Raw estimates
    * are engine-specific, so the oracle-checked output carries the exact
    * counts (DuckDB recomputes and hash-matches) plus two CMS-guarantee
    * booleans the oracle pins TRUE: no_underestimate (CMS never
    * undercounts) and bounded (overcount <= eps * total occurrences,
    * eps = 1e-4). A drifting sketch flips a boolean and fails the hash
    * match, so the estimate is genuinely verified without cross-engine
    * sketch equality. */
  def txtTopTermsCms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.CmsBridge
    val tok = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
    val sketch = tok.agg(CmsBridge.cmsAgg(col("t"), 1e-4, 0.99, 42).as("cms")).scalar()
    val counts = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.orderBy(col("n").desc, col("t")).limit(8)
      .join(broadcast(total))
      .withColumn("est", CmsBridge.estimate(sketch, col("t")))
      .select(col("t").as("term"), col("n").as("n_exact"),
        (col("est") >= col("n")).as("no_underestimate"),
        ((col("est") - col("n")) <= col("total") * 1e-4).as("bounded"))
      .orderBy(col("n_exact").desc, col("term"))
  }


  /** WITHIN-document duplicate n-gram fraction — the Gopher repetition rule
    * [[txtGopher]] doesn't carry (Rae et al. 2021 §A1.1 lists duplicate
    * 5..8-gram fractions as their own filters next to dup-line and
    * top-bigram mass): per doc, the share of its 8-token windows that are
    * repeats of an earlier window IN THE SAME doc. Complements
    * [[ddDupFraction]] (cross-doc) on the same PassageHash explode; one
    * doc-keyed map-side-combinable aggregation, fingerprints-only
    * shuffle. */
  def txtDupNgrams(spark: SparkSession, dir: String): DataFrame =
    passageWindows(spark, dir, 8)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("w")).as("n_distinct"))
      .select(col("doc_id"), col("n_windows"), col("n_distinct"),
        ((col("n_windows") - col("n_distinct")) / col("n_windows")).as("dup_ngram_frac"))
      .orderBy(col("doc_id"))


  /** Deterministic class re-balancing for training mixes: cap every lang at
    * 64 docs, chosen by md5(doc_id) order — a seedless, partitioning-
    * independent "random" sample that is reproducible across engines and
    * cluster sizes (rand()-based sampleBy is neither). One window pass per
    * class; at scale the same shape caps any majority class without a
    * global sort. */
  def txtBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 64)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }


  /** The composed CLEANING PIPELINE — what a training-data run actually
    * executes, as one operator: a doc survives iff it (a) passes the
    * Gopher-style quality filter, (b) is the canonical copy of its exact-
    * duplicate group (min doc_id per content hash), and (c) is not the
    * dropped side of any near-duplicate pair. Composition is three
    * semi/anti joins over operators that already exist — the near-dup
    * side reuses the memoized checkpointed pairs table, so running this
    * after any dd_* query adds only the joins. Demonstrates that the
    * operator set composes into the end-to-end corpus-cleaning job. */
  /** Exact-dedup canonical flag: true iff the row's doc_id is the min of
    * its identical-text (md5) group — ONE definition of the
    * canonicalization for [[txtCleanCorpus]] and [[txtCurationFunnel]],
    * in window form (the q39 lesson: a window over the dedup key rides
    * the same scan/shuffle instead of a separate groupBy + join-back). */
  private[analytics] def exactKeepFlag: Column =
    col("doc_id") === min(col("doc_id")).over(Window.partitionBy(md5(col("text"))))


  def txtCleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val passes = gopherScored(spark, dir).filter(col("passes")).select(col("doc_id"))
    val nearDrops = nearDropSet(spark, dir)
    docs.withColumn("f_x", exactKeepFlag)
      .filter(col("f_x"))
      .join(passes, Seq("doc_id"), "left_semi")
      .join(nearDrops, col("doc_id") === col("ib"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }


  /** CURATION FUNNEL — the per-stage loss accounting for the clean-corpus
    * chain ([[txtCleanCorpus]] emits the survivors; this emits the REPORT
    * a pipeline dashboard shows): how many docs enter, survive, and drop
    * at each gate — quality (Gopher), exact dedup (min-id per md5 text
    * group), near-dup (the Jaccard-0.8 drop set) — each stage measured on
    * the previous stage's survivors, plus every stage's kept fraction of
    * the RAW corpus. The no-silent-drops rule applied to curation itself:
    * ingestion has ingest_quarantine, the LSH probe has
    * dd_incremental_capped, this is the same contract for the filter
    * chain. Plan: the doc_id spine carries the exact-dedup verdict as a
    * window over the same scan ([[exactKeepFlag]] — no separate groupBy +
    * join-back), the quality and near-dup verdicts arrive as two left
    * joins (the drop set rides the memoized jaccard pairs; the gopher
    * stat chain is its own scan by nature), and everything folds to ONE
    * map-side-combinable row of four conditional counts, then a 4-row
    * stack() unpivot (the txt_classifier_sweep shape) — constant output
    * at any corpus size. count(when(...)) not sum(when(...)): count is
    * 0 on an empty corpus, matching the Duck FILTER semantics. */
  def txtCurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val passes = gopherScored(spark, dir).filter(col("passes"))
      .select(col("doc_id"), lit(1L).as("f_q"))
    val nearDrops = nearDropSet(spark, dir).withColumn("f_n", lit(1L))
    val counts = docs.select(col("doc_id"), exactKeepFlag.as("f_x"))
      .join(passes, Seq("doc_id"), "left")
      .join(nearDrops, col("doc_id") === col("ib"), "left")
      .agg(
        count(lit(1)).as("n0"),
        count(when(col("f_q") === 1L, 1)).as("n1"),
        count(when(col("f_q") === 1L && col("f_x"), 1)).as("n2"),
        count(when(col("f_q") === 1L && col("f_x") && col("f_n").isNull, 1)).as("n3"))
    counts.select(
      expr("""stack(4,
        0L, 'raw',            n0, n0,
        1L, 'quality_gopher', n0, n1,
        2L, 'exact_dedup',    n1, n2,
        3L, 'near_dedup',     n2, n3) AS (stage_id, stage, n_in, n_kept)"""),
      col("n0"))
      .withColumn("n_dropped", col("n_in") - col("n_kept"))
      .withColumn("kept_frac", col("n_kept") / col("n0"))
      .select(col("stage_id"), col("stage"), col("n_in"), col("n_kept"),
        col("n_dropped"), col("kept_frac"))
      .orderBy(col("stage_id"))
  }


  /** Synthetic CONTACT-BLOCK enrichment — the PII family's input
    * derivation, the [[DedupOps.urlRawSql]] convention applied to text:
    * the driver corpus carries no PII-shaped string at all (verified:
    * zero matches for all four scrub patterns at every SF), so
    * detection/redaction queries over raw text would gate nothing.
    * Deterministic contact fragments derive from doc_id — an e-mail
    * (every 3rd doc), a phone number (every 5th), an IPv4 (every 7th),
    * a URL (every 11th); the mods overlap, so docs carry 0..4 plants.
    * ONE fragment shared VERBATIM by both engines: pure concatenation,
    * no regexes, no backslashes. */
  private[analytics] lazy val piiRawSql =
    "(text" +
      " || CASE WHEN doc_id % 3 = 1 THEN (' contact user' || CAST(doc_id AS STRING) ||" +
      " '@mail' || CAST(doc_id % 7 AS STRING) || '.example.com') ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 2 THEN (' call 415-555-' ||" +
      " substr(CAST(10000 + doc_id % 10000 AS STRING), 2, 4)) ELSE '' END" +
      " || CASE WHEN doc_id % 7 = 3 THEN (' host 10.' || CAST(doc_id % 256 AS STRING) ||" +
      " '.0.' || CAST(doc_id % 100 AS STRING)) ELSE '' END" +
      " || CASE WHEN doc_id % 11 = 4 THEN (' see https://www.ref' ||" +
      " CAST(doc_id % 50 AS STRING) || '.example.org/faq') ELSE '' END)"

  /** The four PII patterns, ordered for redaction (URLs first, so
    * addresses inside them are already gone). Backslash-free on purpose —
    * the SAME Scala constant is injected into Spark's Column-API regex
    * argument (Java regex, taken raw) and into the DuckDB oracle's
    * single-quoted literal (RE2): with no backslash and no escape-bearing
    * construct, the two engines compile the identical pattern, and
    * neither engine's string-literal escaping can bite (the "ip" entry
    * uses `[.]` classes for that reason, like urlNormSql). */
  private[graft] lazy val piiRes: Seq[(String, String)] = Seq(
    "url" -> "https?://[^ ]+",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ip" -> "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}")

  /** Per-doc PII detection over the enriched text: match counts per
    * category (on the RAW enriched text — counts are independent of
    * redaction order) plus source, shared by the per-doc readout and the
    * census. Pure per-row scan work, codegen'd regexp_count. */
  private[analytics] def piiScored(spark: SparkSession, dir: String): DataFrame =
    piiScoredOver(Tables.documents(spark, dir))

  /** The same scoring over an arbitrary (doc_id, source, text) frame —
    * streaming-safe (pure per-row projection, no window/aggregation), so
    * [[graft.streaming.EventStream.piiCensus]] applies the identical
    * fragment to arriving documents. */
  private[graft] def piiScoredOver(docs: DataFrame): DataFrame = {
    val scored = piiRes.foldLeft(
      docs.selectExpr("doc_id", "source", s"$piiRawSql AS raw")) {
      case (df, (cat, re)) =>
        df.withColumn(s"n_${cat}s", regexp_count(col("raw"), lit(re)).cast("long"))
    }
    val clean = piiRes.foldLeft(col("raw")) { case (c, (cat, re)) =>
      regexp_replace(c, re, s"<$cat>")
    }
    scored.withColumn("clean", clean)
  }

  /** PII DETECTION + REDACTION readout — the per-doc stage of the
    * RefinedWeb/CCNet-style PII pass over the contact-enriched corpus
    * ([[piiRawSql]]): per doc, how many URLs/e-mails/phones/IPv4s were
    * found, the redacted-text fingerprint, and how many characters
    * redaction removed. Differs from [[txtScrub]] (raw corpus, char
    * deltas per rule) in running over text that provably CONTAINS PII at
    * every SF — the detection path is exercised, not vacuously green.
    * Linear per-row work; no shuffle before the final sort. */
  def txtPii(spark: SparkSession, dir: String): DataFrame =
    piiScored(spark, dir)
      .select(col("doc_id"), col("n_urls"), col("n_emails"), col("n_phones"),
        col("n_ips"), md5(col("clean")).as("clean_fp"),
        (length(col("raw")) - length(col("clean"))).cast("long").as("chars_redacted"))
      .orderBy(col("doc_id"))

  /** ONE definition of the census semantics shared by the batch rollup
    * and the streaming complete-mode twin
    * ([[graft.streaming.EventStream.piiCensus]]): the any-PII predicate
    * (derived from [[piiRes]], so a fifth category extends both engines
    * and both runtimes together) and the aggregate list. */
  private[graft] lazy val piiHasPii: Column =
    piiRes.map { case (cat, _) => col(s"n_${cat}s") }.reduce(_ + _) > 0
  private[graft] lazy val piiCensusAggs: Seq[Column] =
    Seq(count(lit(1)).as("n_docs"), count(when(piiHasPii, 1)).as("n_docs_pii")) ++
      piiRes.map { case (cat, _) => sum(col(s"n_${cat}s")).as(s"n_${cat}s") }

  /** PII CENSUS — the per-source roll-up a model card reports: documents
    * scanned, documents carrying any PII, per-category match totals, and
    * the PII-document fraction, with a '*' all-sources total row
    * (rollup). O(sources) output; one map-side-combinable aggregation
    * over the scan-side scoring — the census costs one pass. */
  def txtPiiCensus(spark: SparkSession, dir: String): DataFrame =
    piiScored(spark, dir)
      .rollup(col("source"))
      .agg(piiCensusAggs.head, piiCensusAggs.tail: _*)
      .select(coalesce(col("source"), lit("*")).as("source"), col("n_docs"),
        col("n_docs_pii"), col("n_urls"), col("n_emails"), col("n_phones"),
        col("n_ips"), (col("n_docs_pii") / col("n_docs")).as("pii_doc_frac"))
      .orderBy(col("source"))


  /** Deterministic training-shard assignment — the EXPORT stage: every doc
    * lands in one of 16 shards by md5(doc_id), independent of partitioning,
    * cluster size, or row order, so re-running the pipeline anywhere yields
    * byte-identical shards (rand()/monotonically_increasing_id-based
    * sharding is neither). Emits per-shard doc and token counts — the
    * manifest a training job reads. One map-side-combinable agg; at scale
    * the same shard column feeds `.write.partitionBy("shard")`. */
  def txtShards(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(expr(s"CAST(${hex4("md5(CAST(doc_id AS STRING))")} % 16 AS BIGINT)").as("shard"),
        size(col("toks")).cast("long").as("n_toks"),
        col("n_chars"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_toks_total"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("shard"))


  /** Deterministic TRAIN/VAL/TEST split (90/5/5) by CONTENT-STABLE hash —
    * the assignment stage every training pipeline runs before packing.
    * The split key is an md5 draw on doc_id (salted, so it is independent
    * of [[txtShards]]' and [[txtMixture]]'s draws), NOT row position or a
    * seeded RNG: position-based splits silently reassign every doc when
    * the corpus grows or repartitions, leaking yesterday's val set into
    * today's train set, while a hash draw keeps every existing doc's
    * assignment fixed under appends, re-ordering, AND re-sharding — the
    * property that makes the split reproducible across pipeline runs.
    * Emitted as the per-(lang, split) census with each split's share of
    * its language (one map-side-combinable agg + a k-row window — no
    * second scan), which is the report that verifies a hash split
    * self-stratifies: no per-language quota machinery, yet every
    * language's val share lands near 5%. Fractions are one double
    * division of exact BIGINTs, so the hash cannot wobble. */
  def txtSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = hex4("md5(CAST(doc_id AS STRING) || ':split')")
    Tables.documents(spark, dir)
      .withColumn("split", expr(
        s"CASE WHEN $h < 58982 THEN 'train' WHEN $h < 62259 THEN 'val' ELSE 'test' END"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .withColumn("lang_frac",
        col("n_docs") / sum(col("n_docs")).over(Window.partitionBy(col("lang"))))
      .orderBy(col("lang"), col("split"))
  }


  /** Deterministic source-mixture sampling — the mixture-weighting stage:
    * each provenance source gets a keep-rate, and a doc survives iff its
    * md5-derived uniform draw falls under its source's rate. Seedless and
    * partition-independent like [[txtBalance]]; changing a single source's
    * weight re-decides ONLY that source's docs (hash draws are per-doc,
    * not positional). Pure per-row filter — no shuffle before the sort. */
  /** Source-parity CASE head shared by the mixture rate, the budget
    * weight, and their Duck mirrors — ONE definition of the even/odd
    * source convention, so a weight change cannot drift between the four
    * sites. TRY_CAST (both engines): a source not shaped 'srcN' yields
    * NULL → NULL%2=0 is NULL → ELSE branch, instead of the
    * Spark-NULL-vs-DuckDB-error divergence a plain CAST would hide. */
  private def sourceParityCase(even: String, odd: String): String =
    s"CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0 THEN $even ELSE $odd END"
  /** Mixture keep-rate: even sources 75%, odd 25%. Explicit DOUBLE: bare
    * 0.75 parses as DECIMAL in both engines, with different
    * comparison/hash behavior. */
  private[analytics] lazy val sourceRateSql =
    sourceParityCase("CAST(0.75 AS DOUBLE)", "CAST(0.25 AS DOUBLE)")
  /** Budget weight: the same 75/25 convention as integer weights 3/1. */
  private[analytics] lazy val sourceWeightSql =
    sourceParityCase("CAST(3 AS BIGINT)", "CAST(1 AS BIGINT)")

  def txtMixture(spark: SparkSession, dir: String): DataFrame = {
    // weight by source parity: even-numbered sources keep 75%, odd 25% —
    // a stand-in for a real mixture table (which would broadcast-join here)
    val draw = s"${hex4("md5(CAST(doc_id AS STRING) || ':' || source)")} / CAST(65536 AS DOUBLE)"
    val rate = sourceRateSql
    Tables.documents(spark, dir)
      .withColumn("draw", expr(draw))
      .withColumn("rate", expr(rate))
      .filter(col("draw") < col("rate"))
      .select(col("doc_id"), col("source"), col("lang"), col("draw"), col("rate"))
      .orderBy(col("doc_id"))
  }


  /** Training budget = [[DataBudgetEpochs]] × the corpus's total token
    * count — proportional to corpus size so the planner exercises the
    * same repeat structure at every SF. */
  private[graft] lazy val DataBudgetEpochs = 2L


  /** TOKEN-BUDGET / EPOCH PLANNER — the data-constrained-scaling readout a
    * training run starts from (Muennighoff et al. 2023, arXiv:2305.16264:
    * when the budget wants more tokens from a source than it has, the
    * source REPEATS). Inputs are the same censuses the pipeline already
    * ships: per-source available tokens ([[txtShards]]'s token sums, keyed
    * by source) and the [[txtMixture]] weight convention (even-numbered
    * sources weight 3, odd weight 1 — the 75/25 keep-rate as integer
    * weights). The global budget is allocated across sources proportional
    * to weight by INTEGER floor division, then each source's demand is
    * decomposed against its supply: full_epochs = requested div available,
    * rem_toks the partial-epoch remainder, must_repeat the flag a curation
    * run alerts on. All-BIGINT arithmetic (one floor-div chain, no
    * floats), so the row set is hash-exact in both engines. Plan shape:
    * one map-side-combinable scan aggregation to the O(sources) census,
    * then window totals over that k-row frame — constant output at any
    * corpus size. */
  def txtDataBudget(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("avail_toks"))
      .withColumn("weight", expr(sourceWeightSql))
      .withColumn("budget_toks",
        lit(DataBudgetEpochs) * sum(col("avail_toks")).over(wAll))
      .withColumn("w_total", sum(col("weight")).over(wAll))
      .withColumn("requested_toks", expr("(budget_toks * weight) div w_total"))
      .withColumn("full_epochs", expr("requested_toks div avail_toks"))
      .withColumn("rem_toks", expr("requested_toks % avail_toks"))
      .withColumn("must_repeat", col("requested_toks") > col("avail_toks"))
      .select(col("source"), col("weight"), col("n_docs"), col("avail_toks"),
        col("budget_toks"), col("requested_toks"), col("full_epochs"),
        col("rem_toks"), col("must_repeat"))
      .orderBy(col("source"))
  }


  /** EXECUTE the token-budget plan into the training-set MANIFEST — the
    * data-constrained mixture (Muennighoff et al. 2023) made concrete:
    * every doc of a source appears [[txtDataBudget]]'s `full_epochs`
    * times, plus once more if it falls inside the partial epoch covering
    * `rem_toks`. The partial-epoch membership is a DETERMINISTIC
    * hash-shuffle prefix: docs order by md5('sample:' || doc_id) within
    * their source (re-running the pipeline anywhere yields the identical
    * manifest — the txt_shards argument applied to sampling) and enter
    * until the tokens before them reach the remainder (a doc may
    * overshoot it — the packer's next-fit boundary convention). Docs with
    * multiplicity 0 (under-weighted source, past the cut) are excluded:
    * the manifest IS the training set. Scale shape: the plan side is
    * O(sources) riding an AQE broadcast; the cut is one running total per
    * source partition — the packer's shape, run once per training job. */
  def txtSampleExec(spark: SparkSession, dir: String): DataFrame = {
    val plan = txtDataBudget(spark, dir)
      .select(col("source"), col("full_epochs"), col("rem_toks"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("sample:"), col("doc_id").cast("string"))), col("doc_id"))
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("n_toks", size(expr(toksSpark)).cast("long"))
      .select(col("source"), col("doc_id"), col("n_toks"))
      .join(plan, Seq("source"))
      .withColumn("cum", sum(col("n_toks")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("mult", col("full_epochs") +
        when(col("cum") - col("n_toks") < col("rem_toks"), 1L).otherwise(0L))
      .filter(col("mult") > 0)
      .select(col("source"), col("doc_id"), col("n_toks"), col("mult"))
      .orderBy(col("source"), col("doc_id"))
  }


  /** Unigram RARITY / LM-quality score — the CCNet-style signal (Wenzek
    * et al. 2020 score docs by LM perplexity; the unigram degenerate case
    * needs no model): each doc's tokens are weighted by their CORPUS
    * frequency, so boilerplate-heavy docs score high and rare-token noise
    * scores low. Emitted as exact BIGINT aggregates (sum/min of corpus
    * term counts over the doc's token instances) plus ONE final double
    * division — integer arithmetic end-to-end means the cross-engine hash
    * cannot wobble (no float sums anywhere; see [[graft.analytics
    * .Relational]]'s dsum note for why that matters). Plan shape: one
    * text scan, a map-side-combinable term-frequency agg (shuffle bounded
    * by distinct types), a BOUNDED broadcast back onto the token stream,
    * one doc-keyed agg. The broadcast is CCNet's move exactly: only the
    * HEAD of the vocabulary (top [[RarityVocabCap]] types by corpus count,
    * deterministic (n_t, t) tie-break via TakeOrdered — distributed
    * partial top-K, no single-partition sort) rides the broadcast; every
    * tail type scores as a singleton (n_t = 1), which is what an
    * out-of-vocabulary token IS to a frequency model. At the synthetic
    * 31-type vocab the cap never binds and results are identical to the
    * unbounded join; at an open web-scale vocabulary the broadcast stays
    * ~[[RarityVocabCap]] rows instead of shipping billions of types to
    * every executor.
    *
    * The vocabulary census `tf` is CHECKPOINTED as a leaf (round 18):
    * the declarative plan fed tf to TWO consumers (the head sort-limit
    * and the corpus-total 1-row agg) plus the token stream to the join,
    * and Catalyst shares none of them — the interpreted-HOF tokenize
    * subtree executed THREE times per run (verified in the formatted
    * plan: three Scan+Generate chains), which is exactly the structural
    * 3.5× this query costs over a single-tokenize scorer like
    * txt_quality. With tf materialized once (vocab-bounded — the SAME
    * size argument as the broadcast head), the head and the total are
    * KB-scale aggregates off the leaf and tokenize runs twice: once
    * into the census, once under the scoring join — the minimum for a
    * frequency model that scores the stream it counts. (The round-17
    * "txt_rarity drift" re-check closes here: today's probes show the
    * 3.5× rarity/quality ratio holding on an idle AND a degraded box,
    * so the 1.12 s re-based floor was a degraded-box capture, not code
    * drift — PLANS.md R18 has the numbers.) */
  def txtRarity(spark: SparkSession, dir: String): DataFrame = {
    val toks = rarityToks(spark, dir)
    val tf = rarityTf(spark, dir)
    val total = tf.agg(sum(col("n_t")).as("n_corpus"))
    val tfHead = tf.orderBy(col("n_t").desc, col("t")).limit(RarityVocabCap)
    toks.join(broadcast(tfHead), Seq("t"), "left")
      .select(col("doc_id"), coalesce(col("n_t"), lit(1L)).as("n_t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("n_t")).as("sum_tf"),
        min(col("n_t")).as("min_tf"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_toks"), col("sum_tf"), col("min_tf"),
        (col("sum_tf").cast("double") / col("n_toks") / col("n_corpus"))
          .as("mean_tf_share"))
      .orderBy(col("doc_id"))
  }


  /** The frequency family's token stream — one lineage definition for the
    * vocabulary census build and the scoring joins that read it back. */
  private def rarityToks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"), explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)


  /** The vocabulary census (t, n_t) behind [[txtRarity]] and
    * [[txtLmScore]], MEMOIZED as a checkpointed leaf (round 20 — it was
    * per-call in txtRarity; with two consumers the memo is the same move
    * as the jaccard pair table: one tokenize+count pass serves every
    * frequency-model reader, released by releaseCaches, fingerprint-keyed
    * so a regenerated dir rebuilds). Vocab-bounded rows (Heaps' law), so
    * the residency cost is KB-scale at any corpus size. */
  private[analytics] def rarityTf(spark: SparkSession, dir: String): DataFrame =
    memoRaw(spark, dir, "rarity_tf")(checkpointLeaf(spark,
      rarityToks(spark, dir).groupBy(col("t")).agg(count(lit(1)).as("n_t"))))


  /** Unigram LM QUALITY score — the perplexity-bucket census CCNet
    * actually filters with (Wenzek et al. 2020 §4.3: score every doc by a
    * language-model's perplexity, cut the corpus into head/middle/tail
    * buckets, keep head+middle): [[txtRarity]]'s degenerate-unigram LM
    * promoted from frequency shares to LOG-space surprisal, which is what
    * "perplexity" is once the model is unigram. Each vocabulary type gets
    * a QUANTIZED integer surprisal `s_t = round(1e4 · ln(n_corpus/n_t))`
    * (tenth-milli-nats): the one ln() per TYPE is the only libm call in
    * the query, and the 1e-4 grid makes the integer table robust to the
    * two engines' ≤few-ulp log disagreement (a mismatch needs the true
    * value within ~1e-12 of a rounding boundary), after which everything
    * is exact BIGINT sums — the q38 integer-micro-unit argument. OOV
    * tail types score as singletons (n_t = 1, the txtRarity convention).
    * Per doc: token count, surprisal sum, the mean surprisal in nats
    * (two IEEE divisions of exact integers — bit-equal cross-engine),
    * and the CCNet bucket by exact mean-surprisal TERCILE (row_number
    * with doc_id tie-break; head = most fluent third).
    *
    * Scale shape: the token-mass work is one scan + the bounded-broadcast
    * scoring join (the [[txtRarity]] plan exactly — the memoized vocab
    * leaf is SHARED with it); only the O(docs) scored census enters the
    * two doc-level windows, which run unpartitioned — the exact-tercile
    * analogue of q25's exact-percentile trade, and like there the 100 TB
    * deployment swaps the exact cut for percentile_approx thresholds
    * applied as constants (CCNet itself computes its cuts on a sample);
    * the exact rank is what makes the census oracle-checkable.
    * LlmOpsSpec pins the separation claim on planted fluent/gibberish
    * docs. */
  def txtLmScore(spark: SparkSession, dir: String): DataFrame = {
    val tf = rarityTf(spark, dir)
    val total = tf.agg(sum(col("n_t")).as("n_corpus"))
    val surpr = tf.orderBy(col("n_t").desc, col("t")).limit(RarityVocabCap)
      .crossJoin(broadcast(total))
      .select(col("t"),
        round(log(col("n_corpus").cast("double") / col("n_t")) * 10000)
          .cast("long").as("s_t"))
    val oov = total.select(
      round(log(col("n_corpus").cast("double") / lit(1L)) * 10000)
        .cast("long").as("s_oov"))
    val wRk = Window.orderBy(col("mean_surprisal"), col("doc_id"))
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rarityToks(spark, dir)
      .join(broadcast(surpr), Seq("t"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"), coalesce(col("s_t"), col("s_oov")).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("s")).as("sum_surprisal"))
      .withColumn("mean_surprisal",
        col("sum_surprisal").cast("double") / col("n_toks") / 10000.0)
      .withColumn("rnk", row_number().over(wRk))
      .withColumn("n_docs", count(lit(1)).over(wAll))
      .select(col("doc_id"), col("n_toks"), col("sum_surprisal"),
        col("mean_surprisal"),
        when(col("rnk") * 3 <= col("n_docs"), "head")
          .when(col("rnk") * 3 <= col("n_docs") * 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }
}
