package graft.analytics

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (builder-prompt extension surface): deduplication (exact, n-gram Jaccard,
  * MinHash+LSH, SimHash), similarity search (brute-force cosine top-k and a
  * hyperplane-LSH ANN variant), text analysis (language-ID, quality scoring,
  * token counting, fingerprinting) and multimodal binary metadata.
  *
  * Every operator here is *oracle-checkable*: all hashing is built from
  * `md5(...)` (identical hex output in Spark and DuckDB), hex→int conversion
  * uses `instr`-arithmetic that parses the same in both engines, and vector
  * math is emitted as explicit per-dimension double arithmetic so the IEEE
  * result is bit-identical on both sides. [[duckdb]] holds the generated
  * DuckDB mirror for each query.
  *
  * Scale design (the real goal is 100 TB, tested at sf≤0.1):
  *  - shingle/token explosion is the dominant cost; everything downstream of
  *    `explode` aggregates by doc_id (map-side partial agg) or joins on the
  *    shingle hash — both shuffle-bounded by total token count, not doc².
  *  - pairwise similarity is *blocked*: n-gram Jaccard blocks on
  *    (lang, length-bucket), embedding near-dup blocks on label, LSH bands /
  *    hyperplane buckets do the blocking for MinHash/ANN — no unblocked
  *    cross joins anywhere except the deliberately-small brute-force top-k
  *    baseline (query set is a 1/50 sample, candidates scanned once).
  *  - skew: shingle frequency filtering is implicit in the distinct-per-doc
  *    shingling; at production scale a stop-shingle frequency cap (drop
  *    shingles in > 0.1% of docs) bounds the worst key.
  */
object LlmOps {

  // --------------------------------------------------------- cache registry

  /** Every persisted frame / checkpointed RDD the dedup family creates is
    * registered here, and [[releaseCaches]] frees them all. The query
    * builders themselves CANNOT unpersist (they return lazy frames — the
    * consuming action runs later, in the harness), so without an explicit
    * release point executor storage grows monotonically across a long
    * session: each verify/bench/test pass re-persists fresh copies of the
    * shingle, signature, and cluster-label tables. Harness entry points
    * (Verify, Bench, Probe) call [[releaseCaches]] once their actions have
    * completed; the forked test JVM relies on process teardown. */
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  private def track(df: DataFrame): DataFrame =
    synchronized { tracked += (() => { df.unpersist(); () }); df }

  private[analytics] def trackRdd(rdd: RDD[_]): Unit =
    synchronized { tracked += (() => { rdd.unpersist(blocking = false); () }) }

  /** Unpersist every tracked frame/RDD and drop the jaccard-pair memo. Safe
    * to call repeatedly; after a release the next query rebuilds its caches
    * from scratch. */
  def releaseCaches(): Unit = synchronized {
    // Unpersisting a locally-checkpointed RDD makes its concrete class
    // logger (e.g. org.apache.spark.rdd.MapPartitionsRDD) WARN "... was
    // locally checkpointed, its lineage has been truncated". Here that is
    // exactly the intent — the caches are being discarded, recomputation is
    // not wanted — so the flood in Bench/Verify tails is pure noise; drop
    // the rdd package logger to ERROR for the release and restore it after.
    withQuietRddLogger {
      tracked.foreach(f => try f() catch { case _: Throwable => () })
      tracked.clear()
      sigMemo.clear()
    }
  }

  /** The org.apache.spark.rdd package logger, dropped to ERROR while `body`
    * runs — covers every RDD subclass's "lineage has been truncated" WARN
    * on the deliberate unpersists of locally-checkpointed RDDs (cache
    * release, CC-loop prior-round frees). Restores the prior effective
    * level afterwards. */
  def withQuietRddLogger[A](body: => A): A = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.Configurator
    val pkg = "org.apache.spark.rdd"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    // restore INHERITANCE if the package had no explicit LoggerConfig before
    // (a plain setLevel would otherwise pin a level on a previously
    // inheriting package for the rest of the JVM)
    val hadExplicit = ctx.getConfiguration.getLoggerConfig(pkg).getName == pkg
    val prior = ctx.getConfiguration.getLoggerConfig(pkg).getLevel
    Configurator.setLevel(pkg, Level.ERROR)
    try body
    finally {
      if (hadExplicit) Configurator.setLevel(pkg, prior)
      else { ctx.getConfiguration.removeLogger(pkg); ctx.updateLoggers() }
    }
  }

  // --------------------------------------------------------------- helpers

  /** Whitespace tokens of lowercased text — Spark SQL fragment. */
  private val toksSpark = raw"filter(split(lower(trim(text)), '\\s+'), t -> t != '')"
  /** Same tokens — DuckDB fragment. */
  private val toksDuck = raw"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"

  /** Distinct 3-gram word shingles over a `toks` array column (Spark, 0-based). */
  private val shinglesSpark =
    "case when size(toks) >= 3 then array_distinct(transform(sequence(0, size(toks)-3), " +
      "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) else array() end"
  /** Same (DuckDB, 1-based lists). */
  private val shinglesDuck =
    "list_distinct(list_transform(range(1, greatest(len(toks)-2, 0)+1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"

  /** First-4-hex-chars of an md5 hex column `h` as an integer 0..65535 —
    * identical text parses in BOTH engines (instr/substr are 1-based in both).
    * Terms are BIGINT-cast: Spark would otherwise do wrapping 32-bit int
    * arithmetic where DuckDB widens. */
  private def hex4(h: String): String =
    (1 to 4).map(p =>
      s"(CAST(instr('0123456789abcdef', substr($h, $p, 1)) - 1 AS BIGINT) * CAST(${math.pow(16, 4 - p).toLong} AS BIGINT))")
      .mkString("(", " + ", ")")

  /** First-8-hex-chars as a long 0..2^32-1 — same portability. */
  private def hex8(h: String): String =
    (1 to 8).map(p =>
      s"(CAST(instr('0123456789abcdef', substr($h, $p, 1)) - 1 AS BIGINT) * CAST(${math.pow(16, 8 - p).toLong} AS BIGINT))")
      .mkString("(", " + ", ")")

  /** First-15-hex-chars as a long 0..2^60-1 — the widest md5 prefix whose
    * arithmetic stays inside signed 64-bit in BOTH engines (16 chars would
    * need unsigned). Powers via 1L<<shift, not math.pow (exact). */
  private def hex15(h: String): String =
    (1 to 15).map(p =>
      s"(CAST(instr('0123456789abcdef', substr($h, $p, 1)) - 1 AS BIGINT) * CAST(${1L << (4 * (15 - p))} AS BIGINT))")
      .mkString("(", " + ", ")")

  /** Explicit per-dimension double dot product between two 64-dim float
    * array columns; `base` is the first index (Spark arrays 0-based, DuckDB
    * lists 1-based). Left-associated additions → bit-identical IEEE result.
    * Used for the DuckDB oracle text. */
  private def dot(a: String, b: String, base: Int): String =
    (base until base + 64).map(i => s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))").mkString(" + ")

  /** [[dot]]'s 8-dim sibling for the PQ oracles: the subspace starting at
    * 1-based index `base` of two 64-dim lists, unrolled left-associated —
    * bit-identical to a [[org.apache.spark.sql.graft.DotProductF]] run
    * over `slice(v, base, 8)`. */
  private def pqDot(a: String, b: String, base: Int): String =
    (base until base + PqSub).map(i => s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))").mkString(" + ")

  /** Spark-side dot product via the native codegen'd Catalyst expression
    * [[org.apache.spark.sql.graft.DotProductF]] — a tight primitive loop,
    * numerically identical to the left-folded HOF formulation AND to the
    * unrolled left-associated chain in [[dot]] used by the oracles (same
    * accumulation order from 0.0, same per-term double widening). */
  private def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.DotProductF(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Mixed float-array × BIGINT-array dot via the codegen'd
    * [[org.apache.spark.sql.graft.DotProductFL]] — the k-means assignment
    * kernel (float row against an integer Lloyd-sum centroid). */
  private def dotFL(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.DotProductFL(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Per-doc distinct-3-gram-shingle hashes via the
    * [[org.apache.spark.sql.graft.ShingleHash32]] kernel (see its Scaladoc
    * for why this beats the declarative HOF chain ~5x). */
  private def shingleHash(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.ShingleHash32(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Deterministic hyperplane weights for ANN-LSH: plane p, dim i →
    * ((first-8-hex of md5("p:i") as long) % 2001 - 1000) / 1000 ∈ [-1, 1].
    * Materialized as shortest-round-trip literals so Spark and DuckDB parse
    * the exact same doubles. */
  private lazy val planes: IndexedSeq[IndexedSeq[String]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    (0 until MaxPlanes).map { p =>
      (0 until 64).map { i =>
        val hex = mdt.digest(s"$p:$i".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        val w = (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
        graft.expr.JsNumber.format(w)
      }
    }
  }

  /** Σ_i w[p][i] * e[i] for hyperplane p over array column `e` (DuckDB text). */
  private def planeDot(e: String, p: Int, base: Int): String =
    (0 until 64).map(i => s"(CAST(${planes(p)(i)} AS DOUBLE) * CAST($e[${base + i}] AS DOUBLE))").mkString(" + ")

  /** DATA-SIZED ANN capacities — the q33-bloom treatment applied to the
    * embedding family's quantizers. Every fixed sketch/layout capacity is a
    * latent scale cliff: the original 4-plane/16-bucket LSH and 16-centroid
    * IVF were constants, so bucket/cell occupancy grew linearly with N and
    * within-cell pair work quadratically. Both capacities now derive from
    * the embeddings PARQUET FOOTER row count ([[Tables.rowCount]] — no
    * Spark job at frame construction) and never shrink below the original
    * constants, so small-SF results stay byte-identical. The SAME formulas
    * are written INTO the oracle SQL (computed from count(*) over the same
    * parquet), so one static SQL self-sizes at every SF; both engines see
    * the identical N and the formulas are integer-exact (floor(sqrt()) of
    * an exact integer and a power-of-two search — no log2 rounding hazard).
    *
    *  - [[annPlanes]]: smallest P with 64 * 2^P >= N — sign-buckets of ~64
    *    vectors regardless of corpus size, so per-query candidate counts
    *    are BOUNDED and the family scales with the query count, not N².
    *    Floor 4 (the original constant); cap [[MaxPlanes]] = 16, the
    *    pregenerated hyperplane table (covers N = 4.2M at 64/bucket —
    *    production regenerates the deterministic plane table, same recipe).
    *  - [[ivfK]]: k = max(16, floor(sqrt(N/2))) — the FLAT-quantizer cost
    *    optimum: assignment costs N*k centroid dots, within-cell pair work
    *    is ~N²/(2k); N*k + N²/(2k) is minimized at k = sqrt(N/2), turning
    *    the fixed-k O(N²/16) into O(N^1.5). (k ∝ N would bound cell sizes
    *    but re-quadratize ASSIGNMENT; past ~10M vectors the production
    *    answer is a two-level/hierarchical quantizer, not a bigger flat
    *    one.)
    */
  private val MaxPlanes = 16

  /** Vocabulary-head size for [[txtRarity]]'s bounded broadcast: 64Ki types
    * ≈ a BPE vocabulary's order of magnitude — large enough that the cap
    * never binds on curated corpora, small enough that the broadcast is
    * ~2 MB however large the corpus grows. */
  private val RarityVocabCap = 65536

  private[analytics] def annPlanes(spark: SparkSession, dir: String): Int = {
    val n = Tables.rowCount(spark, dir, "embeddings")
    var p = 0
    while (p < MaxPlanes && (64L << p) < n) p += 1
    math.max(4, p)
  }

  private[analytics] def ivfK(spark: SparkSession, dir: String): Int = {
    val n = Tables.rowCount(spark, dir, "embeddings")
    math.max(16, math.sqrt((n / 2).toDouble).toLong.toInt)
  }

  /** Per-level k for the TWO-LEVEL quantizer ([[simIvf2]]): the largest
    * integer c with c³ <= N, floored at 8 — computed by integer search,
    * not a float cbrt (whose ulp could differ across engines and flip the
    * floor). With k = N^(1/3) per level the index has ~N^(2/3) leaf cells
    * of ~N^(1/3) members: assignment costs N·2k ~ N^(4/3) and within-leaf
    * pair work ~N^(4/3) — below the flat quantizer's N^1.5, which is the
    * whole point of going hierarchical past ~10M vectors. */
  private[analytics] def ivf2K(spark: SparkSession, dir: String): Int = {
    val n = Tables.rowCount(spark, dir, "embeddings")
    var c = 1L
    // cap 2099 = the oracle's range(1,2100) search bound (~9.2e9 vectors);
    // the two searches must share a bound or they would diverge past it
    while (c < 2099 && (c + 1) * (c + 1) * (c + 1) <= n) c += 1
    math.max(8, c.toInt)
  }

  /** The oracle-side twin of [[annPlanes]]/[[ivfK]]: a `params` CTE the
    * sized oracle queries prepend — k and pl computed from count(*) with
    * the exact formulas above. `range(0,17)` + min() is the integer-exact
    * power-of-two search (no float log2). */
  private val paramsDuck: String =
    """nrows AS (SELECT count(*) AS n FROM embeddings),
      |params AS (SELECT
      |  greatest(16, CAST(floor(sqrt(n // 2)) AS BIGINT)) AS k,
      |  greatest(4, least(16, coalesce((SELECT min(p) FROM range(0,17) t(p), nrows
      |    WHERE 64 * (CAST(1 AS BIGINT) << p) >= n), 16))) AS pl,
      |  greatest(8, coalesce((SELECT max(c) FROM range(1,2100) t(c), nrows
      |    WHERE c * c * c <= n), 1)) AS kc
      |  FROM nrows)""".stripMargin

  /** LSH bucket id, sized (DuckDB text): all [[MaxPlanes]] sign bits are in
    * the SQL, each gated on `p < params.pl`, so the static SQL computes the
    * same P-plane bucket the Spark side builds for the dir's N. */
  private def bucketExpr(e: String, base: Int): String =
    (0 until MaxPlanes).map(p =>
      s"(CASE WHEN $p < (SELECT pl FROM params) AND (${planeDot(e, p, base)}) >= 0 THEN ${1 << p} ELSE 0 END)")
      .mkString(" + ")

  /** Spark-side plane dot via HOF: weights as a literal double array; the
    * fold from 0.0 with w*x term order matches [[planeDot]] bit-for-bit. */
  private def planeDotHof(e: String, p: Int): String = {
    val ws = planes(p).map(w => s"CAST($w AS DOUBLE)").mkString("array(", ", ", ")")
    s"aggregate(zip_with($ws, $e, (w, x) -> w * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
  }

  /** Spark-side LSH bucket id over the first `pl` hyperplanes. */
  private def bucketHof(e: String, pl: Int): String =
    (0 until pl).map(p => s"(CASE WHEN (${planeDotHof(e, p)}) >= 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")

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
  private def qualityScored(spark: SparkSession, dir: String): DataFrame =
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
  private lazy val classifierStops: Seq[String] = langMarkers.flatMap(_._2).distinct.sorted

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

  /** The classifier head's scoring SCAN — documents plus per-row count
    * features and the linear score, shared by [[txtClassifier]] and
    * [[ddDedupKeepBest]] (which ranks duplicate-cluster members by it).
    * Pure per-row arithmetic over one text scan: no shuffle, so any
    * consumer can fold the score into its own plan for free. */
  private def classifierScored(spark: SparkSession, dir: String): DataFrame = {
    val stopsIn = classifierStops.map(w => s"'$w'").mkString(", ")
    Tables.documents(spark, dir)
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

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private val argmaxCase: String =
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

  // ---------------------------------------------------------------- dedup

  /** Exact dedup: hash-groupBy on content; emit canonical (min doc_id) per
    * distinct text + multiplicity. One shuffle on the content hash. */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("fp"))

  /** N-gram Jaccard near-dup detection, blocked on (lang, length-bucket):
    * shingle-join within blocks → common counts → |A∩B| / |A∪B|. */
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.2)
      .select(col("ia"), col("ib"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("ia"), col("ib"))
      .limit(200)

  /** DIRECTED CONTAINMENT near-dup detection — the asymmetric companion
    * to [[ddNgramJaccard]]: C(A→B) = |A∩B| / |A|, the fraction of A's
    * shingles present in B (Broder's containment, vs resemblance).
    * Symmetric Jaccard structurally misses subset duplication — a doc
    * quoted whole inside a much longer one scores |A|/|B| ≈ 0 — and the
    * jaccard family's (lang, length-bucket) blocking cannot even
    * CANDIDATE a cross-length pair, so this query builds its own pairs:
    * lang-blocked only, letting short meet long. What bounds the
    * self-join without the length block is the [[StopShingleCap]] alone
    * (fanout ≤ Σ df² with df ≤ cap — the identical argument, minus one
    * blocking key), so the candidate set stays cap-bounded, never doc².
    * Cost model, measured at sf2: the synthetic corpus draws from a
    * CLOSED vocabulary, so typical shingle df grows with corpus size
    * (~70 at 100k docs) and the Σ df² build genuinely processes ~245M
    * join rows — DuckDB pays the same ~2 minutes for the oracle, and a
    * lower cap is NOT a fix (at sf2 even the true subset pairs' shared
    * shingles sit above df 20, so capping harder EMPTIES the answer —
    * measured, not guessed). On an open-vocabulary web corpus the df
    * mass inverts (most shingles near-unique) and the same plan is far
    * cheaper; the cap is the worst-case guard either way. Prefix
    * filtering (PPJoin) was evaluated and rejected: on this flat df
    * distribution the rarest-half prefix still leaves ~105M candidates.
    * Same kernel-hashed 8-byte join keys; pairs are DIRECTED (a ≠ b,
    * both orders) because containment is. */
  def ddContainment(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(spark, dir)
      .orderBy(col("containment").desc, col("ia"), col("ib"))
      .limit(200)

  // --------------------------------------------------------- URL-stage dedup

  /** Synthetic crawl URL for a document, derived IN-QUERY: the driver's
    * documents schema carries no url column, so the cheapest first gate of
    * a web-corpus pipeline (RefinedWeb §3.2 and CCNet both dedup by
    * normalized URL BEFORE any content hash) is rehearsed on a
    * deterministic URL synthesized from doc_id — one SQL fragment, valid
    * VERBATIM in both engines (BIGINT-safe integer arithmetic, `||`
    * concat, and regexes written with `[.]`/`[?]` character classes so no
    * backslash ever hits the two dialects' different string-literal
    * escaping). Page identity `pid` is doc_id, except doc_id ≡ 5 (mod 13)
    * re-crawls its predecessor's page (~7.7% planted duplicates — host and
    * path derive from pid, so the two fetches share a page); the MESSY
    * presentation derives from doc_id, so the two fetches of one page
    * differ in scheme (http/https), `www.` prefix, host case, trailing
    * slash, `?utm_...` tracking query, and `#fragment` — exactly the noise
    * URL normalization must erase. Hosts are geometrically hot (host 0
    * carries ~50% of all URLs via the pid%1024 bucket CASE) so the
    * per-host census sees a genuinely skewed key. */
  private val urlPidSql = "CASE WHEN doc_id % 13 = 5 THEN doc_id - 1 ELSE doc_id END"
  private val urlRawSql: String = {
    val hid = "(CASE WHEN pid % 1024 < 512 THEN 0 WHEN pid % 1024 < 768 THEN 1" +
      " WHEN pid % 1024 < 896 THEN 2 WHEN pid % 1024 < 960 THEN 3" +
      " WHEN pid % 1024 < 992 THEN 4 WHEN pid % 1024 < 1008 THEN 5" +
      " WHEN pid % 1024 < 1016 THEN 6 WHEN pid % 1024 < 1020 THEN 7" +
      " WHEN pid % 1024 < 1022 THEN 8 ELSE 9 END)"
    val host = s"('h' || CAST($hid AS STRING) || '.example.com')"
    s"(CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END || '://' || " +
      s"CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END || " +
      s"CASE WHEN doc_id % 8 = 3 THEN upper($host) ELSE $host END || " +
      s"'/p/' || CAST(pid AS STRING) || " +
      s"CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END || " +
      s"CASE WHEN doc_id % 4 = 1 THEN '?utm_source=feed&ref=rss' ELSE '' END || " +
      s"CASE WHEN doc_id % 9 = 2 THEN '#top' ELSE '' END)"
  }
  /** URL NORMALIZATION — the operator under test: lowercase, strip scheme,
    * `www.`, fragment, query string, trailing slash (in that order; the
    * fragment strip precedes the query strip because `#...` follows
    * `?...` in a URL). Anchored single-occurrence patterns, so Spark's
    * replace-all and DuckDB's replace-first semantics coincide. */
  private val urlNormSql =
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      "lower(url), '^https?://', ''), '^www[.]', ''), '#.*$', ''), '[?].*$', ''), '/$', '')"

  /** Shared derivation: doc_id → (doc_id, url, url_norm). Spec-visible so
    * the planted twins' RAW urls can be asserted messy. */
  private[graft] def urlNormalized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", s"$urlPidSql AS pid")
      .selectExpr("doc_id", s"$urlRawSql AS url")
      .selectExpr("doc_id", "url", s"$urlNormSql AS url_norm")

  /** The Duck CTE chain matching [[urlNormalized]] — fragments verbatim. */
  private val urlNormDuck =
    s"""p AS (SELECT doc_id, $urlPidSql AS pid FROM documents),
       |u AS (SELECT doc_id, $urlRawSql AS url FROM p),
       |n AS (SELECT doc_id, url, $urlNormSql AS url_norm FROM u)""".stripMargin

  /** URL-STAGE exact dedup — one row per normalized URL with the kept
    * fetch (min doc_id, crawl-frontier convention) and the duplicate
    * count. Scale shape: a single hash aggregation keyed by the FULL
    * normalized URL — near-uniform key (the hot HOST is not a hot URL),
    * map-side combinable, shuffle bounded by the distinct-URL count; the
    * per-row derivation is pure codegen'd string/integer work in the scan
    * projection. This is the gate that runs before any content
    * fingerprint at 100 TB: it needs no text read at all (a real crawl
    * would run it on the URL manifest alone). */
  def ddUrl(spark: SparkSession, dir: String): DataFrame =
    urlNormalized(spark, dir)
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .withColumn("n_dropped", col("n_docs") - lit(1L))
      .orderBy(col("url_norm"))

  /** Per-HOST crawl census — the dashboard row a frontier operator reads:
    * fetches, distinct pages, and re-crawled fetches per normalized host.
    * The host key is deliberately skewed (host 0 ≈ 50% of fetches); the
    * distinct count plans as Spark's two-phase expand aggregation —
    * partial aggregation on (host, url_norm) first — so the hot host
    * never concentrates raw rows on one reducer. Constant-size output
    * (10 hosts here; O(hosts) in general). */
  def ddUrlHosts(spark: SparkSession, dir: String): DataFrame =
    urlNormalized(spark, dir)
      .select(split_part(col("url_norm"), lit("/"), lit(1)).as("host"), col("url_norm"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_pages"))
      .withColumn("n_dup_docs", col("n_docs") - col("n_pages"))
      .orderBy(col("host"))

  /** The thresholded containment pair table — memoized on the family's
    * fingerprint spine and prewarmed as explicitly-timed state (see
    * [[stateBuilders]]), like the jaccard pairs it parallels. */
  private def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    memoRaw(spark, dir, "containment_pairs")(buildContainmentPairs(spark, dir))

  private def buildContainmentPairs(spark: SparkSession, dir: String): DataFrame = {
    // persist the shingle rows: they feed sizes, the rarity filter, and
    // BOTH sides of the candidate join (4 consumers) — unpersisted, the
    // kernel chain re-planned and re-ran per consumer (measured 31 s cold
    // at sf0.1 vs ~4 s with the cache, the same lesson buildJaccardPairs
    // learned). The pair result is eagerly checkpointed so the cache can
    // be released before returning — executor storage stays bounded by
    // the (threshold-filtered, tiny) pair table.
    val sh = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"), explode_outer(shingleHash(col("text"))).as("s"))
      .filter(col("s").isNotNull)
      .persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val rare = sh.groupBy(col("s"), col("lang"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= StopShingleCap)
      .select(col("s"), col("lang"))
    val capped = sh.join(rare, Seq("s", "lang"), "left_semi")
      .select(col("doc_id"), col("lang"), col("s"))
      .persist()
    val a = capped.toDF("ia", "la", "s")
    val b = capped.toDF("ib", "lb", "s2")
    // join each unordered pair ONCE (ia < ib) and emit both directions by
    // projection afterwards: `common` is symmetric, so the =!= formulation
    // would shuffle and aggregate every shared shingle twice for the same
    // answer — this halves the heaviest stage
    val sized = a.join(b,
        col("s") === col("s2") && col("la") === col("lb") && col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("common"))
      .join(sizes.toDF("ia", "na"), "ia")
      .join(sizes.toDF("ib", "nb"), "ib")
    val plan = sized
      .select(col("ia"), col("ib"), (col("common") / col("na")).as("containment"))
      .union(sized.select(col("ib").as("ia"), col("ia").as("ib"),
        (col("common") / col("nb")).as("containment")))
      .filter(col("containment") >= 0.5)
    // RDD-level checkpoint for the same reason as buildJaccardPairs: the
    // DataFrame variant derives new child RDDs per access, so no handle
    // to the persisted RDD would survive for release
    val rdd = plan.rdd
    rdd.localCheckpoint()
    rdd.count()
    trackRdd(rdd)
    sh.unpersist(blocking = false)
    capped.unpersist(blocking = false)
    spark.createDataFrame(rdd, plan.schema)
  }

  /** Stop-shingle cap: a shingle present in more than this many docs of a
    * block is dropped from the candidate join. The worst-key bound that
    * keeps the self-join fanout O(cap²) per shingle at any corpus size;
    * far above anything the test corpora hit, so results are unchanged
    * there (and the oracle applies the identical cap). */
  private val StopShingleCap = 500

  /** All blocked shingle-Jaccard pairs (no threshold/limit) — shared by the
    * reporting query above, the dedup action, and the clustering query.
    * Memoized through [[memoRaw]] (fingerprinted like every other index
    * table, so a regenerated dir rebuilds instead of serving stale pairs):
    * the three consumers get the SAME frame instance, so the checkpointed
    * pair table is registered once and released by [[releaseCaches]]. */
  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    memoRaw(spark, dir, "jaccard_pairs")(buildJaccardPairs(spark, dir))

  /** One-time family STATE builds, exposed so Bench can time them as an
    * explicit pre-stage: without this the cost lands on whichever family
    * member runs first alphabetically (jaccard pairs → dd_align, passage
    * windows → dd_contamination, fingerprint state →
    * dd_incremental_bucketed), distorting per-query floors. Each thunk is
    * idempotent — memo- or table-guarded — so queries re-running later pay
    * only their own plan cost. */
  def stateBuilders(spark: SparkSession, dir: String): Seq[(String, () => Unit)] = Seq(
    "jaccard_pairs" -> (() => { jaccardPairs(spark, dir).count(); () }),
    "containment_pairs" -> (() => { containmentPairs(spark, dir).count(); () }),
    "passage_windows_n4" -> (() => { passageWindows(spark, dir, 4).count(); () }),
    "passage_windows_n8" -> (() => { passageWindows(spark, dir, 8).count(); () }),
    "simhash_sig" -> (() => { simhashSig(spark, dir).count(); () }),
    "simhash_wide_sig" -> (() => { simhashWideSig(spark, dir).count(); () }),
    "minhash_sig" -> (() => { minhashSig(spark, dir).count(); () }),
    "minhash_wide_sig" -> (() => { minhashWideSig(spark, dir).count(); () }),
    "minhash_wide128_sig" -> (() => { minhashWide128Sig(spark, dir).count(); () }),
    "band_candidates" -> (() => { wideBandCandidates(spark, dir).count(); () }),
    "bpe_merges" -> (() => { bpeMergeTable(spark, dir).count(); () }),
    "fingerprint_state" -> (() => { fingerprintTable(spark, dir); () }),
    "topk_cosine" -> (() => { bruteTruthTable(spark, dir).count(); () }),
    "ivf_assign" -> (() => { ivfAssignTable(spark, dir).count(); () }),
    "ivf_kmeans_assign" -> (() => { ivfKmeansAssignTable(spark, dir).count(); () }),
    "ann_bucket" -> (() => { annBucketTable(spark, dir).count(); () }),
    "pq_codes" -> (() => { pqCodesTable(spark, dir).count(); () }),
    "pq_codes256" -> (() => { pqCodesTable256(spark, dir).count(); () }),
    "ivf_serve_assign" -> (() => { ivfServeAssignTable(spark, dir).count(); () }),
    "serve_insert_assign" -> (() => { serveInsertAssign(spark, dir).count(); () }),
    "ivf_serve_pq_codes" -> (() => { servePqCodesTable(spark, dir).count(); () }),
    "ivf2_assign" -> (() => { ivf2AssignTable(spark, dir).count(); () }))

  /** Note `sizes` counts the FULL shingle set (the Jaccard denominator),
    * while the join runs on the stop-shingle-capped set. */
  private def buildJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // repartition BEFORE the CPU-heavy tokenize+shingle projection: the
    // documents table arrives as few parquet splits (one, at test SFs), and
    // an explode-heavy projection gets no parallelism from AQE — measured
    // 14s single-task vs <1s spread over the cores. At production scale the
    // scan has many splits already and this becomes a cheap rebalance that
    // also evens out skewed document lengths before the quadratic-ish
    // shingling work.
    // The tokenize→shingle→hash chain runs as the ShingleHash32 kernel —
    // ONE JVM loop per document (see its Scaladoc). The equivalent
    // HOF+md5+hex-parse chain was this pipeline's dominant cost: Spark's
    // higher-order functions evaluate interpreted, outside whole-stage
    // codegen, and the measured build time of this persisted table dropped
    // ~10s → ~2s at sf0.1 when the kernel replaced it. Hash semantics are
    // unchanged (first 4 md5 bytes of the shingle string), so the DuckDB
    // oracles are untouched.
    val dbg = sys.env.contains("GRAFT_CLUSTER_DEBUG")
    val t0 = System.nanoTime()
    def lap(tag: String): Unit =
      if (dbg) println(f"JPBUILD $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("bkt", expr("n_chars div 50"))
      .withColumn("sharr", shingleHash(col("text")))
    if (dbg) { docs.count(); lap("scan+repartition+kernel") }
    // sh is persisted (MEMORY_AND_DISK, spill-safe): it feeds the df-count,
    // the semi-join probe side, and — via `capped` — both sides of the
    // candidate join, all inside the ONE checkpoint-materialization job
    // below, which fills the cache on first compute. No eager count: that
    // cost a whole extra job, and the worst case without it is a transient
    // concurrent recompute of the (cheap, kernel-based) projection while
    // the cache populates.
    //
    // explode_OUTER + isNotNull, NOT plain explode: explode makes
    // InferFiltersFromGenerate add a `size(arr) > 0` filter, and predicate
    // pushdown drags that filter — with the whole kernel inlined — below
    // the repartition into the single-split scan task (measured 13s
    // single-threaded vs 0.3s for the outer variant back when the chain was
    // declarative; the guard is just as load-bearing for the kernel).
    // Shingles are joined BY HASH (32-bit, as BIGINT): 8-byte join keys
    // instead of ~30-byte strings cut shuffle volume and compare cost in
    // the df-count, semi-join, and candidate self-join. Collisions
    // (~handful at 2^32 over test corpora) could inflate a `common` count,
    // but the oracle applies the IDENTICAL hash, so both engines agree —
    // and hashed shingles are exactly what production near-dup pipelines
    // join on at scale.
    val sh = docs.select(col("doc_id"), col("lang"), col("bkt"), explode_outer(col("sharr")).as("s"))
      .filter(col("s").isNotNull)
      .persist()
    lap("sh persist marked")
    // Jaccard denominator = per-doc distinct-shingle count — read off the
    // cached sh rows (one row per distinct shingle), so the kernel never
    // runs a second time for this branch. Docs with <3 tokens have no sh
    // rows and drop out, same as before — they can never appear in
    // `common` anyway.
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .select(col("doc_id"), col("n"))
    val rare = sh.groupBy(col("s"), col("lang"), col("bkt"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= StopShingleCap)
      .select(col("s"), col("lang"), col("bkt"))
    val capped = sh.join(rare, Seq("s", "lang", "bkt"), "left_semi")
      .select(col("doc_id"), col("lang"), col("bkt"), col("s"))
      .persist()
    val a = capped.toDF("ia", "la", "ba", "s")
    val b = capped.toDF("ib", "lb", "bb", "s2")
    val common = a.join(b,
        col("s") === col("s2") && col("la") === col("lb") && col("ba") === col("bb") && col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("common"))
    // Materialize the pairs TABLE (eager local checkpoint), not just the
    // shingle inputs: the three consumers (dd_ngram_jaccard, dd_dedup_keep,
    // dd_cluster) each re-plan whatever tree the memo hands them, and
    // driver-side planning + janino codegen of the full shingle-join tree
    // measured ~1.3-3.7s PER CONSUMER — more than the join's execution.
    // Checkpointed, every consumer plans over a leaf. The pair count is
    // block-bounded (never doc²), so the checkpoint is small at any scale;
    // on a real cluster this becomes a reliable checkpoint / staging table
    // — which is what a production dedup pipeline materializes anyway.
    // Checkpoint at the RDD level (not DataFrame.localCheckpoint): the
    // frame returned by the DataFrame variant derives NEW child RDDs on
    // every .rdd access, so no handle to the actually-persisted RDD
    // survives for releaseCaches — unpersisting a derived child frees
    // nothing. Holding the checkpointed RDD itself makes the release real.
    val jpPlan = common
      .join(sizes.toDF("ia", "na"), "ia")
      .join(sizes.toDF("ib", "nb"), "ib")
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
    val jpRdd = jpPlan.rdd
    jpRdd.localCheckpoint()
    jpRdd.count() // materialize eagerly; lineage truncates here
    val jp = spark.createDataFrame(jpRdd, jpPlan.schema)
    lap("pairs checkpointed")
    trackRdd(jpRdd)
    // the shingle tables only served the build — free them NOW, not at
    // session release: executor storage stays bounded by the pair table
    sh.unpersist(blocking = false)
    capped.unpersist(blocking = false)
    jp
  }

  /** The Jaccard-0.8 near-duplicate DROP set (distinct higher doc_id of
    * each qualifying pair) over the memoized pair table — ONE definition
    * shared by [[ddDedupKeep]], [[txtCleanCorpus]], and
    * [[txtCurationFunnel]]; [[nearDropsDuck]] is its mirror. */
  private def nearDropSet(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select(col("ib")).distinct()

  /** The dedup ACTION: emit the kept corpus after dropping near-duplicates
    * (greedy keep-lowest-id: any doc that is the higher id of a pair with
    * Jaccard >= 0.8 is dropped). Anti-join — no doc² anywhere. */
  def ddDedupKeep(spark: SparkSession, dir: String): DataFrame = {
    val drops = nearDropSet(spark, dir)
    Tables.documents(spark, dir)
      .join(drops, col("doc_id") === col("ib"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** QUALITY-RANKED dedup keep — [[ddDedupKeep]] keeps each duplicate
    * cluster's LOWEST doc_id; a production pipeline keeps its BEST member
    * (dedup should never discard the clean copy of a page because a
    * boilerplate-ridden mirror has the smaller id). Cluster membership is
    * the same connected-components fixpoint as [[ddCluster]] (Jaccard ≥
    * 0.8 edges); quality is the [[txtClassifier]] linear-head score
    * (all-BIGINT numerator, one IEEE division — rank order is exact in
    * both engines); within each cluster the winner is rank 1 by
    * (score DESC NULLS LAST, doc_id). Scale shape: the cluster LABEL set
    * is edge-bounded (only near-dup members, a small fraction of a
    * typical corpus), so the label/loser/winner joins normally broadcast
    * into the two corpus scans and the full corpus is never shuffled —
    * the property that makes the min-id [[ddDedupKeep]] scalable, kept
    * here. The broadcast is NOT hinted, though: "near-dup-membership-
    * bounded" is data-dependent, not structurally capped like the
    * centroid/total broadcasts elsewhere, and a duplicate-heavy corpus
    * (a mirror-farm crawl can be mostly duplicates) would make a forced
    * broadcast approach corpus size and OOM the driver. AQE sees the
    * runtime size and picks broadcast when small, shuffle join when
    * not — degraded to a shuffle, never to a failure. */
  def ddDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val edges = jaccardPairs(spark, dir).filter(col("jaccard") >= 0.8)
      .select(col("ia").as("a"), col("ib").as("b"))
    val (labels, _) = connectedComponents(spark, edges)
    val lbl = labels().toDF("doc_id", "cluster_id")
    val scored = classifierScored(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("score"))
    val wBest = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc_nulls_last, col("doc_id"))
    val ranked = scored.join(lbl, Seq("doc_id"))
      .withColumn("rk", row_number().over(wBest))
    val losers = ranked.filter(col("rk") > 1).select(col("doc_id"))
    val winners = ranked.filter(col("rk") === 1).select(col("doc_id"), col("cluster_id"))
    scored
      .join(losers, Seq("doc_id"), "left_anti")
      .join(winners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("cluster_id"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** Near-duplicate CLUSTERS: connected components over the Jaccard >= 0.8
    * edge set (the same edges the dedup action uses), labelled by the
    * minimum doc_id in each component. Iterative min-label propagation —
    * each round is one join + one groupBy(min), both shuffle-bounded by the
    * edge count; rounds = component diameter (near-dup clusters are
    * pairs/chains of a handful of docs, so 2-3 rounds in practice). The
    * convergence check is an exact changed-label count, so the result is the
    * unique fixpoint regardless of round count — which is what makes it
    * comparable to the oracle's recursive-CTE transitive closure. */
  def ddCluster(spark: SparkSession, dir: String): DataFrame = {
    val debug = sys.env.contains("GRAFT_CLUSTER_DEBUG")
    val dbgT = System.nanoTime()
    val jp = jaccardPairs(spark, dir)
    if (debug)
      println(f"CLUSTER jaccardPairs-build ${(System.nanoTime() - dbgT) / 1e9}%.2fs")
    val edges = jp.filter(col("jaccard") >= 0.8)
      .select(col("ia").as("a"), col("ib").as("b"))
    val (labels, _) = connectedComponents(spark, edges)
    val sizes = labels().toDF("sd", "slbl")
      .groupBy(col("slbl")).agg(count(lit(1)).as("cluster_size"))
    val result = labels().join(sizes, col("lbl") === col("slbl"))
      .select(col("d").as("doc_id"), col("lbl").as("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
    if (debug) {
      val tf = System.nanoTime()
      result.count()
      println(f"CLUSTER final-assembly ${(System.nanoTime() - tf) / 1e9}%.2fs")
    }
    result
  }

  /** Duplication-structure histogram — the dedup dashboard readout (the
    * cluster-size distribution papers like Lee et al. 2022 report): one
    * row per duplicate-cluster size with the cluster and document counts
    * at that size, INCLUDING the size-1 row for documents in no near-dup
    * cluster (each its own singleton cluster, keyed by a negative
    * pseudo-label so it cannot collide with real labels = min doc ids).
    * Composes [[ddCluster]] verbatim (the census-from-checked-queries
    * rule); the label frame is near-dup-membership-bounded — small on a
    * typical corpus, but data-dependent, so the join is left UNHINTED
    * and AQE broadcasts it only when the runtime size allows (a
    * duplicate-heavy corpus degrades to a shuffle join instead of a
    * driver OOM; same reasoning as [[ddDedupKeepBest]]) — and the
    * histogram is a constant-size aggregate at any corpus size. Every
    * row satisfies
    * n_docs = cluster_size · n_clusters by construction — the spec pins
    * it. */
  def ddClusterHist(spark: SparkSession, dir: String): DataFrame = {
    val cl = ddCluster(spark, dir)
      .select(col("doc_id").as("cd"), col("cluster_id"), col("cluster_size"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(cl, col("doc_id") === col("cd"), "left")
      .withColumn("sz", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("cl", coalesce(col("cluster_id"), -col("doc_id") - lit(1L)))
      .groupBy(col("sz"))
      .agg(countDistinct(col("cl")).as("n_clusters"), count(lit(1)).as("n_docs"))
      .select(col("sz").as("cluster_size"), col("n_clusters"), col("n_docs"))
      .orderBy(col("cluster_size"))
  }

  /** The connected-components engine behind [[ddCluster]], over an
    * arbitrary undirected (a, b) edge set. Returns a THUNK minting fresh
    * (d, lbl) label frames (each call re-wraps the checkpointed state with
    * fresh attribute ids, so one result can appear in a plan several times
    * without analyzer attribute collisions) plus the ROUND COUNT — exposed
    * so the depth-stress spec can pin the pointer-doubling invariant:
    * rounds must stay O(log diameter), the property that makes this safe
    * on 100 TB graphs whose components may be long chains. */
  private[graft] def connectedComponents(
      spark: SparkSession, edges0: DataFrame): (() => DataFrame, Int) = {
    // Local checkpointing truncates lineage at the materialized edge set:
    // without it every loop action re-analyzes/optimizes the whole deep
    // shingle-join plan — measured 20x slower even with the data cached,
    // because the planning cost (not execution) dominates each round. Same
    // pattern for the per-round labels, so iteration k plans over a leaf,
    // not a k-deep union chain. (On a real cluster with executor loss to
    // worry about, use reliable `checkpoint` to the cluster FS instead —
    // same lineage-truncation effect.)
    //
    // The loop cost is JOB COUNT, not data, so each round runs exactly ONE
    // job: a foreach over the round's checkpointed state both materializes
    // it and counts changed labels through an accumulator (convergence is
    // fused into the materialization instead of being a separate join+count
    // job). Task retries can only overcount the accumulator, which at worst
    // schedules one extra no-op round — the fixpoint itself stays exact
    // because a converged round has zero changed rows to count. The prior
    // round's checkpoint RDD is unpersisted as soon as its successor is
    // materialized, so executor storage is bounded by two label tables no
    // matter how many rounds run.
    val debug = sys.env.contains("GRAFT_CLUSTER_DEBUG")
    val dbgT = System.nanoTime()

    // Mark for local checkpoint (lazily — the round-1 job materializes
    // edges, initial labels, and the round-1 state together).
    def ckptRdd(df: DataFrame): RDD[Row] = { val r = df.rdd; r.localCheckpoint(); r }

    val edges = edges0.select(col("a"), col("b"))
    val edgeSchema = edges.schema
    val edgesRdd = ckptRdd(edges)
    trackRdd(edgesRdd)
    if (debug)
      println(f"CLUSTER edges-planned ${(System.nanoTime() - dbgT) / 1e9}%.2fs")
    // Every re-wrap of a materialized RDD mints FRESH attribute ids, so one
    // materialized state can appear several times in a round's plan without
    // tripping analyzer attribute-rewrite on shared checkpointed leaves.
    def edgesDf: DataFrame = spark.createDataFrame(edgesRdd, edgeSchema)
    def sym: DataFrame = edgesDf.unionByName(edgesDf.select(col("b").as("a"), col("a").as("b")))

    // Label state carries (d, lbl, chg); chg only means something after a
    // round runs, but keeping it in the schema gives every round one RDD
    // shape to checkpoint and re-wrap.
    val init = sym.select(col("a").as("d")).distinct()
      .select(col("d"), col("d").as("lbl"), lit(true).as("chg"))
    val stateSchema = init.schema
    var labelsRdd = ckptRdd(init)
    if (debug)
      println(f"CLUSTER init-planned ${(System.nanoTime() - dbgT) / 1e9}%.2fs")
    def labelsDf(n1: String, n2: String): DataFrame =
      spark.createDataFrame(labelsRdd, stateSchema).select(col("d").as(n1), col("lbl").as(n2))

    def fresh(df: DataFrame, names: String*): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).toDF(names: _*)

    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      val rt = System.nanoTime()
      rounds += 1
      // part 1: min over own + neighbors' labels
      val viaNeighbor = sym.join(labelsDf("d2", "lbl2"), col("b") === col("d2"))
        .select(col("a").as("d"), col("lbl2").as("lbl"))
      val l1 = labelsDf("d", "lbl").unionByName(viaNeighbor)
        .groupBy(col("d")).agg(min(col("lbl")).as("lbl"))
      // part 2, same materialization: pointer doubling — follow lbl to ITS
      // label, so label distance halves each round and convergence is
      // O(log diameter); plain neighbor-min alone needs diameter-many
      // rounds. The jump side re-derives l1 via fresh() (2x the tiny agg
      // instead of an extra checkpoint). A label is always a node id, so
      // the join is total. The chg flag joins the PREVIOUS state in the
      // same plan — convergence rides along for free.
      val next = l1
        .join(fresh(l1, "jd", "jlbl"), col("lbl") === col("jd"))
        .select(col("d"), col("jlbl").as("lbl"))
        .join(labelsDf("d3", "old"), col("d") === col("d3"))
        .select(col("d"), col("lbl"), (col("lbl") =!= col("old")).as("chg"))
      val acc = spark.sparkContext.longAccumulator
      val nextRdd = ckptRdd(next)
      nextRdd.foreach(r => if (r.getBoolean(2)) acc.add(1))
      changed = acc.value
      // deliberate free of a truncated-lineage RDD — suppress the WARN
      withQuietRddLogger { labelsRdd.unpersist(blocking = false) }
      labelsRdd = nextRdd
      if (debug) println(f"CLUSTER round $rounds done ${(System.nanoTime() - rt) / 1e9}%.2fs changed=$changed")
    }
    trackRdd(labelsRdd) // final state feeds the caller's lazy result plan
    (() => labelsDf("d", "lbl"), rounds)
  }

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
  private def packBySequence(spark: SparkSession, dir: String,
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

  /** Frame-sampling plumbing over an opaque payload column: one row per
    * sampled frame (every 256 bytes, max 8 frames/item), with a
    * deterministic per-frame digest standing in for the decode step (the
    * real decoder is a Pandas-style batch UDF in [[Multimodal]]; this query
    * pins the explode/schema/partitioning layer, which is engine-checkable).
    * Generation via `sequence` keeps the fanout inside codegen — no join. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        explode_outer(expr("sequence(0L, least(n_bytes div 256, 7L))")).as("frame_idx"))
      .filter(col("frame_idx").isNotNull)
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 256).as("frame_off"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))).as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Fixed batch/corpus split of the whole incremental-dedup family:
    * doc_id < split is the already-ingested corpus, the rest the arriving
    * batch (stable across SFs ≥ 500 docs). ONE site, interpolated into the
    * Spark filters AND the DuckDB mirrors like the band/cap constants — a
    * drifted copy on either side would silently break cross-engine parity
    * until the oracle run caught it. */
  private val IncrementalSplit = 250L

  /** Incremental dedup (the ingestion-time shape): treat doc_id < half as
    * the already-ingested corpus and the rest as the incoming batch; keep
    * only incoming docs whose content fingerprint is NOT already present.
    * One anti-join on the content hash — at production scale the "existing"
    * side is a bucketed fingerprint table, so the anti-join is co-located
    * and the batch never rescans the corpus text. */
  def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val half = IncrementalSplit
    val existing = docs.filter(col("doc_id") < half).select(md5(col("text")).as("fp"))
    docs.filter(col("doc_id") >= half)
      .withColumn("fp", md5(col("text")))
      .join(existing, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup against a BUCKETED fingerprint table — the at-scale
    * form of [[ddIncremental]], on the driver-checked path (same result,
    * same oracle). The corpus fingerprint table is materialized ONCE as a
    * bucketed+sorted saved table (the ingestion-state a production pipeline
    * keeps between batches — the same state-read-back lifecycle the
    * reference sink implements, `/root/reference/index.js:109-122`), so the
    * anti-join reads the corpus side already hash-partitioned on fp: the
    * ONLY exchange in the join is the small incoming batch shuffling into
    * the bucket layout. At 100 TB the corpus fingerprints are billions of
    * rows — never re-shuffling (or re-hashing) them per batch is the entire
    * point; bucket count scales with the cluster (8 here for sf-test data).
    * The MERGE hint pins the sort-merge strategy the bucketing serves
    * (without it the tiny test-SF corpus side would broadcast and the plan
    * shape under test would vanish). */
  def ddIncrementalBucketed(spark: SparkSession, dir: String): DataFrame = {
    val t = fingerprintTable(spark, dir)
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= IncrementalSplit)
      .withColumn("fp", md5(col("text")))
      .join(spark.table(t).hint("merge"), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Idempotently materialize the existing-corpus fingerprint table
    * (doc_id < 250, matching [[ddIncremental]]'s split) bucketed+sorted on
    * fp. The table NAME carries a tag of the source dir, so the dir needs
    * no side-channel marker and two dirs sharing one warehouse (or one
    * SharedState serving several sessions) never delete each other's
    * layout; a stale warehouse directory from a previous JVM (the
    * in-memory catalog forgets tables across restarts but the files
    * persist) is deleted before the rewrite. */
  private def fingerprintTable(spark: SparkSession, dir: String): String = synchronized {
    val t = s"graft_fp_bucketed_${Tables.dirTag(dir)}"
    if (!spark.catalog.tableExists(t)) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        .stripPrefix("file:")
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      Tables.documents(spark, dir)
        .filter(col("doc_id") < IncrementalSplit)
        .select(md5(col("text")).as("fp"))
        // single writer task: N input partitions x 8 buckets would commit
        // up to 8N tiny files for a 250-row state table. At production
        // scale this repartitions on the bucket key instead, sized so each
        // task writes one healthy file per bucket.
        .repartition(1)
        .write.bucketBy(8, "fp").sortBy("fp").saveAsTable(t)
    }
    t
  }

  /** INGESTION-HEALTH census — promotes [[graft.sources.JsonlDocs]]'s
    * quarantine accounting to the oracle-checked surface: a JSONL feed is
    * derived in-plan from the documents table with DETERMINISTIC planted
    * damage (doc_id % 10 = 3 → line truncated INSIDE the first field's
    * KEY, so the prefix `{"doc` contains no complete field and no parser
    * version — not even a partial-result parser in the SPARK-33134
    * lineage — can recover doc_id or text from it; % 10 = 5 → the
    * required doc_id field absent; % 10 = 7 → the required text field
    * absent), pushed through the REAL permissive parser (`from_json` over
    * [[graft.sources.JsonlDocs.schema]]) and the REAL admission/reason
    * classifiers ingestion uses, then counted per reason. The oracle
    * recomputes the expected counts from the damage rule alone — so the
    * hash match asserts the parser + classifier recover exactly the
    * damage that was planted: torn lines parse to nothing, field-dropped
    * lines parse but fail admission with the right reason, clean lines
    * admit. (Implied conservation: the four counts sum to the corpus.)
    * Per-row work over one scan + a 4-row aggregate — an ingestion-health
    * dashboard query that stays free at any scale. */
  /** The deterministic planted-damage JSONL feed behind
    * [[ingestQuarantine]], exposed so the STREAMING quarantine twin's
    * spec can replay the identical lines through
    * [[graft.streaming.EventStream.quarantineCensus]]: one `value` column
    * of raw lines, damaged by the doc_id % 10 rule above. */
  private[graft] def plantedDamageLines(spark: SparkSession, dir: String): DataFrame = {
    val full = "to_json(named_struct('doc_id', doc_id, 'text', text, 'lang', lang, 'source', source))"
    val noId = "to_json(named_struct('text', text, 'lang', lang, 'source', source))"
    val noText = "to_json(named_struct('doc_id', doc_id, 'lang', lang, 'source', source))"
    Tables.documents(spark, dir)
      .select(
        // tear point: 5 chars keeps `{"doc` — inside the first KEY, so the
        // torn classification cannot depend on how much of a VALUE a
        // future partial-result parser chooses to salvage
        when(col("doc_id") % 10 === 3, expr(s"substr($full, 1, 5)"))
          .when(col("doc_id") % 10 === 5, expr(noId))
          .when(col("doc_id") % 10 === 7, expr(noText))
          .otherwise(expr(full)).as("value"))
  }

  def ingestQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.JsonlDocs
    plantedDamageLines(spark, dir)
      .withColumn("j", from_json(col("value"), JsonlDocs.schema))
      .select(
        when(JsonlDocs.okCol(col("j")), lit("ok"))
          .otherwise(JsonlDocs.reasonCol(col("j"))).as("reason"))
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))
      .orderBy(col("reason"))
  }

  /** MinHash signatures (k=8 permutations approximated by seeded md5 minima
    * over the shingle set). The per-doc aggregation is a single map-side
    * combinable groupBy — scales linearly in total shingle count. */
  def ddMinhashSig(spark: SparkSession, dir: String): DataFrame =
    minhashSig(spark, dir).orderBy(col("doc_id"))

  /** Unordered minhash signature table — same no-sort-before-checkpoint
    * reasoning as [[simhashSig]], and since round 10 the same
    * per-(session, dir) memo: the sig query, the pairs query (which reads
    * it three times), and any re-run share ONE build, prewarmed by
    * [[stateBuilders]]. */
  private def minhashSig(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "minhash_sig") { buildMinhashSig(spark, dir) }

  private def buildMinhashSig(spark: SparkSession, dir: String): DataFrame = {
    // 8 "permutations" from 2 md5 calls via 8-hex slicing (one-hash-many-
    // slices): each 32-bit slice of a well-mixed digest acts as an
    // independent hash. 2 digests per shingle instead of 8 — the md5 work
    // is the dominant cost of the whole minhash pipeline at scale.
    // repartition + explode_outer: the single-split parallelism fix and the
    // InferFiltersFromGenerate pushdown fix from jaccardPairs (see there)
    val sh = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"), explode_outer(expr(shinglesSpark)).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("h1", md5(col("s")))
      .withColumn("h2", md5(concat(lit("x"), col("s"))))
    val mhs = (0 until 8).map { j =>
      val (h, off) = if (j < 4) ("h1", j) else ("h2", j - 4)
      min(substring(col(h), 1 + 8 * off, 8)).as(s"mh$j")
    }
    sh.groupBy(col("doc_id"))
      .agg(mhs.head, mhs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: 4 bands × 2 rows; docs sharing any band
    * bucket become candidates; estimated similarity = matching minhashes / 8.
    * Banding bounds candidates without any doc² join. */
  def ddMinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // The signature table feeds the band generator AND both sides of the
    // candidate join — without the shared memo Spark would recompute the
    // full shingle explode + 8 md5-min aggregations three times. The
    // memoSig cache (a cache, NOT a localCheckpoint leaf — deliberately:
    // consumers of a cached tree still run under AQE, which coalesces this
    // tiny table to one partition and then plans the candidate distinct
    // WITHOUT its own exchange; over a checkpoint-RDD leaf AQE disengages
    // and the same distinct pays a full shuffle, measured 1.8s → 6.9s on
    // dd_simhash_pairs) is materialized eagerly at build time, so parallel
    // consumers can't race past an unpopulated cache. The jaccard pipeline
    // makes the opposite call — see buildJaccardPairs, where per-consumer
    // PLANNING cost dominates.
    val sig = minhashSig(spark, dir)
    val bands = sig.selectExpr("doc_id",
      "stack(4, 0, md5(concat(mh0, mh1)), 1, md5(concat(mh2, mh3)), " +
        "2, md5(concat(mh4, mh5)), 3, md5(concat(mh6, mh7))) as (band, bh)")
    val cand = bands.toDF("ia", "band", "bh")
      .join(bands.toDF("ib", "band2", "bh2"),
        col("band") === col("band2") && col("bh") === col("bh2") && col("ia") < col("ib"))
      .select(col("ia"), col("ib")).distinct()
    val est = (0 until 8).map(j => when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / 8.0
    cand.join(sig.as("a"), col("ia") === col("a.doc_id"))
      .join(sig.as("b"), col("ib") === col("b.doc_id"))
      .select(col("ia"), col("ib"), est.as("est_sim"))
      .orderBy(col("est_sim").desc, col("ia"), col("ib"))
      .limit(200)
  }

  /** Incremental NEAR-dup dedup — [[ddIncremental]]'s contract at MinHash
    * strength: an arriving batch (doc_id ≥ 250, the fixed split) is probed
    * against the EXISTING corpus (doc_id < 250) through the production-
    * width LSH index, and a batch doc is dropped when any corpus doc
    * estimates ≥ 0.5 Jaccard — continuous-ingestion dedup as crawl
    * pipelines actually run it (exact fp anti-join catches only verbatim
    * re-fetches; re-crawls differ by ads/timestamps and need the near-dup
    * probe). Join is batch-bands → corpus-bands ONLY (never batch×batch —
    * an arriving batch is deduped against the corpus, internal batch dups
    * are the next batch's corpus problem), so per batch doc the work is
    * ≤ bands × bucket-cap candidates regardless of corpus size; the
    * corpus-side per-(band, bucket) cap is the same monster-cluster guard
    * as [[ddMinhashWidePairs]], at the 4× width [[IncrementalProbeCap]]
    * (the capped side is recall-critical here) with the cut surfaced by
    * [[ddIncrementalCapped]]. Both sides read the ONE memoized
    * signature table. Emits EVERY arriving doc — the output is the
    * batch's admission list, so nothing may be silently absent: a doc
    * with a corpus match carries (match_id, est_sim) and drops at ≥ 0.5;
    * a sub-3-token doc has no shingles, cannot near-dup, and keeps with
    * a null match like any other unmatched doc. */
  def ddIncrementalNear(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashWideSig(spark, dir)
    val half = IncrementalSplit
    val cb = cappedWideBands(sig.filter(col("doc_id") < half), IncrementalProbeCap)
    val cand = wideBands(sig.filter(col("doc_id") >= half)).toDF("ia", "band", "bh")
      .join(cb.toDF("ib", "band2", "bh2"),
        col("band") === col("band2") && col("bh") === col("bh2"))
      .select(col("ia"), col("ib")).distinct()
    val wBest = Window.partitionBy(col("ia")).orderBy(col("est_sim").desc, col("ib"))
    val best = cand.join(sig.as("a"), col("ia") === col("a.doc_id"))
      .join(sig.as("b"), col("ib") === col("b.doc_id"))
      .select(col("ia"), col("ib"), wideEstSim.as("est_sim"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("ia"), col("ib").as("match_id"), col("est_sim"))
    // verdict base = EVERY arriving doc (conservation: the output is the
    // batch's admission list, so nothing may be silently absent) — a
    // sub-3-token doc has no shingles, cannot near-dup, and keeps
    Tables.documents(spark, dir).filter(col("doc_id") >= half).select(col("doc_id"))
      .join(best.withColumnRenamed("ia", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id"), col("est_sim"),
        (col("est_sim").isNull || col("est_sim") < 0.5).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Production-width MinHash geometry: [[MinhashWidePerms]] permutations
    * banded as [[MinhashWideBands]] bands × 4 rows — the width real dedup
    * pipelines run (Lee et al. 2022 use 128+ perms; 64/16×4 is the same
    * regime, vs the didactic 8/4×2 of [[ddMinhashSig]], which stays as the
    * cheap twin exactly like 16-bit simhash next to its 60-bit production
    * twin). 4-row bands put the LSH S-curve threshold at
    * (1/16)^(1/4) ≈ 0.5 Jaccard — the near-dup operating point — with
    * far sharper low-similarity suppression than the 2-row didactic bands:
    * P(candidate) = 1−(1−j⁴)¹⁶ is ~1 above j=0.7 and <3% below j=0.2. */
  private val MinhashWidePerms = 64
  private val MinhashWideBands = 16

  /** Production-width MinHash signatures — [[MinhashWidePerms]] permutations
    * from 16 seeded md5 digests per shingle (same one-hash-many-slices
    * scheme as [[buildMinhashSig]]: each 8-hex slice of a well-mixed digest
    * is an independent 32-bit hash, so 16 digests yield 64 permutations at
    * a quarter of the naive md5 count). Same single map-side-combinable
    * min-aggregation — linear in total shingle count at any corpus size,
    * 8× the didactic path's hash work, identically shaped. */
  def ddMinhashWide(spark: SparkSession, dir: String): DataFrame =
    minhashWideSig(spark, dir).orderBy(col("doc_id"))

  /** Unordered wide signature table, memoized + prewarmed like
    * [[minhashSig]] — the sig query, the wide-pairs query (three reads),
    * and re-runs share ONE build. */
  private def minhashWideSig(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "minhash_wide_sig") { buildMinhashWideSig(spark, dir) }

  private def buildMinhashWideSig(spark: SparkSession, dir: String): DataFrame =
    buildMinhashWideSigN(spark, dir, MinhashWidePerms)

  /** The wide-signature build generalized over permutation count —
    * perms/4 seeded digests ("w<d>:" prefixes keep them independent of
    * the didactic path's md5(s) / md5('x'||s) family; the 64-perm
    * signature is by construction the first 64 slices of the 128-perm
    * one). One map-side-combinable min-aggregation whatever the width. */
  private def buildMinhashWideSigN(spark: SparkSession, dir: String, perms: Int): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"), explode_outer(expr(shinglesSpark)).as("s"))
      .filter(col("s").isNotNull)
    val hashed = (0 until perms / 4).foldLeft(sh) { (df, d) =>
      df.withColumn(s"h$d", md5(concat(lit(s"w$d:"), col("s"))))
    }
    val mhs = (0 until perms).map { j =>
      min(substring(col(s"h${j / 4}"), 1 + 8 * (j % 4), 8)).as(s"mh$j")
    }
    hashed.groupBy(col("doc_id")).agg(mhs.head, mhs.tail: _*)
  }

  /** TRUE-production-width MinHash signatures — 128 permutations (Lee et
    * al. 2022 run 128+; 64 is the regime's low end) from 32 seeded
    * digests via the same one-hash-many-slices scheme. Memoized +
    * prewarmed like the 64-perm table; the banding/pairs surface stays on
    * the 64-perm geometry (16×4 at the 0.5-Jaccard operating point) —
    * this table is the signature WIDTH probe the estimator accuracy
    * story needs (est_sim variance halves at 128 slices). */
  def ddMinhashWide128(spark: SparkSession, dir: String): DataFrame =
    minhashWide128Sig(spark, dir).orderBy(col("doc_id"))

  private def minhashWide128Sig(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "minhash_wide128_sig") { buildMinhashWideSigN(spark, dir, 128) }

  /** [[MinhashWideBands]]-band stack over a wide-signature frame →
    * (doc_id, band, bh). One code site for the band geometry — the pairs
    * query, the incremental probe, and the DuckDB mirrors
    * ([[wideBandsDuckBranches]]) must agree on it exactly. */
  private def wideBands(sig: DataFrame): DataFrame = {
    val stackArgs = (0 until MinhashWideBands).map { bd =>
      val bh = (0 until 4).map(r => s"mh${4 * bd + r}").mkString("concat(", ", ", ")")
      s"$bd, md5($bh)"
    }.mkString(", ")
    sig.selectExpr("doc_id", s"stack($MinhashWideBands, $stackArgs) as (band, bh)")
  }

  /** [[wideBands]] with a per-(band, bucket) membership cap (keep the
    * smallest doc_ids, deterministic). Default [[SimhashBucketCap]]; the
    * incremental probe passes [[IncrementalProbeCap]] — there the capped
    * side is the recall-critical corpus. */
  private def cappedWideBands(sig: DataFrame, cap: Int = SimhashBucketCap): DataFrame =
    wideBands(sig)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("bh")).orderBy(col("doc_id"))))
      .filter(col("rn") <= cap).drop("rn")

  /** Corpus-side bucket cap of the INCREMENTAL near-dup probe — 4× the
    * pairs-query cap, because here the capped side is the recall-critical
    * one: evicting an arriving doc's only colliding corpus twin from every
    * band admits a genuine near-dup as "fresh" (a silent false negative on
    * the admission list). The probe's work per batch doc stays bounded at
    * bands × cap regardless of corpus size, and [[ddIncrementalCapped]]
    * surfaces exactly how much the cap is cutting (the repo's no-silent-
    * caps rule): zero capped-out rows at the synthetic SFs, nonzero under
    * a monster exact-dup cluster (LlmOpsSpec plants one). */
  // lazy: declared ahead of SimhashBucketCap in object-init order
  private lazy val IncrementalProbeCap = 4 * SimhashBucketCap

  /** Cap ACCOUNTING for [[ddIncrementalNear]] — one summary row measuring
    * what the corpus-side bucket cap cut this run: total corpus band rows,
    * buckets over the cap, and rows capped out (each a potential missed
    * match). The loss a production pipeline alarms on instead of
    * discovering at audit time; the oracle pins it to zero on the
    * synthetic corpora, which is itself the claim worth checking. */
  def ddIncrementalCapped(spark: SparkSession, dir: String): DataFrame =
    wideBands(minhashWideSig(spark, dir).filter(col("doc_id") < IncrementalSplit))
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_buckets"),
        sum(when(col("cnt") > IncrementalProbeCap, lit(1L)).otherwise(lit(0L)))
          .as("n_buckets_capped"),
        sum(greatest(col("cnt") - IncrementalProbeCap, lit(0L)))
          .as("n_rows_capped_out"))

  /** Row-LOCAL wide signature, for the STREAMING probe: the same 64
    * min-slices as [[buildMinhashWideSig]] — same "w<d>:" seeded digests,
    * same 8-hex slicing, min over the same shingle set — computed as
    * array expressions within each document's own row (a streaming select
    * cannot run the table aggregation; it doesn't need to, since all of a
    * doc's shingles live in its row). Appends a `sig` array<string>(64)
    * column; a doc that cannot shingle gets all-null slices, which
    * null out its band hashes downstream — the per-row form of "no sig
    * row, no bands". Each of the 16 digests is computed once per shingle
    * and sliced four ways (codegen subexpression elimination keeps the
    * md5 count identical to the batch build). */
  private[graft] def withWideSigPerRow(df: DataFrame): DataFrame = {
    val withSh = df.withColumn("toks", expr(toksSpark))
      .withColumn("sh_", expr(shinglesSpark))
    val withH = (0 until MinhashWidePerms / 4).foldLeft(withSh) { (d2, dg) =>
      d2.withColumn(s"h$dg", expr(s"transform(sh_, s -> md5(concat('w$dg:', s)))"))
    }
    val sigCols = (0 until MinhashWidePerms).map { j =>
      expr(s"array_min(transform(h${j / 4}, x -> substr(x, ${1 + 8 * (j % 4)}, 8)))")
    }
    withH.withColumn("sig", array(sigCols: _*))
      .drop(((0 until MinhashWidePerms / 4).map(d => s"h$d") ++ Seq("toks", "sh_")): _*)
  }

  /** Row-local [[MinhashWideBands]]-band stack over a `sig` array column:
    * array of (band, bh) structs, bh = md5 of the band's four slices —
    * exactly [[wideBands]]'s hash over the same geometry constants, so
    * the streaming probe and the batch index agree band for band. */
  private[graft] def wideBandsPerRow(sig: Column): Column =
    array((0 until MinhashWideBands).map { bd =>
      struct(lit(bd).as("band"),
        md5(concat((0 until 4).map(r => sig.getItem(4 * bd + r)): _*)).as("bh"))
    }: _*)

  /** The STATIC corpus state a streaming near-dup probe joins against —
    * (ib, band, bh, mh0..mh63): the capped corpus band table
    * ([[IncrementalProbeCap]], same as the batch probe) carrying the
    * corpus signature slices, built from the ONE memoized wide-signature
    * table. Re-read per micro-batch by the stream-static join (the same
    * refresh-between-restarts contract as the fingerprint state in
    * [[graft.streaming.EventStream.dedupeAgainstCorpus]]); at production
    * scale this is the persisted LSH index table. */
  def nearDupCorpusState(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashWideSig(spark, dir).filter(col("doc_id") < IncrementalSplit)
    cappedWideBands(sig, IncrementalProbeCap).toDF("ib", "band", "bh")
      .join(sig.toDF(("ib" +: (0 until MinhashWidePerms).map(j => s"mh$j")): _*), "ib")
  }

  /** est_sim of a streaming candidate row: the row-local `sig` array
    * against a joined corpus signature's mh columns — [[wideEstSim]]'s
    * arithmetic (count of matching slices, cast, one division) against
    * the per-row layout. */
  private[graft] def wideEstSimPerRow(sig: Column): Column =
    (0 until MinhashWidePerms)
      .map(j => when(sig.getItem(j) === col(s"mh$j"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / MinhashWidePerms.toDouble

  /** Matching-slice COUNT for a candidate joined to the signature as
    * `a`/`b` — the integer numerator of the Jaccard estimate, exposed
    * separately so the calibration census can aggregate it exactly
    * (BIGINT sums, no double accumulation). */
  private def wideMatches: Column =
    (0 until MinhashWidePerms)
      .map(j => when(col(s"a.mh$j") === col(s"b.mh$j"), 1L).otherwise(0L))
      .reduce(_ + _)

  /** est_sim for a candidate joined to the signature as `a`/`b`:
    * matching slices / [[MinhashWidePerms]]. */
  private def wideEstSim: Column =
    wideMatches.cast("double") / MinhashWidePerms.toDouble

  /** Wide MinHash-LSH candidate pairs: [[MinhashWideBands]] bands × 4 rows;
    * est_sim = matching minhashes / 64. Same banded no-doc² shape as
    * [[ddMinhashPairs]], PLUS the per-(band, bucket) membership cap the
    * simhash paths carry ([[SimhashBucketCap]] — see its Scaladoc for the
    * identical-signature monster-cluster measurement that motivates it):
    * candidate volume is bounded by bands × buckets × cap²/2 regardless of
    * the largest duplicate cluster, which matters MORE here than at 8
    * perms — identical docs agree on all 64 slices, so a giant exact-dup
    * cluster lands in one bucket per band. */
  def ddMinhashWidePairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashWideSig(spark, dir)
    val cand = wideBandCandidates(spark, dir).toDF("ia", "ib")
    cand.join(sig.as("a"), col("ia") === col("a.doc_id"))
      .join(sig.as("b"), col("ib") === col("b.doc_id"))
      .select(col("ia"), col("ib"), wideEstSim.as("est_sim"))
      .orderBy(col("est_sim").desc, col("ia"), col("ib"))
      .limit(200)
  }

  /** Banding-accuracy census of the production 16×4 LSH geometry — the
    * MEASURED S-curve a dedup deployment validates its band choice with
    * (P(candidate | J); Leskovec/Rajaraman/Ullman MMDS ch. 3 give the
    * theoretical 1−(1−J⁴)¹⁶): exact same-block pairs from the memoized
    * [[jaccardPairs]] truth, binned by true Jaccard into twentieths via
    * INTEGER arithmetic (`(20·common) div union` — no float binning to
    * drift cross-engine), each bin counting its truth pairs and how many
    * of them [[ddMinhashWidePairs]]' capped banded candidate generation
    * retrieves; recall is the single int/int IEEE division. The truth
    * universe is overlap-POSITIVE pairs (≥ 1 shared shingle): zero-overlap
    * pairs never materialize a pair-table row in either engine, and the
    * J≈0 end is not what a band geometry is tuned on. Retrieval is
    * counted at candidate GENERATION (band-bucket collision, before
    * est_sim verification): candidate recall is the property the band
    * geometry controls — verification only filters. The census universe
    * is the blocked truth (same lang, same length bucket); cross-block
    * banded candidates have no exact Jaccard and are out of scope,
    * exactly as production measures this curve on a blocked ground-truth
    * sample.
    *
    * Scale shape: truth is the block-bounded checkpointed pair table
    * (never doc²); the candidate side is the same capped band self-join
    * the pairs query already bounds (bands × buckets × cap²/2); one
    * pair-keyed left join between two bounded tables folds to ≤ 21 rows
    * of (bin, counts) — constant output at any corpus size. */
  def ddMinhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = jaccardBins(spark, dir)
    val cand = wideBandCandidates(spark, dir)
    truth.join(cand, col("ia") === col("ca") && col("ib") === col("cb"), "left")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"), count(col("ca")).as("n_retrieved"))
      .withColumn("j_lo_pct", col("bin") * lit(5L))
      .withColumn("recall", col("n_retrieved") / col("n_pairs"))
      .select(col("bin"), col("j_lo_pct"), col("n_pairs"), col("n_retrieved"),
        col("recall"))
      .orderBy(col("bin"))
  }

  /** MinHash ESTIMATOR calibration census — Broder's unbiasedness theorem
    * (E[est_sim] = J for min-wise independent permutations) made
    * measurable on the production signature: over banded candidates that
    * HAVE blocked exact truth, per true-Jaccard twentieth (the same
    * integer binning as [[ddMinhashRecall]]): pair count, total matching
    * slices as a BIGINT sum of the integer est_sim numerators (no double
    * accumulation to drift with partition order), and the mean estimate
    * `avg_est = sum_matches / (64·n_pairs)` as ONE int/int IEEE division.
    * Read against the bin's true-J range [bin/20, (bin+1)/20), this is
    * the estimator's bias readout — the companion to the recall census:
    * that one validates the BANDING, this one validates the ESTIMATE the
    * surviving candidates are verified with. Same bounded join shape
    * (candidates ∩ truth, both pair-bounded), ≤ 21 output rows. */
  def ddMinhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashWideSig(spark, dir)
    wideBandCandidates(spark, dir)
      .join(jaccardBins(spark, dir),
        col("ia") === col("ca") && col("ib") === col("cb"))
      .join(sig.as("a"), col("ca") === col("a.doc_id"))
      .join(sig.as("b"), col("cb") === col("b.doc_id"))
      .select(col("bin"), wideMatches.as("matches"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("matches")).as("sum_matches"))
      .withColumn("avg_est",
        col("sum_matches") / (lit(MinhashWidePerms.toLong) * col("n_pairs")))
      .orderBy(col("bin"))
  }

  /** Blocked exact-truth pairs with their integer Jaccard twentieth —
    * `(20·common) div union` on BIGINTs (the no-float-binning rule) —
    * shared by the recall and calibration censuses. */
  private def jaccardBins(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir)
      .select(col("ia"), col("ib"),
        expr("(20 * common) div (na + nb - common)").as("bin"))

  /** The banded candidate set (distinct ca &lt; cb band-bucket collisions
    * over the capped 16×4 bands) — the generation step shared by the
    * pairs query and both censuses; [[bandCandDuck]]'s Spark twin.
    * MEMOIZED like the signature table it derives from: all three
    * consumers re-ran the band stack + capped self-join (~5 s apiece at
    * sf2), and the distinct pair set is cap-bounded (never doc²) so the
    * cache is small at any scale — the same shared-state move as
    * [[bruteTruthTable]]. */
  private def wideBandCandidates(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "band_candidates") {
      val bands = cappedWideBands(minhashWideSig(spark, dir))
      bands.toDF("ca", "band", "bh")
        .join(bands.toDF("cb", "band2", "bh2"),
          col("band") === col("band2") && col("bh") === col("bh2") && col("ca") < col("cb"))
        .select(col("ca"), col("cb")).distinct()
    }

  /** 16-bit SimHash over the distinct word set (md5-derived 16-bit token
    * hashes, per-bit majority vote). */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashSig(spark, dir).select(col("doc_id"), col("simhash")).orderBy(col("doc_id"))

  /** The unordered signature table — what the pairs query materializes.
    * NO orderBy here: a global sort ahead of a checkpoint would run the
    * whole tokenize pipeline twice (the range partitioner's sampling pass
    * executes the child once before the real pass), and join consumers
    * don't care about order. The driver-facing [[ddSimhash]] adds the sort
    * on top for its deterministic output contract. */
  /** Deterministic 1/2 content sample: docs whose md5(text) first hex
    * nibble is even. Content-keyed (not id-keyed) so the sample is stable
    * under re-ingestion/re-sharding, and expressible verbatim in DuckDB —
    * the oracle applies the identical predicate, keeping the check exact. */
  private val evenFpSpark =
    "substr(md5(text), 1, 1) IN ('0','2','4','6','8','a','c','e')"

  /** Memoized per (session, dir, width): ONE signature build serves both
    * the signature-reporting query and the pairs query of its width (and
    * is prewarmed by [[stateBuilders]] so neither absorbs the build into
    * its floor). The 16-bit table carries the [[evenFpSpark]] flag as a
    * column, so the sampled pairs twin is a FILTER over the shared table
    * instead of a second tokenize pass. */
  /** A memoized index-table slot: `fp` is the source-data fingerprint the
    * build observed; the lazy `df` materializes under the CELL's own
    * monitor, so concurrent consumers of DIFFERENT memo keys never
    * serialize behind one build (the map's per-bin lock only guards cell
    * creation, which is cheap). `peek` exposes the frame ONLY once built —
    * the stale-release path must never force an unbuilt cell (a failed
    * build's cell would otherwise rebuild, possibly recursively through
    * this very map, inside the release path). */
  private final class MemoCell(val fp: Long, build: () => DataFrame) {
    @volatile private var built: DataFrame = _
    def peek: Option[DataFrame] = Option(built)
    lazy val df: DataFrame = { val d = build(); built = d; d }
  }
  private val sigMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), MemoCell]

  /** Source-data fingerprint for a testdata dir: the newest modification
    * time across the two tables the memoized index state derives from,
    * resolved through the Hadoop filesystem of the path (so hdfs://s3://
    * URIs and directory-layout parquet fingerprint correctly — a plain
    * java.io.File mtime is 0 for a URI and misses in-place part-file
    * rewrites under a directory). A harness that REGENERATES a dir
    * mid-session (the driver does) changes the fingerprint, so the next
    * memo call misses and rebuilds — without this, build-once state would
    * silently serve the old data. (`releaseCaches()` remains the bulk
    * lifecycle: release everything when the session is done with a dir.) */
  private def dirFingerprint(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = (spark, dir)
    // A MISSING table is a stable state and fingerprints as 0 (some dirs
    // legitimately lack embeddings); any OTHER filesystem failure is a
    // transient metadata hiccup (e.g. a listing racing a regeneration) —
    // returning 0 for those would flip the fingerprint down and back up,
    // evicting and rebuilding expensive index state twice for nothing.
    // Fall back to the last successfully observed value instead: unreadable
    // means "unchanged until proven otherwise".
    val computed: Option[Long] = try {
      Some(Seq("documents.parquet", "embeddings.parquet").map { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
        val fs = p.getFileSystem(conf)
        try {
          val st = fs.getFileStatus(p)
          if (st.isDirectory)
            fs.listStatus(p).map(_.getModificationTime)
              .foldLeft(st.getModificationTime)(math.max)
          else st.getModificationTime
        } catch { case _: java.io.FileNotFoundException => 0L }
      }.max)
    } catch { case _: Throwable => None }
    computed match {
      case Some(fp) => fpMemo.put(key, java.lang.Long.valueOf(fp)); fp
      case None => Option(fpMemo.get(key)).map(_.longValue).getOrElse(0L)
    }
  }

  /** Last successfully computed fingerprint per (session, dir) — the
    * fallback [[dirFingerprint]] serves when the filesystem is transiently
    * unreadable. */
  private val fpMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]

  /** The memo spine shared by [[memoSig]] and [[memoRaw]]: fingerprint
    * check, stale eviction, per-key lazy build. The stale release runs
    * OUTSIDE any map lock — it is a Spark call, and a fresh build may
    * recursively enter this memo (the serve-PQ code table builds on the
    * serve assignment); only cheap cell construction happens inside
    * computeIfAbsent. */
  private def memoCell(spark: SparkSession, dir: String, kind: String)
      (thunk: () => DataFrame): DataFrame = {
    val key = (spark, dir, kind)
    val fp = dirFingerprint(spark, dir)
    val existing = sigMemo.get(key)
    // Evict only when the OBSERVED fingerprint is strictly newer than the
    // cell's (mtimes are monotonic): a thread that read the fingerprint
    // BEFORE a concurrent regeneration must not tear down the fresh cell a
    // faster thread already installed — with `!=` it would unpersist a
    // table other queries are using and re-insert a cell stamped with the
    // stale fp, thrashing the memo until the next call re-evicts.
    if (existing != null && existing.fp < fp && sigMemo.remove(key, existing))
      // stale entry (dir regenerated): best-effort drop of whatever it
      // MATERIALIZED (never force an unbuilt cell); self-tracked builds
      // keep their storage until releaseCaches, which is acceptable —
      // correctness needs only the memo MISS
      existing.peek.foreach(d => try d.unpersist(false) catch { case _: Throwable => () })
    sigMemo.computeIfAbsent(key, _ => new MemoCell(fp, thunk)).df
  }

  /** Memoize + cache + eagerly materialize + track an index table. */
  private def memoSig(spark: SparkSession, dir: String, kind: String)
      (build: => DataFrame): DataFrame =
    memoCell(spark, dir, kind)(() => { val df = build.cache(); df.count(); track(df) })

  /** Memoize a build that handles its OWN materialization/tracking
    * (jaccard pairs checkpoint their RDD, passage windows cache+count
    * inside the build) — same fingerprint + per-key-lock semantics as
    * [[memoSig]] without double-caching the result. */
  private[analytics] def memoRaw(spark: SparkSession, dir: String, kind: String)
      (build: => DataFrame): DataFrame =
    memoCell(spark, dir, kind)(() => build)

  private def simhashSig(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "sig16") {
      val tok = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("efp", expr(evenFpSpark))
        .withColumn("toks", expr(toksSpark))
        .select(col("doc_id"), col("efp"),
          explode_outer(array_distinct(col("toks"))).as("t"))
        .filter(col("t").isNotNull)
        .withColumn("h", expr(hex4("md5(t)")).cast("long"))
      val bits = (0 until 16).map(i =>
        sum(expr(s"CASE WHEN (h div ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END")).as(s"b$i"))
      val bitSums = tok.groupBy(col("doc_id"), col("efp")).agg(bits.head, bits.tail: _*)
      bitSums.select(col("doc_id"), col("efp"),
        (0 until 16).map(i => expr(s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END"))
          .reduce(_ + _).cast("long").as("simhash"))
    }

  /** Per-(band, bucket) membership CAP for the simhash LSH paths — the
    * [[StopShingleCap]] analog: a band bucket contributes at most cap²/2
    * candidate pairs regardless of corpus size, so total candidate volume
    * is bounded by buckets × cap²/2 — a CONSTANT per configuration — not
    * by the square of the largest duplicate cluster. The sf1 rehearsal
    * measured why this is required: the synthetic corpus's 31-token
    * vocabulary collapses 24.9k docs to 3.8k distinct 16-bit signatures
    * (largest identical-signature cluster 2,019 docs ⇒ 2M+ pairs from ONE
    * bucket; 21.9s). The cap keeps the smallest `SimhashBucketCap` doc_ids
    * per bucket (deterministic, window row_number, mirrored in the
    * oracle); monster clusters still surface — their lowest-id members
    * pair among themselves and fill the top-200 with hamming-0 rows — and
    * members lost to the cap are same-bucket near-identicals a production
    * pipeline removes with EXACT dedup upstream of LSH. */
  private val SimhashBucketCap = 64

  /** SimHash near-dup PAIRS: banded candidate generation + exact Hamming
    * verify. The 16-bit simhash splits into four 4-bit bands; two hashes
    * within Hamming distance 3 differ in at most 3 bands, so they agree
    * exactly on at least one (pigeonhole) — candidates are pairs sharing
    * any band value, verified with bit_count(xor) <= 3. Banding bounds the
    * join fanout the same way MinHash-LSH banding does: no doc² anywhere;
    * [[SimhashBucketCap]] bounds the per-bucket fanout.
    *
    * The 16-bit width is the DIDACTIC twin of [[ddSimhashWidePairs]] (the
    * production path): with only 64 band buckets its candidate set is
    * ~50× the wide path's (~3M rows at sf0.1), so the twin runs over the
    * deterministic 1/2 content sample ([[evenFpSpark]], mirrored verbatim
    * in the oracle SQL) — candidates quarter while the banding/verify
    * plan under demonstration stays identical. */
  def ddSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // the memoized full-corpus table filtered by the precomputed sample
    // flag — no second tokenize pass for the sampled twin
    val sig = simhashSig(spark, dir).filter(col("efp"))
    val bands = sig.select(col("doc_id"), col("simhash"),
        explode_outer(expr("sequence(0, 3)")).as("band"))
      .filter(col("band").isNotNull)
      .withColumn("bv", expr("(simhash div CAST(pow(16, band) AS BIGINT)) % 16"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("bv")).orderBy(col("doc_id"))))
      .filter(col("rn") <= SimhashBucketCap).drop("rn")
    val cand = bands.toDF("ia", "ha", "band", "bv")
      .join(bands.toDF("ib", "hb", "band2", "bv2"),
        col("band") === col("band2") && col("bv") === col("bv2") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("ha"), col("hb")).distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= 3)
      .select(col("ia"), col("ib"), col("hamming"))
      .orderBy(col("hamming"), col("ia"), col("ib"))
      .limit(200)
  }

  /** WIDE SimHash — the production-width configuration PLANS.md promises:
    * 60 bits (the widest md5 prefix whose arithmetic stays in signed
    * 64-bit in both engines) instead of 16. Same per-bit majority vote
    * over the distinct word set. */
  def ddSimhashWide(spark: SparkSession, dir: String): DataFrame =
    simhashWideSig(spark, dir).orderBy(col("doc_id"))

  private def simhashWideSig(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "sig60") {
      val tok = Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("toks", expr(toksSpark))
        .select(col("doc_id"), explode_outer(array_distinct(col("toks"))).as("t"))
        .filter(col("t").isNotNull)
        .withColumn("h", expr(hex15("md5(t)")))
      // one-pass SimhashAgg kernel (custom TypedImperativeAggregate): walks
      // the 60 bit counters in a primitive loop per row, replacing the
      // 60-column declarative sum the DuckDB oracle still runs (identical
      // sign rule — SimhashAggSpec pins equality against the declarative
      // form; the 16-bit simhashSig keeps that form as the didactic twin)
      tok.groupBy(col("doc_id"))
        .agg(org.apache.spark.sql.graft.SimhashBridge
          .simhashAgg(col("h"), 60).as("simhash"))
    }

  /** Wide-simhash near-dup pairs: six 10-bit bands (1024 values each) —
    * hamming ≤ 5 ⇒ at most 5 differing bands ⇒ agreement on at least one
    * (pigeonhole). Where the 16-bit version has 64 band buckets and ~3M
    * candidates at sf0.1, the wide bands have 6×1024 buckets and the
    * candidate set collapses to the near-dup pairs themselves — the
    * measured form of "widening the hash divides candidate volume". */
  def ddSimhashWidePairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashWideSig(spark, dir) // memoized + cached table
    val bands = sig.select(col("doc_id"), col("simhash"),
        explode_outer(expr("sequence(0, 5)")).as("band"))
      .filter(col("band").isNotNull)
      .withColumn("bv", expr("(simhash div shiftleft(CAST(1 AS BIGINT), 10 * band)) % 1024"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("bv")).orderBy(col("doc_id"))))
      .filter(col("rn") <= SimhashBucketCap).drop("rn")
    val cand = bands.toDF("ia", "ha", "band", "bv")
      .join(bands.toDF("ib", "hb", "band2", "bv2"),
        col("band") === col("band2") && col("bv") === col("bv2") && col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("ha"), col("hb")).distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= 5)
      .select(col("ia"), col("ib"), col("hamming"))
      .orderBy(col("hamming"), col("ia"), col("ib"))
      .limit(200)
  }

  /** Per-label membership CAP for [[ddEmbedTopk]] — the [[SimhashBucketCap]]
    * treatment applied to the exactness twin's label blocks: with a fixed
    * label vocabulary, per-label membership grows ~N/|labels| and the
    * within-label join quadratically (the hot label owned the runtime at
    * every measured SF: 9.4 s at sf1, 12.1 s at sf2). Labels at or under
    * the cap keep EXACT all-pairs behavior (at sf0.01 the largest label is
    * 59 — the cap never binds); above it, the deterministic lowest-id
    * members represent the label (window row_number, mirrored verbatim in
    * the oracle), bounding per-label pairs at cap²/2 regardless of N.
    * Members past the cap are same-label vectors whose near-dups a
    * production pipeline finds via [[ddEmbedLsh]] — the scale path this
    * twin is the yardstick for. */
  private val EmbedLabelCap = 1024

  /** Embedding near-dup: top-50 most-similar within-label pairs (label is
    * the blocking key; cosine emitted as explicit per-dim arithmetic;
    * per-label membership bounded by [[EmbedLabelCap]]). */
  def ddEmbedTopk(spark: SparkSession, dir: String): DataFrame = {
    val wLbl = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    val e = Tables.embeddings(spark, dir)
      .withColumn("lrk", row_number().over(wLbl))
      .filter(col("lrk") <= EmbedLabelCap)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val a = e.select(col("vec_id").as("ia"), col("label"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("ib"), col("label").as("lb"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("label") === col("lb") && col("ia") < col("ib"))
      .withColumn("cos", dotF(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .select(col("ia"), col("ib"), col("label"), col("cos"))
      .orderBy(col("cos").desc, col("ia"), col("ib"))
      .limit(50)
  }

  /** Embedding near-dup, LSH-BUCKETED (the scale path for [[ddEmbedTopk]]):
    * blocks on (label, hyperplane-LSH bucket) instead of label alone, so a
    * corpus with few/huge labels has no quadratic block — candidate fanout
    * per label drops ~2^AnnPlanes×, and at production scale the bucket count
    * grows with the plane count independent of how labels are distributed.
    * Same deterministic hyperplanes as [[simAnnLsh]]; the label-only query
    * stays as the exactness twin the recall probe measures against. */
  def ddEmbedLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = annBucketTable(spark, dir)
      .withColumn("bucket", col("bucket").cast("long"))
    val a = e.select(col("vec_id").as("ia"), col("label"), col("bucket"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("ib"), col("label").as("lb"), col("bucket").as("bb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("label") === col("lb") && col("bucket") === col("bb") && col("ia") < col("ib"))
      .withColumn("cos", dotF(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .select(col("ia"), col("ib"), col("label"), col("bucket"), col("cos"))
      .orderBy(col("cos").desc, col("ia"), col("ib"))
      .limit(50)
  }

  // ------------------------------------------------------------ similarity

  /** Deterministic query CAP for [[simTopkCosine]] — the [[EmbedLabelCap]]
    * treatment applied to the exact-NN baseline's QUERY side: `vec_id % 50`
    * sampling keeps the query count proportional to N, so the cross join was
    * the last plan in the surface whose cost grew as O(N²/50) — it owned the
    * sf1 top slot at 10.1 s and is unbounded at production scale. Capping at
    * the `SimQueryCap` LOWEST sampled vec_ids (order unique → deterministic,
    * mirrored verbatim in the oracle) bounds the work at N×cap dot products —
    * LINEAR in N — while leaving every sf where the cap doesn't bind
    * (sf0.001/sf0.01: far fewer than 256 sampled ids) bit-identical, so the
    * six ANN twins' recall probes in LlmOpsSpec still measure against the
    * same exact ground truth. */
  private val SimQueryCap = 256

  /** Brute-force cosine top-k: every 50th vector (capped at the
    * [[SimQueryCap]] lowest such ids) queries the full table. The exact
    * baseline an ANN variant is judged against: the bounded query side is
    * BROADCAST, so the scan is one linear pass over the candidates with no
    * shuffle of the big side. */
  def simTopkCosine(spark: SparkSession, dir: String): DataFrame =
    bruteTruthTable(spark, dir).orderBy(col("qid"), col("rk"))

  /** The capped brute-force truth (qid, rk, cid, cos) — MEMOIZED and
    * prewarmed like the index tables: one exact N·SimQueryCap pass per
    * (session, dir) serves the baseline query AND all three recall
    * censuses, each of which previously re-paid the scan (3 × ~21 s of
    * the sf2 bench). Production monitoring materializes its acceptance
    * sample for exactly this reason. Result ≤ 5·SimQueryCap rows. */
  private def bruteTruthTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "topk_cosine") {
      val e = Tables.embeddings(spark, dir)
        .withColumn("nrm", dotF(col("embedding"), col("embedding")))
      val q = e.filter(expr("vec_id % 50 = 0"))
        .orderBy(col("vec_id")).limit(SimQueryCap)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
      broadcast(q).crossJoin(c).filter(col("qid") =!= col("cid"))
        .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
    }

  /** Hyperplane-LSH approximate NN: deterministic hyperplanes → 2^AnnPlanes
    * sign-buckets; queries only scan their own bucket. The scale path —
    * candidate count drops ~2^AnnPlanes× vs brute force, at measured recall
    * cost (see LlmOpsSpec's recall probe). */
  /** The sign-bucket table (vec_id, embedding, nrm, bucket) shared by the
    * three hyperplane-LSH queries, memoized per (session, dir) and
    * prewarmed by [[stateBuilders]] — the LSH index analogue of
    * [[ivfAssignTable]]'s build-once contract. */
  private def annBucketTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "ann_bucket") {
      // carries `label` so the embedding near-dup query (label-blocked)
      // reads the same index table as the three ANN queries
      Tables.embeddings(spark, dir)
        .withColumn("nrm", dotF(col("embedding"), col("embedding")))
        .withColumn("bucket", expr(bucketHof("embedding", annPlanes(spark, dir))))
    }

  def simAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = annBucketTable(spark, dir)
    val q = e.filter(expr("vec_id % 50 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("bucket"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"), col("bucket").as("cb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("bucket") === col("cb") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Multiprobe hyperplane-LSH ANN: each query scans its own sign-bucket
    * PLUS the [[annPlanes]] buckets one bit-flip away — the standard
    * recall-recovery move for hyperplane LSH (a near neighbor that landed
    * across one hyperplane differs in exactly one sign bit). Candidate
    * volume grows (1+planes)x over [[simAnnLsh]] but stays ~2^planes/(1+planes)
    * below brute force; recall roughly triples on the synthetic embeddings
    * (measured in LlmOpsSpec). With data-sized planes the probed volume is
    * ~(1+P)·64 vectors per query — BOUNDED as N grows, P growing only
    * logarithmically. The probe fanout is a generator over a (1+P)-element
    * literal array — no join amplification beyond the bucket lookups. */
  def simAnnMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val pl = annPlanes(spark, dir)
    val e = annBucketTable(spark, dir)
    val probes = (0 until pl).map(p => s"bucket ^ ${1 << p}").mkString(", ")
    val q = e.filter(expr("vec_id % 50 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("bucket"))
      .select(col("qid"), col("qe"), col("qn"),
        explode_outer(expr(s"array(bucket, $probes)")).as("probe"))
      .filter(col("probe").isNotNull)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"), col("bucket").as("cb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("probe") === col("cb") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Hamming-radius-2 mask set over `pl` planes, ordered so that the masks
    * valid for any smaller plane count form a PREFIX (sorted by highest set
    * bit): 1 + pl + pl(pl-1)/2 masks. The oracle slices the same full-
    * [[MaxPlanes]] list to that prefix length, so both engines probe the
    * identical bucket set at every N. */
  private def probe2Masks(pl: Int): Seq[Int] = {
    val all = Seq(0) ++
      (0 until pl).flatMap(b => Seq(1 << b) ++ (0 until b).map(i => (1 << i) | (1 << b)))
    all.sortBy(m => (31 - java.lang.Integer.numberOfLeadingZeros(math.max(m, 1)), m))
  }

  /** Radius-2 multiprobe ANN — the recall-recovery tier above
    * [[simAnnMultiprobe]]: each query probes its own bucket, every 1-bit
    * flip, and every 2-bit flip — 1 + P + P(P-1)/2 buckets of ~64 vectors,
    * still a vanishing fraction of the corpus at scale (P ~ log N, so the
    * candidate count per query stays bounded while brute force grows with
    * N). This is the shipped configuration that clears the recall@5 >= 0.6
    * floor LlmOpsSpec pins (radius-1 measured 0.46 on the spec corpus). */
  def simAnnProbe2(spark: SparkSession, dir: String): DataFrame = {
    val pl = annPlanes(spark, dir)
    val e = annBucketTable(spark, dir)
    val probes = probe2Masks(pl).map(m => s"bucket ^ $m").mkString(", ")
    val q = e.filter(expr("vec_id % 50 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("bucket"))
      .select(col("qid"), col("qe"), col("qn"),
        explode_outer(expr(s"array($probes)")).as("probe"))
      .filter(col("probe").isNotNull)
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"), col("bucket").as("cb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("probe") === col("cb") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
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
  def txtGopher(spark: SparkSession, dir: String): DataFrame = {
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
      .orderBy(col("doc_id"))
  }

  /** Cross-document line-level exact dedup (the C4 boilerplate rule:
    * a line occurring verbatim in more than one document is boilerplate —
    * navbars, license banners, cookie notices). Emits, per doc, the line
    * counts and the fingerprint of the text with boilerplate lines removed.
    * Two shuffles total at any scale: one keyed by line hash (the
    * boilerplate census, map-side combinable), one keyed by doc_id (the
    * rebuild); text lines travel the doc-keyed shuffle once. */
  def ddLines(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), posexplode_outer(split(col("text"), "\n")))
      .withColumn("line", trim(col("col")))
      .filter(col("line").isNotNull && col("line") =!= "")
      .select(col("doc_id"), col("pos").as("idx"), col("line"), md5(col("line")).as("fp"))
    // lines whose hash appears in >1 distinct doc; the distinct-count runs
    // on (fp, doc_id) partial aggregates, never the line text
    val dups = lines.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("fp"), lit(true).as("is_dup"))
    lines.join(dups, Seq("fp"), "left")
      .withColumn("dup", coalesce(col("is_dup"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("dup"), 1)).as("n_dup_lines"),
        // kept lines, re-assembled in document order: collect_list skips
        // the nulls `when` produces for boilerplate lines; the struct sort
        // on (idx, line) restores order regardless of shuffle arrival
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(when(!col("dup"), struct(col("idx"), col("line"))))),
            x => x.getField("line")))).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  /** Duplicate-passage census — the fixed-window approximation of exact
    * substring dedup (the suffix-array method of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better", recast
    * for a distributed engine): every 8-token rolling window is
    * fingerprinted, and windows recurring across documents are surfaced
    * with their document span. One explode + one fingerprint-keyed
    * map-side-combinable aggregation; window text never leaves the map
    * side (only the 16-hex fingerprint shuffles), so shuffle volume is
    * bounded by token count, not text size. Top-100 keeps the driver
    * comparison small; production consumers stream the full census into
    * the cut-list join of a dedup action. */
  def ddPassages(spark: SparkSession, dir: String): DataFrame =
    // PassageHash kernel = the declarative HOF chain (tokenize → per-
    // window md5 prefix), evaluated as one JVM loop per doc — same
    // interpreted-lambda tax the shingle kernel removes (see
    // ShingleHash32's Scaladoc); window semantics pinned by PassageHashSpec
    passageWindows(spark, dir, 8)
      .groupBy(col("w").as("passage_fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_hits"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("n_hits").desc, col("passage_fp"))
      .limit(100)

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
  private val BpeSentinelBase = 0xFDD0
  private def bpeSentinel(r: Int): String = (BpeSentinelBase + r).toChar.toString

  /** The token stream + in-token adjacent-pair census shared by the BPE
    * training queries: pairs never cross token boundaries, every token
    * instance contributes (Sennrich Algorithm 1's count), and the shuffle
    * is bounded by the pair vocabulary (≤ symbols²), never the corpus. */
  private def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)

  private def bpePairCensus(tf: DataFrame, tcol: String): DataFrame = tf
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
    val top1 = bpePairCensus(toks, "t")
      .orderBy(col("n").desc, col("pair")).limit(1)
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
  private val BpeVocabRounds = 4

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
  private def bpeMergeTable(spark: SparkSession, dir: String): DataFrame =
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

  /** Per-document DUPLICATION FRACTION — the doc-level readout of the
    * passage census (the "fraction of duplicated text" measurement of Lee
    * et al. 2021 §4, recast per document): for every doc with >= 8 tokens,
    * the share of its 8-token rolling windows that also occur verbatim in
    * at least one OTHER document. The standard triage metric between
    * exact dedup (whole-doc) and the cut-list action: rank docs by
    * dup_frac, drop or rewrite the worst. Same scale shape as [[ddLines]]:
    * one fingerprint-keyed census aggregation + one doc-keyed rebuild,
    * both map-side combinable, and only 16-hex fingerprints ever shuffle. */
  def ddDupFraction(spark: SparkSession, dir: String): DataFrame = {
    val w = passageWindows(spark, dir, 8)
    // windows seen in more than one distinct doc; the distinct-count runs
    // on (w, doc_id) partial aggregates
    val dup = w.groupBy(col("w"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("w"), lit(true).as("is_dup"))
    w.join(dup, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        count(when(col("is_dup"), 1)).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows") / col("n_windows")).as("dup_frac"))
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

  /** PAIR ALIGNMENT — longest shared verbatim passage per near-duplicate
    * pair: for every Jaccard >= 0.8 pair (the dedup action's edge set), the
    * maximum run of CONSECUTIVE shared 8-token windows, i.e. the length of
    * the longest common verbatim span — the measurement behind
    * substring-cut decisions (drop the doc vs cut the shared span, Lee et
    * al. 2021's exact-substring action). Classic diagonal run-length
    * analysis: a match at corpus positions (pa, pb) lies on diagonal
    * pa-pb; consecutive pa values on one diagonal form a run
    * (pa - row_number is constant), and max run + 7 converts windows back
    * to tokens. Scale shape: the pair set is blocking-bounded (never
    * doc²), the positioned-window table joins it broadcast-style, and the
    * run window partitions by (pair, diagonal) — no global sort
    * anywhere. */
  def ddAlign(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), posexplode_outer(
        org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.graft.PassageHash(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("text")), 8))))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), col("pos"), col("col").as("w"))
    val pairs = jaccardPairs(spark, dir)
      .filter(col("jaccard") >= 0.8)
      .select(col("ia"), col("ib"))
    val wa = w.toDF("ia", "pa", "wa")
    val wb = w.toDF("ib", "pb", "wb")
    val matches = pairs.join(wa, Seq("ia")).join(wb,
      wb("ib") === pairs("ib") && col("wa") === col("wb"))
      .select(pairs("ia"), pairs("ib"), col("pa"), col("pb"))
    val runW = Window.partitionBy(col("ia"), col("ib"), col("diag")).orderBy(col("pa"))
    matches
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("rn", row_number().over(runW))
      .groupBy(col("ia"), col("ib"), col("diag"), (col("pa") - col("rn")).as("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("ia"), col("ib"))
      .agg(max(col("run_len")).as("max_run_windows"))
      .select(col("ia"), col("ib"), col("max_run_windows"),
        (col("max_run_windows") + 7).as("max_run_tokens"))
      .orderBy(col("ia"), col("ib"))
  }

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

  /** Per-doc rolling n-token window fingerprints (PassageHash kernel),
    * one row per window occurrence — the shared explode under the passage
    * census, both decontamination variants and both duplication-fraction
    * metrics. Memoized per (session, dir, n) and cached (same reasoning as the
    * jaccard-pairs memo: five consumers would otherwise each re-scan the
    * text and re-run the kernel, and the contamination queries use the
    * table TWICE in one plan). The cached table is (doc_id, 16-hex)
    * pairs — bounded by token count, small at any SF; materialized
    * eagerly so parallel stages of one consuming job can't race past the
    * unpopulated cache and double-build (the minhash-signature lesson).
    * Released with everything else by [[releaseCaches]]. */
  private def passageWindows(spark: SparkSession, dir: String, n: Int): DataFrame =
    memoSig(spark, dir, s"passages_n$n") {
      Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode_outer(
          org.apache.spark.sql.graft.ColumnBridge.column(
            org.apache.spark.sql.graft.PassageHash(
              org.apache.spark.sql.graft.ColumnBridge.expression(col("text")), n))).as("w"))
        .filter(col("w").isNotNull)
    }

  /** Benchmark DECONTAMINATION — the test-set-overlap check every serious
    * training run performs (distinct from dedup: the reference set is
    * held-out eval data, and ANY shared passage taints the doc): docs
    * whose id ≡ 0 mod 97 stand in for the benchmark suite; every corpus
    * doc sharing at least one n-token window with any benchmark doc is
    * flagged with its overlap count. The window width is a parameter; the
    * DEFAULT matches the cross-engine-verified registry entry (n=4: the
    * synthetic word-soup corpus has no verbatim 8-gram reuse ACROSS
    * distinct docs, and a 4-gram window keeps the DuckDB check non-vacuous
    * — 8/8/727 flagged docs at sf0.001/0.01/0.1 — while exercising the
    * identical plan; the default-parameter path is therefore never
    * oracle-unverified). Callers opt into any width; [[ddContamination8]]
    * is the production-width (8-token) variant whose overlap is real by
    * construction and which carries its own oracle.
    * Only 16-hex fingerprints join, and the benchmark side is tiny by
    * construction (eval suites are), so at scale this is a broadcast
    * semi-join against the fact scan — the corpus text never shuffles. */
  def ddContamination(spark: SparkSession, dir: String, n: Int = 4): DataFrame = {
    val w = passageWindows(spark, dir, n)
    val bench = w.filter(expr("doc_id % 97 = 0"))
      .select(col("w").as("bw")).distinct()
    w.filter(expr("doc_id % 97 != 0"))
      .join(broadcast(bench), col("w") === col("bw"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("w")).as("n_shared_windows"))
      .orderBy(col("doc_id"))
  }

  /** PRODUCTION-WIDTH (8-token) decontamination with an overlap that is
    * real by construction: the benchmark suite is built from genuine
    * 20-token excerpts (token positions 5..24) of the docs with
    * doc_id ≡ 7 mod 89 — the way real eval sets end up contaminated, by
    * containing verbatim passages that also live in the crawl. Every
    * corpus doc sharing at least one 8-token window with any excerpt is
    * flagged (the excerpt sources themselves flag by construction, ≥ 1
    * per 89 docs at every SF, so the cross-engine check can't go
    * vacuous). Same scale shape as [[ddContamination]]: the excerpt side
    * is tiny and broadcast, only 16-hex fingerprints join, the corpus
    * text never shuffles. */
  def ddContamination8(spark: SparkSession, dir: String): DataFrame = {
    val bench = Tables.documents(spark, dir)
      .filter(expr("doc_id % 89 = 7"))
      .withColumn("toks", expr(toksSpark))
      .withColumn("excerpt", expr("array_join(slice(toks, 5, 20), ' ')"))
      .select(explode_outer(
        org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.graft.PassageHash(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("excerpt")), 8))).as("bw"))
      .filter(col("bw").isNotNull)
      .distinct()
    passageWindows(spark, dir, 8)
      .join(broadcast(bench), col("w") === col("bw"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("w")).as("n_shared_windows"))
      .orderBy(col("doc_id"))
  }

  /** BENCHMARK-side contamination census — [[ddContamination8]] reports
    * which CORPUS docs share passages with the benchmark; the number a
    * model card reports is the inverse: per benchmark ITEM, is it leaked
    * into the training corpus, and what fraction of the suite is
    * contaminated overall. Same 8-token passage fingerprints, same
    * excerpt construction (20-token excerpts of docs ≡ 7 mod 89), same
    * broadcast semi-join direction — the tiny benchmark side broadcasts
    * onto the one corpus window table; only the final fold points the
    * other way (groupBy bench item instead of corpus doc). An item is
    * LEAKED when a corpus doc OTHER than its own excerpt source shares a
    * window (the source doc matches trivially — that is provenance, not
    * contamination). Output: one row per benchmark item (items whose
    * excerpt is too short for any 8-token window stay present with
    * n_windows = 0), plus a TOTAL row keyed bench_id = -1 carrying the
    * model-card number — contaminated_frac = leaked items / items, one
    * int/int IEEE division. Constant-size output (the benchmark is). */
  def ddContaminationRate(spark: SparkSession, dir: String): DataFrame = {
    val bw = Tables.documents(spark, dir)
      .filter(expr("doc_id % 89 = 7"))
      .withColumn("toks", expr(toksSpark))
      .withColumn("excerpt", expr("array_join(slice(toks, 5, 20), ' ')"))
      .select(col("doc_id").as("bench_id"), explode_outer(
        org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.graft.PassageHash(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("excerpt")), 8))).as("bw"))
      .filter(col("bw").isNotNull)
      .distinct()
    val ext = passageWindows(spark, dir, 8)
      .join(broadcast(bw), col("w") === col("bw"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("bw")).as("n_ext_windows"),
        countDistinct(col("doc_id")).as("n_ext_docs"))
      .withColumnRenamed("bench_id", "eb")
    val wcount = bw.groupBy(col("bench_id"))
      .agg(countDistinct(col("bw")).as("nw"))
      .withColumnRenamed("bench_id", "wb")
    val perItem = Tables.documents(spark, dir)
      .filter(expr("doc_id % 89 = 7")).select(col("doc_id").as("bench_id"))
      .join(wcount, col("bench_id") === col("wb"), "left")
      .join(ext, col("bench_id") === col("eb"), "left")
      .select(col("bench_id"),
        coalesce(col("nw"), lit(0L)).as("n_windows"),
        coalesce(col("n_ext_windows"), lit(0L)).as("n_ext_windows"),
        coalesce(col("n_ext_docs"), lit(0L)).as("n_ext_docs"))
      .withColumn("leaked", col("n_ext_windows") > 0)
    val total = perItem.agg(
        count(lit(1)).as("n_items"),
        sum(col("n_windows")).as("tw"),
        sum(col("n_ext_windows")).as("tew"),
        sum(col("n_ext_docs")).as("ted"),
        count(when(col("leaked"), 1)).as("n_leaked"))
      .select(lit(-1L).as("bench_id"), col("tw").as("n_windows"),
        col("tew").as("n_ext_windows"), col("ted").as("n_ext_docs"),
        (col("n_leaked") > 0).as("leaked"),
        (col("n_leaked") / col("n_items")).as("contaminated_frac"))
    perItem.withColumn("contaminated_frac", lit(null).cast("double"))
      .unionByName(total)
      .orderBy(col("bench_id"))
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
  private def exactKeepFlag: Column =
    col("doc_id") === min(col("doc_id")).over(Window.partitionBy(md5(col("text"))))

  def txtCleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val passes = txtGopher(spark, dir).filter(col("passes")).select(col("doc_id"))
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
    val passes = txtGopher(spark, dir).filter(col("passes"))
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
  def txtMixture(spark: SparkSession, dir: String): DataFrame = {
    // weight by source parity: even-numbered sources keep 75%, odd 25% —
    // a stand-in for a real mixture table (which would broadcast-join here)
    val draw = s"${hex4("md5(CAST(doc_id AS STRING) || ':' || source)")} / CAST(65536 AS DOUBLE)"
    // explicit DOUBLE: bare 0.75 parses as DECIMAL in both engines, with
    // different comparison/hash behavior. TRY_CAST (both engines): a source
    // not shaped 'srcN' yields NULL → NULL%2=0 is NULL → ELSE branch, instead
    // of Spark-NULL-vs-DuckDB-error divergence a plain CAST would hide.
    val rate = "CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0 " +
      "THEN CAST(0.75 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END"
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
  private[graft] val DataBudgetEpochs = 2L

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
      .withColumn("weight", expr(
        "CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0 " +
          "THEN CAST(3 AS BIGINT) ELSE CAST(1 AS BIGINT) END"))
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

  /** Cross-modal enrichment join: text rows ⋈ their embedding vectors
    * (doc_id = vec_id), emitting text metadata plus the vector norm via the
    * codegen'd dot product. The standard shape for joining a text corpus to
    * a separately-produced embedding table before similarity work. */
  def mmJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .join(Tables.embeddings(spark, dir), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
        dotF(col("embedding"), col("embedding")).as("nrm"))
      .orderBy(col("doc_id"))

  /** IVF-flat approximate NN (the second ANN family next to the hyperplane
    * LSH): a deterministic coarse quantizer — the [[ivfK]] vectors with
    * vec_id < k act as cell centroids — assigns every vector to its
    * max-cosine cell (broadcast k-row cross join + one window), and each
    * query scans only its own cell (nprobe=1). k = max(16, sqrt(N/2)) is
    * the flat-quantizer cost optimum (see [[annPlanes]]' Scaladoc): total
    * work O(N^1.5) instead of the fixed-16-cell O(N²/16). At production
    * scale the centroid set comes from a sampled k-means and lives in a
    * broadcast exactly like this one; the per-cell scan shape is
    * unchanged. */
  def simIvf(spark: SparkSession, dir: String): DataFrame = {
    val (q, c) = ivfAssigned(spark, dir)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.filter(col("ark") === 1).drop("ark")
      .join(c, col("cell") === col("ccell") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** IVF SERVE path — queries the index has NEVER seen. Every other sim
    * query draws its query set from index members; production serves
    * arbitrary incoming vectors against an already-built index. Corpus =
    * vectors with vec_id % 4 != 3; its centroids are the k lowest-id
    * CORPUS vectors (the index knows nothing of the held-out quarter);
    * the corpus-side assignment is memoized index state
    * ([[ivfServeAssignTable]]). An incoming (held-out, % 200 = 3) vector
    * is quantized against the broadcast centroid table at query time —
    * the serve-path cost is k dots + one cell scan, independent of any
    * index rebuild — and ranked exactly within its cell. This is also
    * the INSERT path of an incremental IVF index: assign-to-existing-
    * cells is precisely how new vectors join (the index absorbs inserts
    * until cell occupancy drifts and a periodic re-train rebalances —
    * the re-train being [[simIvfKmeans]]'s Lloyd round). */
  def simIvfServe(spark: SparkSession, dir: String): DataFrame =
    serveTop5Over(spark, dir,
      ivfServeAssignTable(spark, dir)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("nrm").as("cn"), col("cell").as("ccell")))

  /** The serve READ kernel, shared by [[simIvfServe]] and the lifecycle
    * spec's read-back checks: rank each held-out (% 200 = 3) query's top-5
    * within its cell over an arbitrary candidate table (cid, ce, cn,
    * ccell) — which lets the spec serve over a tombstone-anti-joined or
    * post-compaction index and assert equality. */
  private[graft] def serveTop5Over(spark: SparkSession, dir: String, c: DataFrame): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val cents = serveCentroids(spark, dir)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
    val q = e.filter(expr("vec_id % 200 = 3"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("cent_id").as("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("cell") === col("ccell"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The k lowest-id corpus vectors as serve-index centroids —
    * deterministic (TakeOrdered, no global sort materialized). */
  private def serveCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(expr("vec_id % 4 <> 3"))
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
      .orderBy(col("vec_id")).limit(ivfK(spark, dir))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"), col("nrm").as("cnrm"))

  /** Corpus-side assignment of the serve index (vec_id, embedding, nrm,
    * label, cell), memoized + prewarmed like [[ivfAssignTable]]. Carries
    * the `label` metadata column alongside the vector — exactly what a
    * deployed index stores per member to serve FILTERED queries
    * ([[simIvfFiltered]]) without a second metadata lookup. private[graft]
    * so the lifecycle spec can drive read-back over it. */
  private[graft] def ivfServeAssignTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "ivf_serve_assign") {
      val e = Tables.embeddings(spark, dir)
        .filter(expr("vec_id % 4 <> 3"))
        .withColumn("nrm", dotF(col("embedding"), col("embedding")))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
      e.crossJoin(broadcast(serveCentroids(spark, dir)))
        .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
        .withColumn("ark", row_number().over(wAssign))
        .filter(col("ark") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("label"), col("cent_id").as("cell"))
    }

  /** Shared IVF assignment: queries carry their rank-1 AND rank-2 cells
    * (`ark`), candidates their rank-1 cell — [[simIvf]] keeps ark=1,
    * [[simIvfNprobe2]] both.
    *
    * The assignment TABLE is memoized per (session, dir) and prewarmed by
    * [[stateBuilders]] — a production IVF index is BUILT once and queried
    * many times, and four queries here ([[simIvf]], [[simIvfNprobe2]],
    * [[simIvfPq]], [[simIvfPqRerank]]) share it; without the memo each
    * re-ran the N × k centroid cross join + argmin window. The cached
    * table is (vec_id, embedding, nrm, cell, ark≤2) — exactly what a
    * deployed index stores per vector (cell id + the vector + its norm). */
  private def ivfAssignTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "ivf_assign") {
      val k = ivfK(spark, dir)
      val e = Tables.embeddings(spark, dir)
        .withColumn("nrm", dotF(col("embedding"), col("embedding")))
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"), col("nrm").as("cnrm"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
      e.crossJoin(broadcast(cents))
        .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
        .withColumn("ark", row_number().over(wAssign))
        .filter(col("ark") <= 2)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"), col("ark"))
    }

  private def ivfAssigned(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val assigned = ivfAssignTable(spark, dir)
    val q = assigned.filter(expr("vec_id % 50 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("cell"), col("ark"))
    val c = assigned.filter(col("ark") === 1)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"), col("cell").as("ccell"))
    (q, c)
  }

  /** IVF with nprobe=2 — each query scans its TWO nearest cells (candidates
    * still live in exactly one cell, so no pair is produced twice). The
    * standard IVF recall knob: candidate volume doubles over [[simIvf]]
    * while staying ~k/2 below brute force. */
  def simIvfNprobe2(spark: SparkSession, dir: String): DataFrame = {
    val (q, c) = ivfAssigned(spark, dir)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.drop("ark")
      .join(c, col("cell") === col("ccell") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** ANN recall census — the acceptance metric every approximate index
    * ships with, promoted from a spec-only probe (LlmOpsSpec's recall
    * checks) to the oracle-checked surface, the [[ingestQuarantine]]
    * precedent applied to index quality: per-query recall@5 of the IVF
    * index at nprobe=1 ([[simIvf]]) and nprobe=2 ([[simIvfNprobe2]])
    * against the exact brute-force top-5 ([[simTopkCosine]]) on the
    * capped query sample. Composes the three oracle-checked queries
    * verbatim — the recall readout cannot drift from what the index
    * actually serves — and emits the recall-vs-nprobe curve a deployment
    * tunes its probe width with. `hits_*` are exact BIGINT overlap
    * counts; `recall_*` is the single int/int IEEE division.
    *
    * Scale shape: truth is the SimQueryCap-bounded broadcast brute-force
    * pass — the one irreducible exact pass ANY recall measurement pays,
    * linear in N with a hard-capped broadcast side (production recall
    * monitoring samples its query set for exactly this reason). Both IVF
    * sides read the memoized assignment table; each is LEFT-SEMI-pruned
    * to the capped sample against a broadcast 256-row qid list BEFORE
    * the overlap joins, so the frames being overlap-joined carry ≤
    * 5·SimQueryCap rows a side and broadcast. One map-side-combinable
    * count pair per qid closes it — constant output size at any N. */
  def simIvfRecall(spark: SparkSession, dir: String): DataFrame =
    recallCensusOver(spark, dir,
      Seq("np1" -> simIvf(spark, dir), "np2" -> simIvfNprobe2(spark, dir)))

  /** [[simIvfRecall]]'s LSH-family sibling: recall@5 of the hyperplane
    * index at probing radius 0 ([[simAnnLsh]], home bucket only), radius 1
    * ([[simAnnMultiprobe]], home + 1-bit flips), and radius 2
    * ([[simAnnProbe2]]) against the same brute-force truth — the
    * recall-vs-probe-radius curve, the LSH analogue of the IVF nprobe
    * knob. Same kernel, same scale shape, same cannot-drift composition
    * of the three oracle-checked queries. */
  def simAnnRecall(spark: SparkSession, dir: String): DataFrame =
    recallCensusOver(spark, dir,
      Seq("r0" -> simAnnLsh(spark, dir), "r1" -> simAnnMultiprobe(spark, dir),
        "r2" -> simAnnProbe2(spark, dir)))

  /** The recall census extended to the COMPRESSED serving family: recall@5
    * of the IVF-PQ ADC scan at the 16-code yardstick width ([[simIvfPq]])
    * and the production 8-bit width ([[simIvfPq256]]) against the same
    * brute-force truth — the recall-vs-code-width curve that prices PQ's
    * memory saving in accuracy. Both sides share [[simIvf]]'s coarse
    * cells, so the census isolates QUANTIZATION loss: any gap below the
    * flat index's nprobe=1 recall ([[simIvfRecall]]) is what the 16× /
    * 128× compression costs, per query. Same kernel, same scale shape,
    * same cannot-drift composition of two oracle-checked queries. */
  def simPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallCensusOver(spark, dir,
      Seq("pq16" -> simIvfPq(spark, dir), "pq256" -> simIvfPq256(spark, dir)))

  /** Shared recall-census kernel of [[simIvfRecall]] / [[simAnnRecall]]:
    * per capped-sample query, the overlap of each approximate side's
    * (qid, cid) top-5 with the brute-force truth, as `hits_<sfx>` BIGINT
    * counts and `recall_<sfx>` int/int divisions. Each side is
    * LEFT-SEMI-pruned to the capped sample against a broadcast 256-row
    * qid list BEFORE the overlap joins (the raw sides cover every 50th
    * vector — N/10 rows at scale), so the joined frames stay ≤
    * 5·SimQueryCap rows and broadcast. The qid list is recomputed
    * directly (a limit-256 scan) rather than distinct-ing truth. Truth
    * itself is the memoized [[bruteTruthTable]] — all three censuses and
    * the baseline query share ONE exact pass per (session, dir). */
  private def recallCensusOver(spark: SparkSession, dir: String,
      sides: Seq[(String, DataFrame)]): DataFrame = {
    val qids = Tables.embeddings(spark, dir)
      .filter(expr("vec_id % 50 = 0"))
      .orderBy(col("vec_id")).limit(SimQueryCap)
      .select(col("vec_id"))
    val truth = simTopkCosine(spark, dir).select(col("qid"), col("cid"))
    val joined = sides.foldLeft(truth) { case (acc, (sfx, df)) =>
      val pruned = df.select(col("qid").as(s"q_$sfx"), col("cid").as(s"c_$sfx"))
        .join(broadcast(qids), col(s"q_$sfx") === col("vec_id"), "left_semi")
      acc.join(broadcast(pruned),
        col("qid") === col(s"q_$sfx") && col("cid") === col(s"c_$sfx"), "left")
    }
    val hits = sides.map { case (sfx, _) => count(col(s"c_$sfx")).as(s"hits_$sfx") }
    sides.foldLeft(joined.groupBy(col("qid")).agg(hits.head, hits.tail: _*)) {
      case (acc, (sfx, _)) => acc.withColumn(s"recall_$sfx", col(s"hits_$sfx") / lit(5))
    }
      .select(col("qid") +: sides.flatMap { case (sfx, _) =>
        Seq(col(s"hits_$sfx"), col(s"recall_$sfx")) }: _*)
      .orderBy(col("qid"))
  }

  /** TWO-LEVEL (hierarchical) IVF — the production shape past ~10M
    * vectors, where a flat quantizer's own N·k assignment re-quadratizes
    * (see [[ivfK]]'s Scaladoc): level 1 assigns every vector to one of
    * [[ivf2K]] coarse cells (first-k centroids, broadcast); level 2
    * re-quantizes WITHIN each cell against the cell's k lowest-id members
    * as sub-centroids. ~N^(2/3) leaf cells of ~N^(1/3) members each make
    * both assignment and within-leaf pair work O(N^(4/3)) — strictly below
    * the flat optimum's O(N^1.5). A query scans only its leaf (nprobe=1
    * per level; the recall knob is the same cell-expansion as
    * [[simIvfNprobe2]], composable per level). The sub-centroid table is
    * ~N^(2/3) rows; it broadcasts comfortably at any N a single flat
    * quantizer could also serve, and at extreme N the level-2 join is
    * already keyed on `cell`, so production shards it cell-partitioned
    * co-located with the members instead of broadcasting. */
  def simIvf2(spark: SparkSession, dir: String): DataFrame = {
    val a = ivf2AssignTable(spark, dir)
    val q = a.filter(expr("vec_id % 50 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"),
        col("cell"), col("subcell"))
    val c = a.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"),
      col("cell").as("ccell"), col("subcell").as("csub"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("cell") === col("ccell") && col("subcell") === col("csub") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The two-level assignment table behind [[simIvf2]] — (vec_id,
    * embedding, nrm, cell, subcell) — memoized + prewarmed like its flat
    * siblings (built once, queried many times). */
  private def ivf2AssignTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "ivf2_assign") {
      val k = ivf2K(spark, dir)
      val e = Tables.embeddings(spark, dir)
        .withColumn("nrm", dotF(col("embedding"), col("embedding")))
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"), col("nrm").as("cnrm"))
      val w1 = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
      val l1 = e.crossJoin(broadcast(cents))
        .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
        .withColumn("ark", row_number().over(w1))
        .filter(col("ark") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"))
      val wSub = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
      val subcents = l1.withColumn("srk", row_number().over(wSub))
        .filter(col("srk") <= k)
        .select(col("cell").as("scell"), col("vec_id").as("sub_id"),
          col("embedding").as("semb"), col("nrm").as("ssnrm"))
      val w2 = Window.partitionBy(col("vec_id")).orderBy(col("cos_s").desc, col("sub_id"))
      l1.join(broadcast(subcents), col("cell") === col("scell"))
        .withColumn("cos_s", dotF(col("embedding"), col("semb")) / sqrt(col("nrm") * col("ssnrm")))
        .withColumn("ark", row_number().over(w2))
        .filter(col("ark") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"), col("sub_id").as("subcell"))
    }

  /** Component quantization scale for the k-means Lloyd sums: 2^20 keeps a
    * unit-norm float component's information (float ulp at |x|<=1 is 2^-24;
    * the quantization error 2^-21 is far below any cosine tie that matters)
    * while a cell's component SUM stays orders of magnitude inside BIGINT. */
  private val KmQuant = 1L << 20

  /** IVF over a K-MEANS-REFINED coarse quantizer — up to [[KmRounds]]
    * deterministic, SAMPLED Lloyd rounds on top of [[simIvf]]'s first-k
    * init, with an integer-exact fixed-point early stop (production
    * trains IVF quantizers exactly this way: sample → a few Lloyd rounds
    * to near-convergence → broadcast the centroid table). The refinement
    * is CROSS-ENGINE EXACT,
    * which a float mean could never be (a per-cell avg() of doubles is
    * partition-order-dependent — the dsum lesson): each sampled member's
    * components are quantized to BIGINT (round(x * [[KmQuant]])), summed
    * per cell — integer sums are exact under any partitioning — and the
    * UN-normalized sum vector IS the refined centroid, because cosine only
    * needs the direction: Lloyd's divide-by-count cancels and is never
    * computed. Full-corpus assignment against the refined centroids runs
    * through the codegen'd [[org.apache.spark.sql.graft.DotProductFL]]
    * (float row × BIGINT centroid); the ranking divides by
    * sqrt(nrm * snrm) where snrm is the left-folded double self-dot of the
    * sum vector — every post-sum step is fixed-order per-row arithmetic,
    * so the DuckDB oracle (same unrolled left-associated chains) hashes
    * identically. The POINT is cell balance: the first-k init inherits the
    * id order's density; one Lloyd round moves centroids onto actual mass,
    * evening occupancy and with it both recall and the per-cell pair cost
    * that governs scale (LlmOpsSpec pins recall parity with [[simIvf]]). */
  def simIvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    val assigned = ivfKmeansAssignTable(spark, dir)
    val q = assigned.filter(expr("vec_id % 50 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"), col("cell"))
    val c = assigned
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"), col("cell").as("ccell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("cell") === col("ccell") && col("qid") =!= col("cid"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Quantizer-BALANCE census — the Lloyd refinement's actual claim
    * ([[simIvfKmeans]]' Scaladoc: balance, not recall) promoted from a
    * spec observation to the oracle-checked surface: per quantizer
    * (first-k init vs k-means-refined), one row per distinct cell
    * occupancy with the number of cells at that occupancy. This is the
    * histogram an index operator watches for hot cells — in IVF a hot
    * cell IS a hot scan (query cost = probed cells' member count), and
    * occupancy skew is also exactly what [[simIvfRetrain]]'s drift
    * signal summarizes to one number. Reads both MEMOIZED assignment
    * tables (embedding column pruned at the scan) as k-row
    * map-side-combinable aggregates; output ≤ k rows per quantizer at
    * any N. */
  def simIvfBalance(spark: SparkSession, dir: String): DataFrame = {
    def hist(assign: DataFrame, name: String): DataFrame =
      assign.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
        .groupBy(col("occ")).agg(count(lit(1)).as("n_cells"))
        .select(lit(name).as("quantizer"), col("occ"), col("n_cells"))
    hist(ivfAssignTable(spark, dir).filter(col("ark") === 1), "first_k")
      .unionAll(hist(ivfKmeansAssignTable(spark, dir), "kmeans"))
      .orderBy(col("quantizer"), col("occ"))
  }

  /** How many sampled Lloyd rounds [[simIvfKmeans]]'s quantizer trains for
    * — the production recipe is "a few rounds to near-convergence", not
    * one. The Spark builder stops EARLY at the exact fixed point (zero
    * sampled members changed cell — an integer-exact movement test both
    * engines would agree on), which is result-identical to running all
    * [[KmRounds]]: deterministic Lloyd is a fixed-point map (same
    * membership ⇒ same integer sums ⇒ same centroids ⇒ same next
    * assignment), so the static DuckDB oracle simply unrolls all rounds
    * and lands on the same final centroids whether or not the builder
    * short-circuited. */
  private val KmRounds = 3

  /** One sampled-member assignment against integer Lloyd-sum centroids
    * (cell, svec, snrm): (vec_id, embedding, cell). */
  private def kmAssignSampled(e: DataFrame, cents: DataFrame): DataFrame = {
    val wRef = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cell"))
    e.filter(expr("vec_id % 5 = 0")).crossJoin(broadcast(cents))
      .withColumn("cos_c", dotFL(col("embedding"), col("svec")) / sqrt(col("nrm") * col("snrm")))
      .withColumn("ark", row_number().over(wRef))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** Integer Lloyd update: per-cell quantized component sums over the
    * members — the un-normalized sum vector IS the centroid (see
    * [[simIvfKmeans]]). (cell, svec, snrm). */
  private def kmCentroids(members: DataFrame): DataFrame =
    members
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(expr(s"CAST(round(CAST(x AS DOUBLE) * $KmQuant) AS BIGINT)")).as("s"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), p -> p.s)").as("svec"))
      .withColumn("snrm", expr(
        "aggregate(svec, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))

  /** The k-means assignment at a given round count — the unmemoized
    * builder behind [[ivfKmeansAssignTable]], exposed (package-private)
    * so the spec can compare the multi-round quantizer against the
    * one-round variant. Columns (vec_id, embedding, nrm, cell). */
  private[graft] def ivfKmeansAssignment(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    val k = ivfK(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val cents0 = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"), col("nrm").as("cnrm"))
    // round 0: sampled members (every 5th vector) against the first-k init.
    // Each round's sampled assignment is CACHED (and tracked for
    // releaseCaches): the movement test is an action, and without the
    // cache every round's count — and the final full assignment — would
    // re-execute the whole chain of prior N x k cross-join/argmin rounds
    // from scratch (O(rounds²) full passes inside a TIMED state build).
    val wInit = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
    var members = track(e.filter(expr("vec_id % 5 = 0")).crossJoin(broadcast(cents0))
      .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
      .withColumn("ark", row_number().over(wInit))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
      .cache())
    var cents = kmCentroids(members)
    var r = 1
    var converged = false
    while (r < rounds && !converged) {
      val next = track(kmAssignSampled(e, cents).cache())
      // integer-exact movement test: at the fixed point every remaining
      // round is the identity, so stopping here is result-identical to
      // running all rounds (what the oracle does)
      val moved = next.select(col("vec_id"), col("cell").as("ncell"))
        .join(members.select(col("vec_id"), col("cell")), "vec_id")
        .filter(col("ncell") =!= col("cell")).count()
      members = next
      cents = kmCentroids(members)
      converged = moved == 0
      r += 1
    }
    val wRef = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cell"))
    e.crossJoin(broadcast(cents))
      .withColumn("cos_c", dotFL(col("embedding"), col("svec")) / sqrt(col("nrm") * col("snrm")))
      .withColumn("ark", row_number().over(wRef))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
  }

  /** The k-means-refined assignment table behind [[simIvfKmeans]],
    * memoized per (session, dir) and prewarmed by [[stateBuilders]] (same
    * index-built-once reasoning as [[ivfAssignTable]]; kept separate
    * because the refined centroids produce a different cell partition).
    * Columns (vec_id, embedding, nrm, cell). */
  private def ivfKmeansAssignTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "ivf_kmeans_assign") {
      ivfKmeansAssignment(spark, dir, KmRounds)
    }

  /** Product-quantization geometry: 64 dims = [[PqM]] subspaces ×
    * [[PqSub]] dims, [[PqCodes]] codes per subspace. Unlike the coarse
    * quantizers these are PRECISION knobs, not occupancy caps — the PQ
    * index costs PqM code bytes per vector and one 128-entry lookup table
    * per (query, subspace) REGARDLESS of N, so there is no capacity to
    * data-size and no latent scale cliff (production uses 8-bit codes,
    * i.e. PqCodes=256; 16 keeps the oracle's per-subspace argmin scan
    * small). */
  private val PqM = 8
  private val PqSub = 8
  private val PqCodes = 16

  /** PRODUCTION code width: 8-bit codes, 256 entries per subspace — the
    * width every deployed PQ index uses (Jégou et al. 2011 run k*=256
    * throughout; one code byte per subspace). The 16-code path stays as
    * the compact yardstick whose oracle argmin scan is tiny; this one is
    * the shape you'd ship: same 8×8 geometry, 16× finer per-subspace
    * quantization, still PqM bytes per vector. Training stays first-k
    * sampled selection (no Lloyd) so the DuckDB oracle can replay the
    * EXACT argmin per (vector, subspace) — N×256 distance rows per
    * subspace at sf0.01, well inside oracle budget. */
  private val PqCodesProd = 256

  /** `transform(sequence(0, 7), s -> slice(v, s*8+1, 8))` — a 64-dim float
    * array as its [[PqM]] ordered subvectors (Spark SQL text; `slice` is
    * 1-based). */
  private def pqSplit(v: String): String =
    s"transform(sequence(0, ${PqM - 1}), s -> slice($v, s * $PqSub + 1, $PqSub))"

  /** IVF-PQ with asymmetric-distance (ADC) scan — the canonical web-scale
    * ANN layout (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011): the coarse IVF quantizer ([[ivfAssigned]],
    * data-sized k) bounds WHICH vectors a query scans; PQ bounds WHAT the
    * scan reads — each candidate is 8 code bytes + a stored norm instead
    * of 256 bytes of floats, and each pair costs 8 table lookups instead
    * of a 64-dim dot. At 100 TB that is the difference between scanning
    * the embedding column and scanning a ~16 B/vector index that fits in
    * memory: the full-precision vectors are never read after encode time.
    *
    * Cross-engine determinism, step by step: the codebook is the first
    * [[PqCodes]] vectors' subvectors (same first-k convention as
    * [[simIvf]]); encode picks argmin_code of `cent·cent - 2·sub·cent`
    * (the rank-equivalent of L2 distance — the candidate's own `sub·sub`
    * term is code-independent and dropped), tie-broken by code id, via a
    * map-side-combinable `min(struct(d, code))` — no window, no shuffle of
    * the N×128 distance rows (the oracle's row_number() formulation picks
    * the identical argmin). The query-side ADC table is the 128 partials
    * `q_s · cent(s,c)` ordered (s, code); the pair score is 8 literal
    * array lookups summed left-to-right, normalized by the STORED exact
    * norms (`adc / sqrt(qn·cn)` — the norm-corrected cosine form of PQ
    * inner-product search; norms ride along with the codes exactly as in
    * a production IVF-PQ index). Every chain is fixed-order double
    * arithmetic, so DuckDB hashes identically. */
  def simIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_adc").desc, col("cid"))
    ivfPqAdcPairs(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_adc"))
      .orderBy(col("qid"), col("rk"))
  }

  /** [[simIvfPq]] at PRODUCTION code width ([[PqCodesProd]] = 256, i.e.
    * 8-bit codes): identical coarse cells and ADC scan, 16× finer
    * per-subspace quantization at the same PqM bytes per vector — the
    * width a deployed index ships. Per-pair cost is unchanged (still PqM
    * table lookups); only the per-query ADC table grows (PqM·256
    * partials). LlmOpsSpec pins its recall at-or-above the 16-code
    * yardstick's. */
  def simIvfPq256(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_adc").desc, col("cid"))
    ivfPqAdcPairsWith(spark, dir, pqCodebook(spark, dir, PqCodesProd),
        pqCodesTable256(spark, dir), PqCodesProd)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_adc"))
      .orderBy(col("qid"), col("rk"))
  }

  /** PQ codebook: (s, code, cent[8], cc = cent·cent) — the first `nCodes`
    * vectors' subvectors (PqM·nCodes rows). Cheap to derive, rebuilt
    * inline by both consumers; broadcast-sized at either width (128 rows
    * at the 16-code yardstick, 2048 at [[PqCodesProd]]). */
  private def pqCodebook(spark: SparkSession, dir: String,
                         nCodes: Int = PqCodes): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("code"), posexplode(expr(pqSplit("embedding"))).as(Seq("s", "cent")))
      .withColumn("cc", dotF(col("cent"), col("cent")))

  /** The ONE PQ encode kernel, shared by every code-table build and the
    * insert path (a drifted copy would silently encode the serve and
    * bench indexes differently): per (vector, subspace) the
    * argmin-(d, code) against a broadcast codebook — d = cc - 2·sub·cent,
    * the rank-equivalent of L2 — via a map-side-combinable min(struct)
    * (no window over the N×codes distance rows), collected to the
    * (vec_id, codes[PqM]) row a PQ index persists. */
  private def pqEncode(vectors: DataFrame, codebook: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), posexplode(expr(pqSplit("embedding"))).as(Seq("s", "sub")))
      .join(broadcast(codebook), "s")
      .withColumn("d", col("cc") - lit(2.0) * dotF(col("sub"), col("cent")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(named_struct('s', s, 'code', best.code))), p -> p.code)").as("codes"))

  /** The PQ code index — (vec_id, codes[PqM]) — memoized per (session,
    * dir) and prewarmed by [[stateBuilders]]: this table IS what a
    * deployed PQ index persists (~PqM bytes per vector), encode-once by
    * contract. */
  private def pqCodesTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "pq_codes") {
      pqEncode(Tables.embeddings(spark, dir), pqCodebook(spark, dir))
    }

  /** The production-width twin of [[pqCodesTable]]: same encode kernel,
    * [[PqCodesProd]]-entry codebook — still PqM bytes per vector
    * persisted, memoized + prewarmed like the 16-code table. */
  private def pqCodesTable256(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "pq_codes256") {
      pqEncode(Tables.embeddings(spark, dir), pqCodebook(spark, dir, PqCodesProd))
    }

  /** The IVF-PQ/ADC candidate scan shared by [[simIvfPq]] and
    * [[simIvfPqRerank]]: every (query, same-cell candidate) pair with its
    * ADC-approximated cosine. Columns (qid, cid, cos_adc). */
  private def ivfPqAdcPairs(spark: SparkSession, dir: String): DataFrame =
    ivfPqAdcPairsWith(spark, dir, pqCodebook(spark, dir),
      pqCodesTable(spark, dir), PqCodes)

  /** [[ivfPqAdcPairs]] generalized over the code width: the ADC lookup
    * stride is the codebook size, everything else is width-independent.
    * Shared by the 16-code yardstick and the [[PqCodesProd]] path. */
  private def ivfPqAdcPairsWith(spark: SparkSession, dir: String,
      cb: DataFrame, codes: DataFrame, nCodes: Int): DataFrame = {
    val (q0, c0) = ivfAssigned(spark, dir)
    // query ADC tables: 128 partials q_s · cent(s,c), ordered (s, code)
    val qtabs = q0.filter(col("ark") === 1)
      .select(col("qid"), col("qn"), col("cell"), posexplode(expr(pqSplit("qe"))).as(Seq("s", "qsub")))
      .join(broadcast(cb), "s")
      .withColumn("part", dotF(col("qsub"), col("cent")))
      .groupBy(col("qid"), col("qn"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(s, code, part))), p -> p.part)").as("qtab"))
    val cands = c0.select(col("cid"), col("cn"), col("ccell"))
      .join(codes.withColumnRenamed("vec_id", "cid"), "cid")
    val adc = (0 until PqM)
      .map(s => s"qtab[CAST($s * $nCodes + codes[$s] AS INT)]").mkString(" + ")
    qtabs.join(cands, col("cell") === col("ccell") && col("qid") =!= col("cid"))
      .withColumn("cos_adc", expr(adc) / sqrt(col("qn") * col("cn")))
      .select(col("qid"), col("cid"), col("cos_adc"))
  }

  /** How many ADC-ranked candidates per query survive into the exact
    * re-rank — a 4× overfetch over the emitted top-5, the standard
    * refine-stage ratio (enough that an ADC mis-ranking inside the cell
    * cannot evict a true top-5 neighbor unless PQ error exceeds the
    * 15-candidate margin). A PRECISION knob like [[PqCodes]], not an
    * occupancy cap: the refine cost is |Q| × depth exact dots regardless
    * of corpus size, so there is nothing to data-size. */
  private val PqRerankDepth = 20

  /** IVF-PQ with EXACT RE-RANK — the full two-stage retrieval layout every
    * production PQ index runs (Jégou et al. 2011 §V: ADC shortlist, then
    * re-rank with original vectors): the ADC scan ([[ivfPqAdcPairs]] —
    * codes only, vectors never read) keeps the top-[[PqRerankDepth]]
    * candidates per query, and ONLY those pairs fetch their full-precision
    * vectors for an exact cosine, which decides the emitted top-5. At
    * 100 TB the split is the whole point: the code index (~16 B/vector)
    * serves the O(N/k)-per-query ADC scan with the vector column never in
    * the loop; the refine stage joins the |Q| × depth shortlist back to
    * the vector table by id — here ONE column-pruned pass of (vec_id,
    * embedding) as the join's probe side (the shortlist side broadcasts).
    * On a production 100 TB index the pass itself is what you'd shave:
    * shortlist-id runtime filtering (bloom pushdown to the scan — the
    * q33 pattern) or an id-bucketed vector layout (the q35 pattern) turns
    * it into targeted reads; both are shipped elsewhere in this library
    * and compose here unchanged. Emits the EXACT cosine, so output quality
    * equals brute force on whatever the shortlist covers — PQ error can
    * no longer mis-order the final ranking, only (rarely) exclude a
    * candidate from the shortlist. */
  def simIvfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("cos_adc").desc, col("cid"))
    val short = ivfPqAdcPairs(spark, dir)
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= PqRerankDepth)
      .select(col("qid"), col("cid"))
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val qv = e.select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val cv = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val wEx = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    short.join(qv, "qid").join(cv, "cid")
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wEx))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  /** How many cells a SERVE query probes against the compressed index —
    * nprobe=2 closes [[simIvfServe]]'s single-cell recall bound (a held-out
    * vector near a cell boundary finds its true neighbors in the runner-up
    * cell); candidates still live in exactly one cell so no pair is
    * produced twice. */
  private val ServeNprobe = 2

  /** Probe width of the FILTERED serve path ([[simIvfFiltered]]): a 1/L
    * label selectivity thins every probed cell's candidate set by ~L, so
    * filtered search widens the probe to keep the effective candidate
    * count — the standard production rule (probe ∝ 1/selectivity, here
    * doubled from [[ServeNprobe]] for the synthetic 10-label corpus;
    * still O(1) cells per query). */
  private val FilteredNprobe = 4

  /** SERVE-index PQ codebook: the first [[PqCodes]] CORPUS vectors'
    * subvectors (the held-out quarter must not train the codebook — the
    * index has never seen it). Corpus vec_ids are not dense, so the code
    * id is the rank in vec_id order (0-based, identical in the oracle);
    * 16 rows, built inline and broadcast like [[pqCodebook]]. */
  private[graft] def servePqCodebook(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("vec_id"))
    Tables.embeddings(spark, dir).filter(expr("vec_id % 4 <> 3"))
      .orderBy(col("vec_id")).limit(PqCodes)
      .withColumn("code", row_number().over(w) - 1)
      .select(col("code"), posexplode(expr(pqSplit("embedding"))).as(Seq("s", "cent")))
      .withColumn("cc", dotF(col("cent"), col("cent")))
  }

  /** The serve index's PQ code table — (vec_id, cell, nrm, codes[PqM])
    * over CORPUS members only, encoded against [[servePqCodebook]] —
    * memoized + prewarmed like [[pqCodesTable]]. The cell id and stored
    * norm ride WITH the codes (one build-time join against
    * [[ivfServeAssignTable]]): a deployed PQ index persists exactly this
    * row, and the ADC scan then reads ONE memoized table instead of
    * re-joining codes to the assignment on every query. */
  private[graft] def servePqCodesTable(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "ivf_serve_pq_codes") {
      pqEncode(Tables.embeddings(spark, dir).filter(expr("vec_id % 4 <> 3")),
          servePqCodebook(spark, dir))
        .join(ivfServeAssignTable(spark, dir)
          .select(col("vec_id"), col("cell"), col("nrm"), col("label")), "vec_id")
    }

  /** SERVE path against the COMPRESSED index — production's actual serving
    * shape, composing [[simIvfServe]]'s held-out-query contract with
    * [[simIvfPqRerank]]'s two-stage retrieval: an incoming (held-out,
    * % 200 = 3) vector is quantized against the broadcast corpus centroids
    * at query time, probes its [[ServeNprobe]] nearest cells, ADC-scans
    * ONLY the ~8-byte PQ codes of those cells' members (the full-precision
    * corpus vectors are not read by the scan), and the top-[[PqRerankDepth]]
    * shortlist alone fetches its exact vectors for the re-rank that decides
    * the emitted top-5. Per incoming vector the cost is k centroid dots +
    * ~2N/k code lookups + depth exact dots — independent of any index
    * rebuild, and the memory the scan touches is the ~16 B/vector code
    * index, the property that makes 100 TB serving feasible. nprobe=2
    * closes the flat serve path's single-cell recall bound (LlmOpsSpec pins
    * held-out recall@5 >= [[simIvfServe]]'s). */
  def simIvfServePq(spark: SparkSession, dir: String): DataFrame =
    servePqTop5(spark, dir, ServeNprobe, labelFiltered = false)

  /** Plain (unfiltered, [[ServeNprobe]]) serving over a caller-supplied
    * persisted codebook + code index — the spec-facing persistence seam. */
  private[graft] def servePqServeOver(spark: SparkSession, dir: String,
      cb: DataFrame, codeIndex: DataFrame): DataFrame =
    servePqTop5Over(spark, dir, ServeNprobe, labelFiltered = false, cb, codeIndex)

  /** The shared two-stage ADC retrieval kernel behind [[simIvfServePq]]
    * and [[simIvfFilteredPq]] — ONE implementation of query quantization,
    * per-query ADC table, shortlist scan and exact re-rank, so a change
    * to the code-index scheme or tie-breaks cannot drift between the
    * plain and filtered serve paths (the serveTop5Over argument, applied
    * to the compressed index). `labelFiltered` adds the label equality to
    * the cell-scan join condition and carries the query label to the
    * output; `nprobe` widens the probe (the filtered path's
    * selectivity compensation). */
  private def servePqTop5(spark: SparkSession, dir: String, nprobe: Int,
                          labelFiltered: Boolean): DataFrame =
    servePqTop5Over(spark, dir, nprobe, labelFiltered,
      servePqCodebook(spark, dir), servePqCodesTable(spark, dir))

  /** Same kernel over a CALLER-SUPPLIED codebook + code index — the
    * persistence seam: PartitionPruningSpec reads both back from parquet
    * (codes cell-partitioned) and pins disk-served answers bitwise-equal
    * to session-state serving, so a serve-path restart never retrains
    * the quantizer. */
  private[graft] def servePqTop5Over(spark: SparkSession, dir: String, nprobe: Int,
                          labelFiltered: Boolean, cb: DataFrame,
                          codeIndex: DataFrame): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val cents = serveCentroids(spark, dir)
    // query-time quantization: nprobe nearest cells per held-out vector
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
    val q2 = e.filter(expr("vec_id % 200 = 3"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id").as("qid"), col("nrm").as("qn"),
        col("label").as("qlabel"), col("cent_id").as("cell"))
    // per-query ADC table (built once per qid, then joined to its probe cells)
    val qtabs = e.filter(expr("vec_id % 200 = 3"))
      .select(col("vec_id").as("qid"), posexplode(expr(pqSplit("embedding"))).as(Seq("s", "qsub")))
      .join(broadcast(cb), "s")
      .withColumn("part", dotF(col("qsub"), col("cent")))
      .groupBy(col("qid"))
      .agg(expr("transform(array_sort(collect_list(struct(s, code, part))), p -> p.part)").as("qtab"))
    val cands = codeIndex
      .select(col("vec_id").as("cid"), col("nrm").as("cn"), col("cell").as("ccell"),
        col("label").as("clabel"), col("codes"))
    val adc = (0 until PqM)
      .map(s => s"qtab[CAST($s * $PqCodes + codes[$s] AS INT)]").mkString(" + ")
    val scanCond =
      if (labelFiltered) col("cell") === col("ccell") && col("qlabel") === col("clabel")
      else col("cell") === col("ccell")
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("cos_adc").desc, col("cid"))
    // the serve batch is BOUNDED by contract (incoming queries, not a
    // corpus sample), so it broadcasts into the cell scan — the code index
    // is never shuffled, the scan stays a map-side pass over it
    val short = broadcast(q2.join(qtabs, "qid"))
      .join(cands, scanCond)
      .withColumn("cos_adc", expr(adc) / sqrt(col("qn") * col("cn")))
      .withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= PqRerankDepth)
      .select(col("qid"), col("cid"), col("qlabel"))
    // exact re-rank: only the shortlist fetches full-precision vectors —
    // |Q| x depth ids broadcast against the vector table (no corpus shuffle)
    val qv = e.filter(expr("vec_id % 200 = 3"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val cv = ivfServeAssignTable(spark, dir)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val wEx = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    val ranked = broadcast(short.join(qv, "qid")).join(cv, "cid")
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(wEx))
      .filter(col("rk") <= 5)
    val out =
      if (labelFiltered)
        ranked.select(col("qid"), col("rk"), col("cid"),
          col("qlabel").as("label"), col("cos_exact").as("cos"))
      else
        ranked.select(col("qid"), col("rk"), col("cid"), col("cos_exact").as("cos"))
    out.orderBy(col("qid"), col("rk"))
  }

  /** FILTERED search against the COMPRESSED index — [[simIvfFiltered]]'s
    * predicate-inside-the-scan contract composed with [[simIvfServePq]]'s
    * two-stage ADC retrieval, i.e. the exact shape a production vector DB
    * serves filtered queries in: the label predicate is evaluated against
    * the metadata column OF THE CODE INDEX during the cell scan (the
    * ~16 B/vector code row carries its label — [[servePqCodesTable]]), so
    * non-matching members never even reach the 8-lookup ADC score, the
    * shortlist is filtered-by-construction, and only its
    * [[PqRerankDepth]] survivors fetch full-precision vectors for the
    * exact re-rank. Probe width [[FilteredNprobe]] for the same
    * selectivity reason as the flat filtered path. Per query: k centroid
    * dots + ~selectivity·(FilteredNprobe·N/k) code lookups + ≤depth exact
    * dots — the filter makes the ADC pass CHEAPER, not just smaller. */
  def simIvfFilteredPq(spark: SparkSession, dir: String): DataFrame =
    servePqTop5(spark, dir, FilteredNprobe, labelFiltered = true)

  /** The serve index's INSERT path — the WRITE side of incremental
    * serving, complementing [[simIvfServePq]]'s read side: each arriving
    * (held-out) vector is quantized against the frozen corpus centroids
    * and encoded against the frozen corpus PQ codebook, emitting exactly
    * the row that gets APPENDED to the code index — (vec_id, cell, stored
    * norm, PqM code bytes). No index state is rebuilt (k centroid dots +
    * 128 codebook dots per insert, independent of N); inserts accumulate
    * until occupancy drift triggers the periodic re-train
    * (LlmOpsSpec's lifecycle test measures that transition). Codes are
    * emitted as one column per subspace — the append row is flat, like
    * the index layout itself. */
  def simIvfServeInsert(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val held = e.filter(expr("vec_id % 4 = 3"))
    val assigned = serveInsertAssign(spark, dir)
    val codes = pqEncode(held, servePqCodebook(spark, dir))
    assigned.join(codes, "vec_id")
      .select(Seq(col("vec_id"), col("cell"), col("nrm")) ++
        (0 until PqM).map(s => expr(s"CAST(codes[$s] AS BIGINT)").as(s"c$s")): _*)
      .orderBy(col("vec_id"))
  }

  /** The INSERT path's cell assignment — each arriving (held-out) vector
    * quantized against the frozen corpus centroids: (vec_id, embedding,
    * nrm, cell). ONE site shared by [[simIvfServeInsert]] (which appends
    * PQ codes), [[simIvfRetrain]] (which censuses the post-insert
    * occupancy), and [[simIvfRetrainExec]] (which feeds the arrivals into
    * the Lloyd re-train), so the write path, the re-train decision, and
    * the re-train itself can never disagree on where an insert landed.
    * Memoized per (session, dir) like the sibling assignment tables —
    * three queries consume it, so the N/4 × k window assignment is built
    * once and accounted as a state build, not re-paid per query. */
  private def serveInsertAssign(spark: SparkSession, dir: String): DataFrame =
    memoSig(spark, dir, "serve_insert_assign") {
      val e = Tables.embeddings(spark, dir)
        .withColumn("nrm", dotF(col("embedding"), col("embedding")))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
      e.filter(expr("vec_id % 4 = 3"))
        .crossJoin(broadcast(serveCentroids(spark, dir)))
        .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
        .withColumn("ark", row_number().over(wAssign))
        .filter(col("ark") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"))
    }

  /** DELETE path of incremental serving — the third side of the serve
    * index's lifecycle ([[simIvfServe]] reads, [[simIvfServeInsert]]
    * writes, this RETIRES). Deployed IVF indexes delete by TOMBSTONE, not
    * rewrite: the deleted id set is tiny next to the index, queries
    * anti-join it at serve time, and a cell is physically rewritten
    * (compacted) only when its live fraction drops below a threshold —
    * rewriting per delete would re-encode the whole cell for every
    * retired row. This query computes exactly that maintenance decision:
    * a deterministic tombstone batch (corpus vec_id % 5 = 0) grouped
    * against the frozen assignment into per-cell (before, deleted, live,
    * live_frac) plus the compact flag at 0.8. Cost is ONE map-side-
    * combinable pass over the memoized assignment's (vec_id, cell)
    * columns — the full-precision vectors are never read, and the output
    * is k rows however large the index, so the decision scan is free at
    * any scale. LlmOpsSpec pins the census invariants (cells partition
    * the corpus, deleted+live=before, flag consistent with the ratio)
    * and that the serve-read tombstone anti-join is non-vacuous against
    * [[simIvfServe]]'s answers: served results really do contain
    * tombstoned ids for the anti-join to remove, and survive it. */
  def simIvfServeDelete(spark: SparkSession, dir: String): DataFrame =
    ivfServeAssignTable(spark, dir)
      .select(col("vec_id"), col("cell"), expr("CAST(vec_id % 5 = 0 AS INT)").as("del"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_before"),
        sum(col("del")).as("n_deleted"),
        (count(lit(1)) - sum(col("del"))).as("n_live"))
      .withColumn("live_frac", col("n_live") / col("n_before"))
      .withColumn("compact", col("live_frac") < 0.8)
      .orderBy(col("cell"))

  /** COMPACTION EXECUTION — the rewrite [[simIvfServeDelete]] only
    * DECIDES: cells whose live fraction fell below 0.8 are physically
    * rewritten (their tombstoned rows dropped); every other cell is left
    * byte-untouched, tombstones still in place for the serve-time
    * anti-join. Emits the post-compaction index membership — (vec_id,
    * cell, tomb = tombstone still physically present, compacted = this
    * row's cell was rewritten) — i.e. exactly the rows a file-backed
    * index would hold after the maintenance pass. Cost: the same map-side
    * census as the decision scan (k rows), broadcast back onto the
    * assignment's (vec_id, cell) columns, one filter — vectors are never
    * read, nothing shuffles but the k-row census, so the rewrite plan is
    * as free as the decision at any index size. LlmOpsSpec's lifecycle
    * test drives read → insert → delete → compact → read-back and pins
    * that serving over the compacted index equals pre-compaction serving
    * on live ids ([[serveTop5Over]]). */
  def simIvfCompact(spark: SparkSession, dir: String): DataFrame = {
    val assign = ivfServeAssignTable(spark, dir)
      .select(col("vec_id"), col("cell"), expr("vec_id % 5 = 0").as("tomb0"))
    // same live_frac arithmetic as the decision query (long/long IEEE
    // division), so the two can never disagree on which cells compact
    val census = assign.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("tomb0"), 1L).otherwise(0L)).as("n_deleted"))
      .withColumn("compacted",
        (col("n_before") - col("n_deleted")) / col("n_before") < 0.8)
      .select(col("cell"), col("compacted"))
    assign.join(broadcast(census), "cell")
      .filter(!(col("compacted") && col("tomb0")))
      .select(col("vec_id"), col("cell"),
        (col("tomb0") && !col("compacted")).as("tomb"), col("compacted"))
      .orderBy(col("cell"), col("vec_id"))
  }

  /** RE-TRAIN DECISION — the last side of the serve-index lifecycle
    * ([[simIvfServe]] reads, [[simIvfServeInsert]] writes,
    * [[simIvfServeDelete]]/[[simIvfCompact]] retire): an IVF index absorbs
    * inserts into its FROZEN cells, so occupancy drifts — cells fill
    * unevenly and the per-cell scan cost (∝ cell size) degrades until a
    * periodic re-train re-balances the centroids (the re-train itself
    * being [[simIvfKmeans]]'s Lloyd round over the grown corpus). This
    * query computes the decision the maintenance loop polls: per-cell
    * post-insert occupancy (corpus members + arrivals through the shared
    * [[serveInsertAssign]], so the decision can never disagree with the
    * write path about where inserts landed) and two drift signals —
    * `frac_inserted` (arrivals / total: re-train once enough of the index
    * never voted for the centroids) and `skew` (max cell / mean cell, as
    * the single long-arithmetic division max·cells/total: re-train when
    * the worst cell's scan cost runs ≥ 2× the balanced cost). retrain =
    * frac_inserted ≥ 0.2 OR skew ≥ 2.0. Cost mirrors the compaction
    * decision: one map-side-combinable census over (vec_id, cell) columns
    * — vectors are never read on the corpus side — plus k centroid dots
    * per arrival; output is k rows at any index size, so polling the
    * decision is free. LlmOpsSpec extends the lifecycle to
    * read → insert → decide and pins the census + both signals. */
  def simIvfRetrain(spark: SparkSession, dir: String): DataFrame = {
    val corpus = ivfServeAssignTable(spark, dir)
      .select(col("cell"), lit(0L).as("ins"))
    val inserted = serveInsertAssign(spark, dir)
      .select(col("cell"), lit(1L).as("ins"))
    val census = corpus.union(inserted)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_total"), sum(col("ins")).as("n_inserted"),
        (count(lit(1)) - sum(col("ins"))).as("n_corpus"))
    // Drift signals as window aggregates over the k-row census (single
    // partition — k rows, so the "no partition defined" shape is exactly
    // right) rather than a separate agg + crossJoin back: the two census
    // references there prune different columns, don't canonicalize equal,
    // and so replayed the whole insert-assignment window/scan subtree —
    // doubling the poll cost this query's contract says is k-row cheap.
    val wAll = Window.partitionBy()
    census
      .withColumn("g_total", sum(col("n_total")).over(wAll))
      .withColumn("g_ins", sum(col("n_inserted")).over(wAll))
      .withColumn("g_cells", count(lit(1)).over(wAll))
      .withColumn("g_max", max(col("n_total")).over(wAll))
      .withColumn("frac_inserted", col("g_ins") / col("g_total"))
      .withColumn("skew", (col("g_max") * col("g_cells")) / col("g_total"))
      .withColumn("retrain", col("frac_inserted") >= 0.2 || col("skew") >= 2.0)
      .select(col("cell"), col("n_corpus"), col("n_inserted"), col("n_total"),
        col("frac_inserted"), col("skew"), col("retrain"))
      .orderBy(col("cell"))
  }

  /** RE-TRAIN EXECUTION — the rebalance [[simIvfRetrain]] only DECIDES
    * (the same decision→execution pairing as [[simIvfServeDelete]] →
    * [[simIvfCompact]]): one integer-exact Lloyd refinement round over the
    * GROWN corpus — frozen-cell members ∪ arrivals through the shared
    * [[serveInsertAssign]] kernel — using [[kmCentroids]]' quantized
    * component sums (the cross-engine-exact update the k-means quantizer
    * already trains with; a float mean would be partition-order-dependent),
    * then every member re-assigned against the retrained centroids. Emits
    * the per-cell occupancy BEFORE (drifted) vs AFTER (retrained) with the
    * same max·cells/total skew signal the decision reads on both sides —
    * the evidence the maintenance pass actually repaired the drift it was
    * triggered by. Cost: one pass to sum centroids (map-side combinable),
    * one N × k broadcast re-assignment — the price of any re-train — and
    * two k-row censuses; the arrivals' assignment is the memoized
    * [[serveInsertAssign]] table (built once per session). The
    * skew globals ride window aggregates over the k-row census, not a
    * separate agg crossJoined back (the [[simIvfRetrain]] single-subtree
    * lesson). */
  def simIvfRetrainExec(spark: SparkSession, dir: String): DataFrame = {
    val corpus = ivfServeAssignTable(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val inserted = serveInsertAssign(spark, dir)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val members = corpus.union(inserted)
    val cents = kmCentroids(members)
      .select(col("cell").as("ncell"), col("svec"), col("snrm"))
    val wRef = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("ncell"))
    val after = members.crossJoin(broadcast(cents))
      .withColumn("cos_c", dotFL(col("embedding"), col("svec")) / sqrt(col("nrm") * col("snrm")))
      .withColumn("ark", row_number().over(wRef))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("ncell"))
    val before = members.groupBy(col("cell")).agg(count(lit(1)).as("n_before"))
    val afterC = after.groupBy(col("ncell").as("cell"))
      .agg(count(lit(1)).as("n_after"))
    val wAll = Window.partitionBy()
    before.join(afterC, Seq("cell"), "full_outer")
      .withColumn("n_before", coalesce(col("n_before"), lit(0L)))
      .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
      .withColumn("skew_before",
        (max(col("n_before")).over(wAll) * count(lit(1)).over(wAll))
          / sum(col("n_before")).over(wAll))
      .withColumn("skew_after",
        (max(col("n_after")).over(wAll) * count(lit(1)).over(wAll))
          / sum(col("n_after")).over(wAll))
      .withColumn("rebalanced", col("skew_after") <= col("skew_before"))
      .orderBy(col("cell"))
  }

  /** METADATA-FILTERED ANN — the "filtered search" every production
    * vector DB serves (a label/language/tenant predicate evaluated DURING
    * the cell scan, not after): each held-out query retrieves its top-5
    * among corpus vectors sharing its OWN label. The predicate rides the
    * cell-scan join condition (cell equality AND label equality), so
    * non-matching members are discarded inside the join — never scored,
    * never ranked — rather than post-filtering a label-blind top-k (which
    * at a 1/8 label selectivity would leave mostly-empty result lists and
    * is the classic filtered-search recall failure). Queries probe
    * [[FilteredNprobe]] cells, not [[ServeNprobe]]: filtering thins each
    * cell's candidate set by the selectivity factor, so production
    * engines widen the probe under filters (see FilteredNprobe's cost
    * note) — the spec measures recall against label-filtered brute
    * force. Same serve-path cost shape as [[simIvfServe]] (k
    * centroid dots + a bounded cell scan); the label column is already
    * IN the memoized index state ([[ivfServeAssignTable]]) exactly so
    * this scan needs no metadata join. */
  def simIvfFiltered(spark: SparkSession, dir: String): DataFrame = {
    val c = ivfServeAssignTable(spark, dir)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("nrm").as("cn"), col("cell").as("ccell"), col("label").as("clabel"))
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", dotF(col("embedding"), col("embedding")))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))
    val q = e.filter(expr("vec_id % 200 = 3"))
      .crossJoin(broadcast(serveCentroids(spark, dir)))
      .withColumn("cos_c", dotF(col("embedding"), col("cemb")) / sqrt(col("nrm") * col("cnrm")))
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") <= FilteredNprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("label").as("qlabel"), col("cent_id").as("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_exact").desc, col("cid"))
    q.join(c, col("cell") === col("ccell") && col("qlabel") === col("clabel"))
      .withColumn("cos_exact", dotF(col("qe"), col("ce")) / sqrt(col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), col("qlabel").as("label"),
        col("cos_exact").as("cos"))
      .orderBy(col("qid"), col("rk"))
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
    * every executor. */
  def txtRarity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", expr(toksSpark))
      .select(col("doc_id"), explode_outer(col("toks")).as("t"))
      .filter(col("t").isNotNull)
    val tf = toks.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
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

  /** SEMANTIC dedup — the SemDeDup recipe (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with a coarse
    * quantizer, compare vectors ONLY within their cluster, and drop every
    * vector whose cosine to a LOWER-id cluster-mate clears the dedup
    * threshold (0.9) — the embedding-space generalization of near-dup
    * text removal, catching paraphrases no shingle/simhash family can.
    * Reuses [[simIvf]]'s deterministic broadcast quantizer, now DATA-SIZED:
    * k = max(16, sqrt(N/2)) centroids (see [[annPlanes]]' Scaladoc for the
    * cost model — sqrt(N/2) is the flat-quantizer optimum over assignment
    * N*k plus per-cluster pair work N²/2k, total O(N^1.5); production
    * swaps the first-k centroid pick for a sampled k-means, same shape).
    * Emits one row per vector: its cell, the max cosine to any lower-id
    * cluster-mate (NULL when none), and the keep verdict. */
  def ddSemdedup(spark: SparkSession, dir: String): DataFrame = {
    // the cluster structure IS sim_ivf's coarse assignment (same centroids,
    // same argmin, same tie-break) — reuse the memoized index table
    val assigned = ivfAssignTable(spark, dir).filter(col("ark") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val a = assigned.select(col("vec_id").as("ia"), col("embedding").as("ea"),
      col("nrm").as("na"), col("cell"))
    val b = assigned.select(col("vec_id").as("ib"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("cell").as("cellb"))
    // max is order-independent over doubles, so the aggregate is exact
    val low = a.join(b, col("cell") === col("cellb") && col("ib") < col("ia"))
      .withColumn("cos", dotF(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .groupBy(col("ia")).agg(max(col("cos")).as("max_cos_lower"))
    assigned.select(col("vec_id"), col("cell"))
      .join(low.withColumnRenamed("ia", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("max_cos_lower"),
        (col("max_cos_lower").isNull || col("max_cos_lower") < 0.9).as("kept"))
      .orderBy(col("vec_id"))
  }

  // ------------------------------------------------------------ multimodal

  /** Multimodal column plumbing: treat content as opaque binary + typed
    * metadata (byte length, sha256 digest) — the schema/partitioning layer
    * under decode UDFs (see [[Multimodal]] for the batch decode path). */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha_hex"),
        col("source"))
      .orderBy(col("doc_id"))

  // ----------------------------------------------------------------- maps

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_tokens" -> txtTokens _,
    "txt_quality" -> txtQuality _,
    "txt_quality_cut" -> txtQualityCut _,
    "txt_classifier" -> txtClassifier _,
    "txt_langid" -> txtLangid _,
    "txt_fingerprint" -> txtFingerprint _,
    "txt_top_terms" -> txtTopTerms _,
    "dd_exact" -> ddExact _,
    "dd_ngram_jaccard" -> ddNgramJaccard _,
    "dd_containment" -> ddContainment _,
    "dd_url" -> ddUrl _,
    "dd_url_hosts" -> ddUrlHosts _,
    "dd_dedup_keep" -> ddDedupKeep _,
    "dd_dedup_keep_best" -> ddDedupKeepBest _,
    "dd_cluster" -> ddCluster _,
    "dd_cluster_hist" -> ddClusterHist _,
    "txt_tfidf" -> txtTfidf _,
    "txt_balance" -> txtBalance _,
    "txt_vocab_coverage" -> txtVocabCoverage _,
    "txt_bpe_pairs" -> txtBpePairs _,
    "txt_bpe_merge" -> txtBpeMerge _,
    "txt_bpe_vocab" -> txtBpeVocab _,
    "txt_bpe_encode" -> txtBpeEncode _,
    "txt_classifier_sweep" -> txtClassifierSweep _,
    "txt_len_histogram" -> txtLenHistogram _,
    "txt_chunks" -> txtChunks _,
    "txt_pack" -> txtPack _,
    "txt_pack_ffd" -> txtPackFfd _,
    "txt_pack_report" -> txtPackReport _,
    "txt_scrub" -> txtScrub _,
    "txt_gopher" -> txtGopher _,
    "dd_lines" -> ddLines _,
    "dd_passages" -> ddPassages _,
    "dd_dup_fraction" -> ddDupFraction _,
    "dd_align" -> ddAlign _,
    "txt_dup_ngrams" -> txtDupNgrams _,
    "txt_top_terms_cms" -> txtTopTermsCms _,
    "dd_contamination" -> ((s: SparkSession, d: String) => ddContamination(s, d)),
    "dd_contamination8" -> ddContamination8 _,
    "dd_contamination_rate" -> ddContaminationRate _,
    "txt_clean_corpus" -> txtCleanCorpus _,
    "txt_curation_funnel" -> txtCurationFunnel _,
    "txt_shards" -> txtShards _,
    "txt_split" -> txtSplit _,
    "txt_mixture" -> txtMixture _,
    "txt_data_budget" -> txtDataBudget _,
    "mm_join" -> mmJoin _,
    "mm_frame_sample" -> mmFrameSample _,
    "dd_minhash_sig" -> ddMinhashSig _,
    "dd_minhash_pairs" -> ddMinhashPairs _,
    "dd_minhash_wide" -> ddMinhashWide _,
    "dd_minhash_wide128" -> ddMinhashWide128 _,
    "dd_minhash_wide_pairs" -> ddMinhashWidePairs _,
    "dd_minhash_recall" -> ddMinhashRecall _,
    "dd_minhash_calibration" -> ddMinhashCalibration _,
    "dd_incremental_near" -> ddIncrementalNear _,
    "dd_incremental_capped" -> ddIncrementalCapped _,
    "ingest_quarantine" -> ingestQuarantine _,
    "dd_simhash" -> ddSimhash _,
    "dd_simhash_pairs" -> ddSimhashPairs _,
    "dd_simhash_wide" -> ddSimhashWide _,
    "dd_simhash_wide_pairs" -> ddSimhashWidePairs _,
    "dd_semdedup" -> ddSemdedup _,
    "txt_rarity" -> txtRarity _,
    "dd_incremental" -> ddIncremental _,
    "dd_incremental_bucketed" -> ddIncrementalBucketed _,
    "dd_embed_topk" -> ddEmbedTopk _,
    "dd_embed_lsh" -> ddEmbedLsh _,
    "sim_topk_cosine" -> simTopkCosine _,
    "sim_ann_lsh" -> simAnnLsh _,
    "sim_ann_multiprobe" -> simAnnMultiprobe _,
    "sim_ann_probe2" -> simAnnProbe2 _,
    "sim_ann_recall" -> simAnnRecall _,
    "sim_ivf" -> simIvf _,
    "sim_ivf_serve" -> simIvfServe _,
    "sim_ivf_serve_pq" -> simIvfServePq _,
    "sim_ivf_serve_insert" -> simIvfServeInsert _,
    "sim_ivf_serve_delete" -> simIvfServeDelete _,
    "sim_ivf_compact" -> simIvfCompact _,
    "sim_ivf_retrain" -> simIvfRetrain _,
    "sim_ivf_retrain_exec" -> simIvfRetrainExec _,
    "sim_ivf_filtered" -> simIvfFiltered _,
    "sim_ivf_filtered_pq" -> simIvfFilteredPq _,
    "sim_ivf_nprobe2" -> simIvfNprobe2 _,
    "sim_ivf_recall" -> simIvfRecall _,
    "sim_ivf2" -> simIvf2 _,
    "sim_ivf_kmeans" -> simIvfKmeans _,
    "sim_ivf_balance" -> simIvfBalance _,
    "sim_ivf_pq" -> simIvfPq _,
    "sim_ivf_pq256" -> simIvfPq256 _,
    "sim_pq_recall" -> simPqRecall _,
    "sim_ivf_pq_rerank" -> simIvfPqRerank _,
    "mm_meta" -> mmMeta _)

  // ------------------------------------------------------- DuckDB oracles

  private val baseDuck =
    s"base AS (SELECT doc_id, lang, source, n_chars, text, $toksDuck AS toks FROM documents)"

  /** The quantized Lloyd centroid update's component list, ONE definition
    * for every Duck mirror that re-trains centroids ([[kmCentroids]]'
    * cross-engine twin): 64 per-dimension sums of round(x * KmQuant) as
    * BIGINT — the integer-exact update that cannot drift with partition
    * order. */
  private def kmSumsVecDuck: String =
    s"[${(1 to 64).map(i =>
      s"SUM(CAST(round(CAST(embedding[$i] AS DOUBLE) * $KmQuant) AS BIGINT))").mkString(", ")}] AS svec"

  /** The serve lifecycle's frozen base, ONE definition for the e/cents
    * CTE pair that every serve-index mirror (serve, serve_pq, insert,
    * delete, compact, retrain, retrain_exec) opens with: embeddings with
    * norms, and the corpus-only centroid table — the k lowest-id
    * non-held-out (vec_id % 4 <> 3) vectors. Twin of [[serveCentroids]]
    * on the Spark side; edits to the frozen-index definition happen here
    * or nowhere. */
  private def serveECentsDuck: String =
    s"""e AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding", 1)} AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
       |  FROM e WHERE vec_id % 4 <> 3
       |  ORDER BY vec_id LIMIT (SELECT k FROM params))""".stripMargin

  /** Gopher quality-stat CTE chain (per -> pr -> bg -> bc -> top) over
    * `base`, ONE definition shared by the txt_gopher mirror, the
    * clean-corpus quality gate, and the curation funnel;
    * [[gopherPassPredDuck]] is the matching pass predicate over the
    * `pr`/`top` columns. */
  private def gopherStatsDuck: String =
    s"""per AS (
       |  SELECT doc_id, toks,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS lns
       |  FROM base),
       |pr AS (
       |  SELECT doc_id, n_words, toks,
       |    CAST(len(lns) AS BIGINT) AS n_lines,
       |    CAST(len(lns) - len(list_distinct(lns)) AS BIGINT) AS n_dup,
       |    CAST(len(list_filter(lns, l -> substr(l, 1, 2) IN ('- ', '* '))) AS BIGINT) AS n_bullet,
       |    CAST(coalesce(list_sum(list_transform(toks, t -> strlen(t))), 0) AS BIGINT) AS sum_wl,
       |    CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams
       |  FROM per),
       |bg AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |      i -> toks[i] || ' ' || toks[i + 1])) AS b
       |  FROM per),
       |bc AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
       |top AS (SELECT doc_id, max(n) AS top_n FROM bc GROUP BY doc_id)""".stripMargin

  /** The Gopher pass predicate over [[gopherStatsDuck]]'s `pr` columns +
    * `top_n` — the five thresholds in one place for every mirror that
    * gates on quality. */
  private def gopherPassPredDuck: String =
    """n_words >= 5 AND n_words <= 100000
      |    AND sum_wl / nullif(n_words, 0) BETWEEN 2.0 AND 12.0
      |    AND n_dup / nullif(n_lines, 0) <= 0.5
      |    AND top_n / nullif(n_bigrams, 0) <= 0.3
      |    AND n_bullet / nullif(n_lines, 0) <= 0.5""".stripMargin

  /** Jaccard-0.8 near-duplicate DROP set over [[shinglePairsDuck]]'s
    * `pairs`/`sizes` (the higher doc_id of each qualifying pair) —
    * [[nearDropSet]]'s mirror, shared by dd_dedup_keep, the clean-corpus
    * gate, and the curation funnel. */
  private def nearDropsDuck: String =
    """drops AS (
      |  SELECT DISTINCT ib FROM pairs
      |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
      |  WHERE common / (sa.n + sb.n - common) >= 0.8)""".stripMargin

  /** Exact-dedup canonical keeper set (min doc_id per identical-text md5
    * group) — [[exactKeepFlag]]'s mirror, ONE definition of the
    * canonicalization shared by txt_clean_corpus and the curation
    * funnel. */
  private def exactKeepDuck: String =
    "ex AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text))"

  /** (lang, length-bucket)-blocked shingle→candidate-pair CTE chain
    * (sh0→sh→sizes→rare→capped→pairs, undirected `a.doc_id < b.doc_id`)
    * shared by the Jaccard-family mirrors (dd_ngram_jaccard, dd_dedup_keep,
    * dd_dedup_keep_best, dd_cluster). ONE site for the blocking scheme,
    * [[StopShingleCap]], and the first-4-md5-bytes shingle hash — a drifted
    * copy in any one mirror would silently break only that query's parity. */
  private def shinglePairsDuck: String =
    s"""sh0 AS (
       |  SELECT doc_id, lang, n_chars // 50 AS bkt, unnest($shinglesDuck) AS s0
       |  FROM base),
       |sh AS (
       |  SELECT doc_id, lang, bkt, CAST(${hex8("md5(s0)")} AS BIGINT) AS s FROM sh0),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |rare AS (
       |  SELECT s, lang, bkt FROM sh GROUP BY s, lang, bkt
       |  HAVING count(*) <= $StopShingleCap),
       |capped AS (
       |  SELECT sh.* FROM sh SEMI JOIN rare
       |    ON sh.s = rare.s AND sh.lang = rare.lang AND sh.bkt = rare.bkt),
       |pairs AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
       |  FROM capped a JOIN capped b
       |    ON a.s = b.s AND a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** Jaccard-0.8 edge set + connected-component closure
    * (edges→sym→reach→lbl) over [[shinglePairsDuck]]'s `pairs`/`sizes`,
    * shared by the cluster-labelled mirrors (dd_cluster,
    * dd_dedup_keep_best). Callers must open with WITH RECURSIVE. */
  private def ccClosureDuck: String =
    """edges AS (
      |  SELECT ia AS a, ib AS b FROM pairs
      |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
      |  WHERE common / (sa.n + sb.n - common) >= 0.8),
      |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      |reach(a, b) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a),
      |lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)""".stripMargin

  /** Wide-MinHash signature CTE stack (sh→h→sig, `sfx`-suffixed) over
    * `base` — the 16 seeded "w&lt;d&gt;:" md5 digests sliced into the
    * 64-perm signature ([[minhashWideSliceCols]]) — shared by the three
    * wide-LSH mirrors (dd_minhash_wide_pairs, dd_incremental_near,
    * dd_incremental_capped) and, suffixed "_w", by the banding-recall
    * census (whose WITH also hosts [[shinglePairsDuck]]'s colliding `sh`).
    * ONE site for the digest-family/slicing scheme on the Duck side,
    * matching the Spark side's single memoized [[minhashWideSig]] table. */
  private def wideSigStackDuck(sfx: String = ""): String =
    s"""sh$sfx AS (
       |  SELECT doc_id, unnest($shinglesDuck) AS s FROM base),
       |h$sfx AS (
       |  SELECT doc_id, ${(0 until 16).map(d => s"md5('w$d:' || s) AS h$d").mkString(", ")}
       |  FROM sh$sfx),
       |sig$sfx AS (
       |  SELECT doc_id, $minhashWideSliceCols
       |  FROM h$sfx GROUP BY doc_id)""".stripMargin

  /** The [[cappedWideBands]] mirror (bands0→bands, keep-smallest-doc_ids
    * row_number cap) over a suffixed `sig` CTE — ONE site for the
    * per-(band, bucket) cap on the Duck side, shared by the banded-pairs
    * mirror and the banding-recall census. */
  private def cappedBandsDuck(sfx: String): String =
    s"""bands0$sfx AS (
       |  ${wideBandsDuckBranches("", s"sig$sfx")}),
       |bands$sfx AS (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh,
       |      row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
       |    FROM bands0$sfx)
       |  WHERE rn <= $SimhashBucketCap)""".stripMargin

  /** The banded candidate set (distinct undirected band-bucket
    * collisions) over [[cappedBandsDuck]]'s output — the generation step
    * whose recall the census measures, shared with the pairs mirror. */
  private def bandCandDuck(sfx: String): String =
    s"""cand$sfx AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bands$sfx a JOIN bands$sfx b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin

  /** 64-slice signature-agreement COUNT over `sig` aliases sa/sb — the
    * integer est_sim numerator, exposed separately for the calibration
    * census's exact BIGINT sums ([[wideMatches]]'s mirror). */
  private def wideMatchesDuck: String =
    s"(${(0 until MinhashWidePerms).map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END").mkString(" + ")})"

  /** 64-slice signature-agreement estimate over `sig` aliases sa/sb —
    * the wide-MinHash est_sim expression shared by the banded-pairs and
    * incremental-probe mirrors. */
  private def wideEstSimDuck: String =
    s"$wideMatchesDuck / $MinhashWidePerms.0"

  /** Blocked truth pairs with their integer Jaccard twentieth
    * (`(20·common) // union`) over [[shinglePairsDuck]]'s `pairs`/`sizes`
    * — [[jaccardBins]]' mirror, shared by the recall and calibration
    * census oracles. */
  private def jaccardBinsDuck: String =
    """truth AS (
      |  SELECT p.ia, p.ib,
      |    (20 * common) // (sa.n + sb.n - common) AS bin
      |  FROM pairs p JOIN sizes sa ON p.ia = sa.doc_id
      |    JOIN sizes sb ON p.ib = sb.doc_id)""".stripMargin

  /** The k-round BPE training CTE chain (tok→p1→t1→m1→…→pk→tk→mk) over
    * `base` — round r's census (p_r), 1-row argmax (t_r, columns mp/n),
    * and merge-applied stream (m_r, sentinel chr([[BpeSentinelBase]]+r−1))
    * — shared by the txt_bpe_vocab and txt_bpe_encode mirrors so the
    * trainer and encoder oracles read ONE merge-table definition, exactly
    * as the Spark sides share [[bpeMergeTable]]. Unreferenced trailing
    * CTEs (e.g. m_k under the vocab entry) are pruned by DuckDB. */
  private def bpeRoundsDuck(k: Int): String = {
    val census = (src: String, out: String) =>
      s"""$out AS (
         |  SELECT unnest(list_transform(range(1, greatest(length(t) - 1, 0) + 1),
         |    i -> substr(t, i, 2))) AS pair
         |  FROM $src)""".stripMargin
    val top = (src: String, out: String) =>
      s"""$out AS (
         |  SELECT pair AS mp, count(*) AS n FROM $src GROUP BY pair
         |  ORDER BY count(*) DESC, pair LIMIT 1)""".stripMargin
    val merge = (src: String, topN: String, out: String, r: Int) =>
      s"""$out AS (
         |  SELECT replace(t, (SELECT mp FROM $topN), chr(${BpeSentinelBase + r - 1})) AS t
         |  FROM $src)""".stripMargin
    val rounds = (1 to k).map { r =>
      val src = if (r == 1) "tok" else s"m${r - 1}"
      Seq(census(src, s"p$r"), top(s"p$r", s"t$r"), merge(src, s"t$r", s"m$r", r))
    }
    s"""tok AS (
       |  SELECT unnest(toks) AS t FROM base),
       |${rounds.flatten.mkString(",\n")}""".stripMargin
  }

  /** Classifier feature+score CTE pair (clf_f→clf_s) over `base`, the ONE
    * mirror site for the linear head's weights (+4 stop / −2 short / −3
    * long / −2 repeat), feature thresholds (≤2 / ≥12 chars), and stopword
    * list — shared by txt_classifier and dd_dedup_keep_best, matching the
    * Spark side's single [[classifierScored]] kernel. */
  private def classifierScoredDuck: String = {
    val stopsIn = classifierStops.map(w => s"'$w'").mkString(", ")
    s"""clf_f AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_toks,
       |    CAST(len(list_filter(toks, t -> t IN ($stopsIn))) AS BIGINT) AS n_stop,
       |    CAST(len(list_filter(toks, t -> length(t) <= 2)) AS BIGINT) AS n_short,
       |    CAST(len(list_filter(toks, t -> length(t) >= 12)) AS BIGINT) AS n_long,
       |    CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS n_rep
       |  FROM base),
       |clf_s AS (
       |  SELECT doc_id, n_toks, n_stop, n_short, n_long, n_rep,
       |    (n_toks + 4 * n_stop - 2 * n_short - 3 * n_long - 2 * n_rep)
       |      / nullif(n_toks, 0) AS score
       |  FROM clf_f)""".stripMargin
  }

  /** The shared chunk-derivation + running-total packing chain (c → x →
    * r → packed), DuckDB text, parameterized over the per-shard window
    * order — ONE definition for txt_pack (arrival order), txt_pack_ffd
    * (length-descending), and both sides of txt_pack_report. Requires
    * `base` ([[baseDuck]]) in scope; `sfx` disambiguates CTE names when
    * two instantiations share one WITH. Mirrors [[packBySequence]]. */
  private def packSeqDuck(order: String, sfx: String): String =
    s"""c$sfx AS (
       |  SELECT doc_id, lang,
       |    list_transform(range(0, greatest(CAST(ceil(len(toks) / 32.0) AS INT), 1)),
       |      i -> least(greatest(len(toks) - i * 32, 0), 32)) AS sizes
       |  FROM base),
       |x$sfx AS (
       |  SELECT doc_id, lang,
       |    unnest(range(0, len(sizes))) AS chunk_idx,
       |    unnest(sizes) AS n_toks
       |  FROM c$sfx),
       |r$sfx AS (
       |  SELECT lang, n_toks,
       |    sum(n_toks) OVER (PARTITION BY lang ORDER BY $order
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM x$sfx),
       |packed$sfx AS (
       |  SELECT lang, CAST((cum - n_toks) // 64 AS BIGINT) AS seq_id,
       |    count(*) AS n_chunks, CAST(sum(n_toks) AS BIGINT) AS n_toks_total
       |  FROM r$sfx
       |  GROUP BY lang, (cum - n_toks) // 64)""".stripMargin

  /** The shared first-k IVF quantizer chain (e → cents → ass → cell),
    * DuckDB text — ONE definition for every oracle that assigns the FULL
    * corpus against the first-k centroids (the [[ivfAssignTable]] mirror):
    * sim_ivf, sim_ivf_nprobe2, sim_ivf_recall, dd_semdedup, and the PQ
    * family via [[ivfPqPairsDuckN]]. Requires `params` ([[paramsDuck]]) in
    * scope. The serve-path oracles keep their own chains — their corpus
    * filter (%4<>3) and centroid rule differ. Declared BEFORE
    * [[ivfPqPairsDuck]], whose init-time call interpolates it. */
  private val ivfCellChainDuck: String =
    s"""${eNrmDuck},
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
       |  FROM e WHERE vec_id < (SELECT k FROM params)),
       |ass AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, cents.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
       |               cents.cent_id) AS ark
       |  FROM e CROSS JOIN cents),
       |cell AS (
       |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM ass WHERE ark = 1)""".stripMargin

  /** The norm-carrying embedding CTE (`e`) — the opener shared by
    * [[ivfCellChainDuck]] and the k-means mirror (both quantizer chains
    * must read the identical base when one query hosts both). */
  private def eNrmDuck: String =
    s"""e AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding", 1)} AS nrm
       |  FROM embeddings)""".stripMargin

  /** The k-means-refined quantizer chain (cents0→a0→m0→ rounds →a1→cell1),
    * DuckDB text, requiring `e`/`params` in scope — [[ivfKmeansAssignment]]'s
    * mirror (sampled Lloyd rounds, integer-quantized component sums),
    * hoisted out of the sim_ivf_kmeans entry so the balance census reads
    * the SAME chain. The static SQL unrolls all [[KmRounds]] rounds; the
    * Spark builder's fixed-point early stop is result-identical. */
  private def kmCellChainDuck: String =
    s"""cents0 AS (
       |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
       |  FROM e WHERE vec_id < (SELECT k FROM params)),
       |a0 AS (
       |  SELECT e.vec_id, e.embedding, cents0.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY (${dot("e.embedding", "cents0.cemb", 1)}) / sqrt(e.nrm * cents0.cnrm) DESC,
       |               cents0.cent_id) AS ark
       |  FROM e CROSS JOIN cents0 WHERE e.vec_id % 5 = 0),
       |m0 AS (SELECT vec_id, embedding, cent_id AS cell FROM a0 WHERE ark = 1),
       |${(1 to KmRounds).map { r =>
           val sums = s"""cents$r AS (
             |  SELECT cell, $kmSumsVecDuck
             |  FROM m${r - 1} GROUP BY cell),
             |cn$r AS (SELECT cell, svec, ${dot("svec", "svec", 1)} AS snrm FROM cents$r)""".stripMargin
           val nextMembers = s""",
             |m$r AS (
             |  SELECT vec_id, embedding, cell FROM (
             |    SELECT e.vec_id, e.embedding, c.cell,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY (${dot("e.embedding", "c.svec", 1)}) / sqrt(e.nrm * c.snrm) DESC,
             |                 c.cell) AS ark
             |    FROM e CROSS JOIN cn$r c WHERE e.vec_id % 5 = 0)
             |  WHERE ark = 1)""".stripMargin
           sums + (if (r < KmRounds) nextMembers else "")
         }.mkString(",\n")},
       |a1 AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY (${dot("e.embedding", "c.svec", 1)}) / sqrt(e.nrm * c.snrm) DESC,
       |               c.cell) AS ark
       |  FROM e CROSS JOIN cn$KmRounds c),
       |cell1 AS (SELECT vec_id, embedding, nrm, cell FROM a1 WHERE ark = 1)""".stripMargin

  /** The bucketed embedding table (vec_id, embedding, nrm, bucket),
    * DuckDB text — ONE definition for the three hyperplane-LSH oracles
    * and the LSH recall census (the [[annBucketTable]] mirror). Requires
    * `params` in scope. */
  private val annEDuck: String =
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    ${dot("embedding", "embedding", 1)} AS nrm,
       |    ${bucketExpr("embedding", 1)} AS bucket
       |  FROM embeddings)""".stripMargin

  /** Brute-force truth (q → truth): the capped query sample's exact
    * top-5 as (qid, cid) — shared by both recall-census oracles. Requires
    * an `e` CTE with (vec_id, embedding, nrm) in scope. */
  private val bruteTruthDuck: String =
    s"""q AS (
       |  SELECT vec_id, embedding, nrm FROM e
       |  WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT $SimQueryCap),
       |truth AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) DESC,
       |                 c.vec_id) AS rk
       |    FROM q JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rk <= 5)""".stripMargin

  /** The three LSH probing radii as (qid, qe, qn, probe) sources over the
    * bucketed `e` — radius 0 probes the home bucket, radius 1 adds the
    * 1-bit flips, radius 2 the [[probe2Masks]] set; each sliced to the
    * dir's plane count exactly as the base oracles do. */
  private val annQHomeDuck: String =
    "SELECT vec_id AS qid, embedding AS qe, nrm AS qn, bucket AS probe " +
      "FROM e WHERE vec_id % 50 = 0"
  private val annQMultiDuck: String =
    "SELECT vec_id AS qid, embedding AS qe, nrm AS qn, " +
      s"unnest(([bucket${(0 until MaxPlanes).map(p => s", xor(bucket, ${1 << p})").mkString}])[1:1+(SELECT pl FROM params)]) AS probe " +
      "FROM e WHERE vec_id % 50 = 0"
  private val annQProbe2Duck: String =
    "SELECT vec_id AS qid, embedding AS qe, nrm AS qn, " +
      s"unnest(([${probe2Masks(MaxPlanes).map(m => if (m == 0) "bucket" else s"xor(bucket, $m)").mkString(", ")}])[1:(SELECT 1 + pl + (pl*(pl-1))//2 FROM params)]) AS probe " +
      "FROM e WHERE vec_id % 50 = 0"

  /** Exact-ranked LSH candidates for one probing radius (`ranked$sfx`),
    * generic over the probe source — ONE definition for the three base
    * oracles (sfx = "", full output) and the recall census (suffixed,
    * rk<=5 projected). */
  private def annRankedDuck(sfx: String, qSrc: String): String =
    s"""ranked$sfx AS (
       |  SELECT qid, cid, cos_exact,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
       |  FROM (
       |    SELECT q.qid, c.vec_id AS cid,
       |      (${dot("q.qe", "c.embedding", 1)}) / sqrt(q.qn * c.nrm) AS cos_exact
       |    FROM ($qSrc) q JOIN e c ON q.probe = c.bucket AND q.qid <> c.vec_id))""".stripMargin

  /** Shared CTE body of the IVF-PQ oracles (everything through the ADC
    * `pairs`), mirroring [[ivfPqAdcPairs]]: coarse cells as in sim_ivf; the
    * PQ codebook is the first [[PqCodes]] vectors' subvectors (one UNION
    * branch per subspace so every array index is a literal); encode =
    * argmin (cc - 2*sub.cent, code); the pair score is [[PqM]] list lookups
    * into the query's (s, code)-ordered ADC table, summed left-to-right and
    * normalized by the stored exact norms — every chain fixed-order double
    * arithmetic, same as the Spark side. */
  private val ivfPqPairsDuck: String = ivfPqPairsDuckN(PqCodes)

  /** The CTE body generalized over the code width — the codebook CTE keeps
    * first-`nCodes` selection and the ADC lookup stride becomes `nCodes`,
    * exactly mirroring [[ivfPqAdcPairsWith]]. */
  private def ivfPqPairsDuckN(nCodes: Int): String =
    s"""$ivfCellChainDuck,
       |${pqChainDuck(nCodes, "")}""".stripMargin

  /** The PQ encode + ADC chain alone (cb→enc→enc_rk→codes→qpart→qtab→
    * pairs, every CTE `sfx`-suffixed), generic over code width and
    * WITHOUT the cell chain — so the code-width recall census can
    * instantiate TWO widths over one shared [[ivfCellChainDuck]].
    * Requires `e`/`cell` in scope. */
  private def pqChainDuck(nCodes: Int, sfx: String): String =
    s"""cb$sfx AS (SELECT vec_id, embedding FROM e WHERE vec_id < $nCodes),
       |enc$sfx AS (
       |${(0 until PqM).map { s =>
           val b = s * PqSub + 1
           s"""  SELECT e.vec_id, $s AS s, c.vec_id AS code,
              |    (${pqDot("c.embedding", "c.embedding", b)}) - 2 * (${pqDot("e.embedding", "c.embedding", b)}) AS d
              |  FROM e CROSS JOIN cb$sfx c""".stripMargin
         }.mkString("\n  UNION ALL\n")}),
       |enc_rk$sfx AS (
       |  SELECT vec_id, s, code,
       |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code) AS erk
       |  FROM enc$sfx),
       |codes$sfx AS (
       |  SELECT vec_id, list(code ORDER BY s) AS codes
       |  FROM enc_rk$sfx WHERE erk = 1 GROUP BY vec_id),
       |qpart$sfx AS (
       |${(0 until PqM).map { s =>
           val b = s * PqSub + 1
           s"""  SELECT q.vec_id AS qid, $s AS s, c.vec_id AS code,
              |    (${pqDot("q.embedding", "c.embedding", b)}) AS part
              |  FROM e q CROSS JOIN cb$sfx c WHERE q.vec_id % 50 = 0""".stripMargin
         }.mkString("\n  UNION ALL\n")}),
       |qtab$sfx AS (
       |  SELECT qid, list(part ORDER BY s, code) AS qtab
       |  FROM qpart$sfx GROUP BY qid),
       |pairs$sfx AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    (${(0 until PqM).map(s => s"(t.qtab[($s * $nCodes + k2.codes[${s + 1}]) + 1])").mkString(" + ")})
       |      / sqrt(q.nrm * c.nrm) AS cos_adc
       |  FROM cell q JOIN cell c
       |    ON q.cell = c.cell AND q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id
       |  JOIN qtab$sfx t ON t.qid = q.vec_id
       |  JOIN codes$sfx k2 ON k2.vec_id = c.vec_id)""".stripMargin

  val duckdb: Map[String, String] = Map(
    "txt_top_terms" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT lang, unnest(toks) AS t FROM base),
         |counts AS (SELECT lang, t, count(*) AS n FROM tok GROUP BY lang, t),
         |ranked AS (
         |  SELECT lang, t, n,
         |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, t) AS rk
         |  FROM counts)
         |SELECT lang, rk, t, n FROM ranked WHERE rk <= 20
         |ORDER BY lang, rk""".stripMargin,

    "txt_tokens" ->
      s"""WITH $baseDuck
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_calc
         |FROM base ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      s"""WITH $baseDuck, q AS (
         |  SELECT doc_id, text,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS n_stop,
         |    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct
         |  FROM base)
         |SELECT doc_id, n_words, n_stop,
         |  n_stop / nullif(n_words, 0) AS stop_ratio,
         |  n_punct / nullif(length(text), 0) AS punct_ratio,
         |  least(1.0, n_words / 100.0) * 0.5
         |        + (1.0 - n_punct / nullif(length(text), 0)) * 0.5 AS quality
         |FROM q ORDER BY doc_id""".stripMargin,

    // rank-selected per-language quality cut: keep rk <= ceil(n/2) over
    // the (quality DESC, doc_id) window — no float threshold comparison
    "txt_quality_cut" ->
      s"""WITH $baseDuck, q AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct
         |  FROM base),
         |scored AS (
         |  SELECT doc_id, lang,
         |    least(1.0, n_words / 100.0) * 0.5
         |      + (1.0 - n_punct / nullif(length(text), 0)) * 0.5 AS quality
         |  FROM q),
         |ranked AS (
         |  SELECT lang, doc_id, quality,
         |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n_lang
         |  FROM scored)
         |SELECT lang, doc_id, quality, rk, n_lang
         |FROM ranked WHERE rk <= CAST(ceil(n_lang * 0.5) AS BIGINT)
         |ORDER BY lang, rk""".stripMargin,

    // fixed-weight linear classifier head: all-BIGINT numerator, one final
    // int/int division; stopword list = the flattened language markers
    "txt_classifier" ->
      s"""WITH $baseDuck, $classifierScoredDuck
         |SELECT doc_id, n_toks, n_stop, n_short, n_long, n_rep, score,
         |  (n_toks >= 5 AND score >= 1.0) AS keep
         |FROM clf_s ORDER BY doc_id""".stripMargin,

    "txt_langid" -> {
      val scores = langMarkers.map { case (lang, ws) =>
        s"CAST(len(list_filter(toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS s_$lang"
      }.mkString(",\n  ")
      s"""WITH $baseDuck, scored AS (
         |  SELECT doc_id, lang AS lang_label, $scores
         |  FROM base)
         |SELECT doc_id, lang_label, s_en, s_de, s_es, s_fr,
         |  $argmaxCase AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    "txt_fingerprint" ->
      s"""WITH n AS (
         |  SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
         |  FROM documents),
         |f AS (SELECT doc_id, md5(norm) AS fp FROM n)
         |SELECT doc_id, fp, CAST(${hex8("fp")} AS BIGINT) AS fp32
         |FROM f ORDER BY doc_id""".stripMargin,

    "dd_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin,

    // the url derivation + normalization fragments are shared VERBATIM
    // with the Spark side (urlPidSql/urlRawSql/urlNormSql)
    "dd_url" ->
      s"""WITH $urlNormDuck
         |SELECT url_norm, min(doc_id) AS keep_id,
         |  count(*) AS n_docs, CAST(count(*) - 1 AS BIGINT) AS n_dropped
         |FROM n GROUP BY url_norm ORDER BY url_norm""".stripMargin,

    "dd_url_hosts" ->
      s"""WITH $urlNormDuck
         |SELECT split_part(url_norm, '/', 1) AS host,
         |  count(*) AS n_docs, count(DISTINCT url_norm) AS n_pages,
         |  CAST(count(*) - count(DISTINCT url_norm) AS BIGINT) AS n_dup_docs
         |FROM n GROUP BY 1 ORDER BY host""".stripMargin,

    "dd_ngram_jaccard" ->
      s"""WITH $baseDuck, $shinglePairsDuck
         |SELECT ia, ib, common / (sa.n + sb.n - common) AS jaccard
         |FROM pairs JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         |WHERE common / (sa.n + sb.n - common) >= 0.2
         |ORDER BY jaccard DESC, ia, ib LIMIT 200""".stripMargin,

    // lang-blocked only (no length bucket — containment pairs cross
    // lengths by nature), directed, containment = common / |A|
    "dd_containment" ->
      s"""WITH $baseDuck, sh0 AS (
         |  SELECT doc_id, lang, unnest($shinglesDuck) AS s0
         |  FROM base),
         |sh AS (
         |  SELECT doc_id, lang, CAST(${hex8("md5(s0)")} AS BIGINT) AS s FROM sh0),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |rare AS (
         |  SELECT s, lang FROM sh GROUP BY s, lang
         |  HAVING count(*) <= $StopShingleCap),
         |capped AS (
         |  SELECT sh.* FROM sh SEMI JOIN rare
         |    ON sh.s = rare.s AND sh.lang = rare.lang),
         |pairs AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
         |  FROM capped a JOIN capped b
         |    ON a.s = b.s AND a.lang = b.lang AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT ia, ib, common / sa.n AS containment
         |FROM pairs JOIN sizes sa ON ia = sa.doc_id
         |WHERE common / sa.n >= 0.5
         |ORDER BY containment DESC, ia, ib LIMIT 200""".stripMargin,

    "dd_dedup_keep" ->
      s"""WITH $baseDuck, $shinglePairsDuck,
         |$nearDropsDuck
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.ib = doc_id)
         |ORDER BY doc_id""".stripMargin,

    // quality-ranked keep: same component fixpoint as dd_cluster, winner
    // per cluster by (classifier score DESC NULLS LAST, doc_id)
    "dd_dedup_keep_best" ->
      s"""WITH RECURSIVE $baseDuck, $shinglePairsDuck, $ccClosureDuck,
         |$classifierScoredDuck,
         |rankd AS (
         |  SELECT l.doc_id, l.cluster_id, sc.score,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY sc.score DESC NULLS LAST, l.doc_id) AS rk
         |  FROM lbl l JOIN clf_s sc ON l.doc_id = sc.doc_id),
         |losers AS (SELECT doc_id FROM rankd WHERE rk > 1)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars, w.cluster_id, sc.score
         |FROM documents d
         |JOIN clf_s sc ON d.doc_id = sc.doc_id
         |LEFT JOIN (SELECT doc_id, cluster_id FROM rankd WHERE rk = 1) w
         |  ON d.doc_id = w.doc_id
         |WHERE NOT EXISTS (SELECT 1 FROM losers WHERE losers.doc_id = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "dd_cluster" ->
      s"""WITH RECURSIVE $baseDuck, $shinglePairsDuck, $ccClosureDuck,
         |csz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY cluster_id)
         |SELECT doc_id, lbl.cluster_id, cluster_size
         |FROM lbl JOIN csz ON lbl.cluster_id = csz.cluster_id
         |ORDER BY doc_id""".stripMargin,

    // dd_cluster folded to the size histogram, singletons as size-1 rows
    "dd_cluster_hist" ->
      s"""WITH RECURSIVE $baseDuck, $shinglePairsDuck, $ccClosureDuck,
         |csz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY cluster_id),
         |ext AS (
         |  SELECT d.doc_id,
         |    coalesce(csz.cluster_size, 1) AS sz,
         |    coalesce(lbl.cluster_id, -d.doc_id - 1) AS cl
         |  FROM documents d
         |  LEFT JOIN lbl ON d.doc_id = lbl.doc_id
         |  LEFT JOIN csz ON lbl.cluster_id = csz.cluster_id)
         |SELECT CAST(sz AS BIGINT) AS cluster_size,
         |  count(DISTINCT cl) AS n_clusters, count(*) AS n_docs
         |FROM ext GROUP BY sz ORDER BY cluster_size""".stripMargin,

    "txt_tfidf" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(toks) AS t FROM base),
         |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
         |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.t, tf.tf, df.df,
         |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
         |  FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
         |  WHERE tf.doc_id < 50),
         |ranked AS (
         |  SELECT doc_id, t, tf, df, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rk
         |  FROM scored)
         |SELECT doc_id, rk, t, tf, df, score
         |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "txt_gopher" ->
      s"""WITH $baseDuck, $gopherStatsDuck
         |SELECT pr.doc_id, n_words, n_lines,
         |  n_dup / nullif(n_lines, 0) AS dup_line_frac,
         |  n_bullet / nullif(n_lines, 0) AS bullet_frac,
         |  sum_wl / nullif(n_words, 0) AS mean_word_len,
         |  top_n / nullif(n_bigrams, 0) AS top_bigram_frac,
         |  ($gopherPassPredDuck) AS passes
         |FROM pr LEFT JOIN top ON pr.doc_id = top.doc_id
         |ORDER BY pr.doc_id""".stripMargin,

    "dd_lines" ->
      """WITH l0 AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line0,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS idx
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, idx, trim(line0) AS line FROM l0 WHERE trim(line0) <> ''),
        |f AS (SELECT doc_id, idx, line, md5(line) AS fp FROM l),
        |d AS (SELECT fp FROM f GROUP BY fp HAVING count(DISTINCT doc_id) > 1),
        |j AS (
        |  SELECT f.doc_id, f.idx, f.line, (d.fp IS NOT NULL) AS dup
        |  FROM f LEFT JOIN d ON f.fp = d.fp)
        |SELECT doc_id,
        |  count(*) AS n_lines,
        |  count(*) FILTER (WHERE dup) AS n_dup_lines,
        |  md5(coalesce(string_agg(line, chr(10) ORDER BY idx) FILTER (WHERE NOT dup), '')) AS clean_fp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dd_contamination" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 3, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 3), ' ')), 1, 16))) AS w
         |  FROM base),
         |bench AS (SELECT DISTINCT w FROM w0 WHERE doc_id % 97 = 0)
         |SELECT doc_id, count(DISTINCT w0.w) AS n_shared_windows
         |FROM w0 JOIN bench ON w0.w = bench.w
         |WHERE doc_id % 97 <> 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dd_contamination8" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM base),
         |bx AS (
         |  SELECT list_slice(toks, 5, 24) AS et FROM base WHERE doc_id % 89 = 7),
         |bench AS (
         |  SELECT DISTINCT unnest(list_transform(range(1, greatest(len(et) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(et, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM bx)
         |SELECT doc_id, count(DISTINCT w0.w) AS n_shared_windows
         |FROM w0 JOIN bench ON w0.w = bench.w
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // benchmark-side fold of the same passage semi-join; total row keyed
    // bench_id = -1 carries contaminated_frac (int/int division)
    "dd_contamination_rate" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM base),
         |bx AS (
         |  SELECT doc_id AS bench_id, list_slice(toks, 5, 24) AS et
         |  FROM base WHERE doc_id % 89 = 7),
         |bwt AS (
         |  SELECT DISTINCT bench_id,
         |    unnest(list_transform(range(1, greatest(len(et) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(et, i, i + 7), ' ')), 1, 16))) AS bw
         |  FROM bx),
         |ext AS (
         |  SELECT bench_id, count(DISTINCT bw) AS n_ext_windows,
         |    count(DISTINCT doc_id) AS n_ext_docs
         |  FROM w0 JOIN bwt ON w0.w = bwt.bw WHERE w0.doc_id <> bwt.bench_id
         |  GROUP BY bench_id),
         |per AS (
         |  SELECT b.bench_id, COALESCE(c.nw, 0) AS n_windows,
         |    COALESCE(e.n_ext_windows, 0) AS n_ext_windows,
         |    COALESCE(e.n_ext_docs, 0) AS n_ext_docs,
         |    COALESCE(e.n_ext_windows, 0) > 0 AS leaked
         |  FROM (SELECT bench_id FROM bx) b
         |  LEFT JOIN (SELECT bench_id, count(DISTINCT bw) AS nw FROM bwt GROUP BY bench_id) c
         |    ON b.bench_id = c.bench_id
         |  LEFT JOIN ext e ON b.bench_id = e.bench_id)
         |SELECT bench_id, n_windows, n_ext_windows, n_ext_docs, leaked,
         |  CAST(NULL AS DOUBLE) AS contaminated_frac FROM per
         |UNION ALL
         |SELECT -1, CAST(sum(n_windows) AS BIGINT),
         |  CAST(sum(n_ext_windows) AS BIGINT), CAST(sum(n_ext_docs) AS BIGINT),
         |  count(*) FILTER (WHERE leaked) > 0,
         |  count(*) FILTER (WHERE leaked) / count(*) FROM per
         |ORDER BY bench_id""".stripMargin,

    "dd_passages" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM base)
         |SELECT w AS passage_fp,
         |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_hits,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM w0 GROUP BY w HAVING count(DISTINCT doc_id) > 1
         |ORDER BY n_docs DESC, n_hits DESC, passage_fp LIMIT 100""".stripMargin,

    // near-dup pairs via the same shingle/blocking CTEs as dd_dedup_keep;
    // alignment = diagonal run-length over positioned 8-token windows
    "dd_align" ->
      s"""WITH $baseDuck, sh0 AS (
         |  SELECT doc_id, lang, n_chars // 50 AS bkt, unnest($shinglesDuck) AS s0
         |  FROM base),
         |sh AS (
         |  SELECT doc_id, lang, bkt, CAST(${hex8("md5(s0)")} AS BIGINT) AS s FROM sh0),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |rare AS (
         |  SELECT s, lang, bkt FROM sh GROUP BY s, lang, bkt
         |  HAVING count(*) <= $StopShingleCap),
         |capped AS (
         |  SELECT sh.* FROM sh SEMI JOIN rare
         |    ON sh.s = rare.s AND sh.lang = rare.lang AND sh.bkt = rare.bkt),
         |cpairs AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS common
         |  FROM capped a JOIN capped b
         |    ON a.s = b.s AND a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |jpairs AS (
         |  SELECT ia, ib FROM cpairs
         |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         |  WHERE common / (sa.n + sb.n - common) >= 0.8),
         |wlist AS (
         |  SELECT doc_id,
         |    list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16)) AS ws
         |  FROM base),
         |w0 AS (
         |  SELECT doc_id, unnest(range(0, len(ws))) AS pos, unnest(ws) AS w
         |  FROM wlist),
         |m AS (
         |  SELECT p.ia, p.ib, a.pos AS pa, b.pos AS pb
         |  FROM jpairs p
         |  JOIN w0 a ON a.doc_id = p.ia
         |  JOIN w0 b ON b.doc_id = p.ib AND a.w = b.w),
         |r AS (
         |  SELECT ia, ib, pa - pb AS diag, pa,
         |    row_number() OVER (PARTITION BY ia, ib, pa - pb ORDER BY pa) AS rn
         |  FROM m),
         |runs AS (
         |  SELECT ia, ib, count(*) AS run_len
         |  FROM r GROUP BY ia, ib, diag, pa - rn)
         |SELECT ia, ib,
         |  CAST(max(run_len) AS BIGINT) AS max_run_windows,
         |  CAST(max(run_len) + 7 AS BIGINT) AS max_run_tokens
         |FROM runs GROUP BY ia, ib ORDER BY ia, ib""".stripMargin,

    // exact side recomputed; the CMS-guarantee booleans pinned TRUE (the
    // q20/q31/q33 verified-sketch pattern)
    "txt_top_terms_cms" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT unnest(toks) AS t FROM base),
         |counts AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
         |top AS (SELECT t, n FROM counts ORDER BY n DESC, t LIMIT 8)
         |SELECT t AS term, CAST(n AS BIGINT) AS n_exact,
         |  TRUE AS no_underestimate, TRUE AS bounded
         |FROM top ORDER BY n_exact DESC, term""".stripMargin,

    "txt_dup_ngrams" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM base)
         |SELECT doc_id,
         |  count(*) AS n_windows,
         |  count(DISTINCT w) AS n_distinct,
         |  (count(*) - count(DISTINCT w)) / count(*) AS dup_ngram_frac
         |FROM w0 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // integer bucket: length of the binary representation - 1 ==
    // floor(log2), avoiding cross-libm float log2 rounding at powers of 2
    "txt_len_histogram" ->
      s"""WITH $baseDuck, n AS (
         |  SELECT lang, greatest(CAST(len(toks) AS BIGINT), 1) AS n_toks FROM base)
         |SELECT lang,
         |  CAST(length(bin(n_toks)) - 1 AS BIGINT) AS bucket_log2,
         |  count(*) AS n_docs,
         |  CAST(min(n_toks) AS BIGINT) AS min_toks,
         |  CAST(max(n_toks) AS BIGINT) AS max_toks
         |FROM n GROUP BY lang, length(bin(n_toks)) - 1
         |ORDER BY lang, bucket_log2""".stripMargin,

    "txt_vocab_coverage" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT unnest(toks) AS t FROM base),
         |counts AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
         |ranked AS (
         |  SELECT t, n,
         |    row_number() OVER (ORDER BY n DESC, t) AS rk,
         |    sum(n) OVER (ORDER BY n DESC, t
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM counts),
         |tot AS (SELECT sum(n) AS total FROM counts)
         |SELECT CAST(rk AS BIGINT) AS vocab_size,
         |  CAST(cum AS BIGINT) AS covered_occurrences,
         |  CAST(total AS BIGINT) AS total_occurrences,
         |  cum / total AS coverage
         |FROM ranked, tot
         |WHERE rk IN (4, 8, 16)
         |ORDER BY vocab_size""".stripMargin,

    // first-merge-round BPE census: in-token adjacent char pairs, every
    // token instance counted (range upper bound is exclusive in DuckDB)
    "txt_bpe_pairs" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT unnest(toks) AS t FROM base),
         |p AS (
         |  SELECT unnest(list_transform(range(1, greatest(length(t) - 1, 0) + 1),
         |    i -> substr(t, i, 2))) AS pair
         |  FROM tok)
         |SELECT pair, count(*) AS n
         |FROM p GROUP BY pair
         |ORDER BY n DESC, pair LIMIT 100""".stripMargin,

    // one full BPE training round: argmax pair of the round-1 census
    // merged to the noncharacter sentinel chr(BpeSentinelBase) (replace =
    // left-to-right greedy in both engines), then the round-2 census
    "txt_bpe_merge" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT unnest(toks) AS t FROM base),
         |p1 AS (
         |  SELECT unnest(list_transform(range(1, greatest(length(t) - 1, 0) + 1),
         |    i -> substr(t, i, 2))) AS pair
         |  FROM tok),
         |top1 AS (
         |  SELECT pair AS mp FROM p1 GROUP BY pair
         |  ORDER BY count(*) DESC, pair LIMIT 1),
         |m AS (
         |  SELECT replace(t, (SELECT mp FROM top1), chr($BpeSentinelBase)) AS t2 FROM tok),
         |p2 AS (
         |  SELECT unnest(list_transform(range(1, greatest(length(t2) - 1, 0) + 1),
         |    i -> substr(t2, i, 2))) AS pair
         |  FROM m)
         |SELECT pair, count(*) AS n
         |FROM p2 GROUP BY pair
         |ORDER BY n DESC, pair LIMIT 100""".stripMargin,

    // k merge rounds unrolled: each round's census over the stream with
    // all earlier argmax merges applied (sentinels chr(BpeSentinelBase + r))
    "txt_bpe_vocab" ->
      s"""WITH $baseDuck, ${bpeRoundsDuck(BpeVocabRounds)}
         |${(1 to BpeVocabRounds)
             .map(r => s"SELECT CAST($r AS BIGINT) AS round, mp AS pair, n FROM t$r")
             .mkString("\nUNION ALL\n")}
         |ORDER BY round""".stripMargin,

    // the trained merge list applied per document (merge r after all
    // earlier merges — later pairs may contain earlier sentinels), then
    // per-doc raw-char vs post-merge symbol counts
    "txt_bpe_encode" -> {
      // DuckDB forbids subqueries inside lambdas, so the 4 scalar merge
      // pairs ride a 1-row CTE joined onto base and the lambda reads
      // plain columns — same shape as the Spark side's broadcast pairs
      val replaced = (1 to BpeVocabRounds).foldLeft("t") { (acc, r) =>
        s"replace($acc, mp$r, chr(${BpeSentinelBase + r - 1}))"
      }
      val mt = (1 to BpeVocabRounds)
        .map(r => s"(SELECT mp FROM t$r) AS mp$r").mkString(", ")
      s"""WITH $baseDuck, ${bpeRoundsDuck(BpeVocabRounds)},
         |mt AS (SELECT $mt),
         |enc AS (
         |  SELECT doc_id, toks, list_transform(toks, t -> $replaced) AS etoks
         |  FROM base, mt),
         |stats AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_toks,
         |    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS n_chars,
         |    CAST(coalesce(list_sum(list_transform(etoks, t -> length(t))), 0) AS BIGINT) AS n_symbols
         |  FROM enc)
         |SELECT doc_id, n_toks, n_chars, n_symbols,
         |  n_chars - n_symbols AS n_saved,
         |  n_symbols / nullif(n_chars, 0) AS ratio
         |FROM stats ORDER BY doc_id""".stripMargin
    },

    // calibration census: kept docs per half-point score cut (all cuts
    // share the deployed n_toks >= 5 support floor)
    "txt_classifier_sweep" -> {
      val ks = (0 to 5).map(r =>
        s"count(CASE WHEN n_toks >= 5 AND score >= ${r / 2.0} THEN 1 END) AS k$r")
        .mkString(",\n    ")
      val branches = (0 to 5).map(r =>
        s"SELECT CAST(${r / 2.0} AS DOUBLE) AS threshold, k$r AS n_keep, n_docs FROM w")
        .mkString("\n  UNION ALL ")
      s"""WITH $baseDuck, $classifierScoredDuck,
         |w AS (
         |  SELECT count(*) AS n_docs,
         |    $ks
         |  FROM clf_s)
         |SELECT threshold, n_keep, n_docs, n_keep / n_docs AS keep_frac
         |FROM (${branches})
         |ORDER BY threshold""".stripMargin
    },

    "dd_dup_fraction" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM base),
         |dup AS (
         |  SELECT w FROM w0 GROUP BY w HAVING count(DISTINCT doc_id) > 1)
         |SELECT w0.doc_id,
         |  count(*) AS n_windows,
         |  count(CASE WHEN dup.w IS NOT NULL THEN 1 END) AS n_dup_windows,
         |  count(CASE WHEN dup.w IS NOT NULL THEN 1 END) / count(*) AS dup_frac
         |FROM w0 LEFT JOIN dup ON w0.w = dup.w
         |GROUP BY w0.doc_id ORDER BY w0.doc_id""".stripMargin,

    "txt_scrub" ->
      raw"""WITH s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, 'https?://\S+', '<url>', 'g') AS no_url
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, text, no_url,
        |    regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<email>', 'g') AS no_email
        |  FROM s),
        |p AS (
        |  SELECT doc_id, text, no_url, no_email,
        |    regexp_replace(no_email, '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}', '<phone>', 'g') AS no_phone
        |  FROM e),
        |c AS (
        |  SELECT doc_id, text, no_url, no_email, no_phone,
        |    regexp_replace(no_phone, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<ip>', 'g') AS clean
        |  FROM p)
        |SELECT doc_id, md5(clean) AS clean_fp,
        |  CAST(length(text) - length(no_url) AS BIGINT) AS url_chars_delta,
        |  CAST(length(no_url) - length(no_email) AS BIGINT) AS email_chars_delta,
        |  CAST(length(no_email) - length(no_phone) AS BIGINT) AS phone_chars_delta,
        |  CAST(length(no_phone) - length(clean) AS BIGINT) AS ip_chars_delta,
        |  CAST(length(clean) AS BIGINT) AS n_chars_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    "txt_pack" ->
      s"""WITH $baseDuck,
         |${packSeqDuck("doc_id, chunk_idx", "")}
         |SELECT lang, seq_id, n_chunks, n_toks_total
         |FROM packed ORDER BY lang, seq_id""".stripMargin,

    // txt_pack with the per-shard window re-ordered length-descending
    "txt_pack_ffd" ->
      s"""WITH $baseDuck,
         |${packSeqDuck("n_toks DESC, doc_id, chunk_idx", "")}
         |SELECT lang, seq_id, n_chunks, n_toks_total
         |FROM packed ORDER BY lang, seq_id""".stripMargin,

    // both packings aggregated per (strategy, lang): the packer-selection
    // report — token totals agree by construction, n_seqs/fill decide
    "txt_pack_report" ->
      s"""WITH $baseDuck,
         |${packSeqDuck("doc_id, chunk_idx", "a")},
         |${packSeqDuck("n_toks DESC, doc_id, chunk_idx", "d")}
         |SELECT * FROM (
         |  SELECT 'arrival' AS strategy, lang, count(*) AS n_seqs,
         |    CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
         |    CAST(sum(n_toks_total) AS BIGINT) AS n_toks,
         |    max(n_toks_total) AS max_seq_toks,
         |    CAST(sum(n_toks_total) AS BIGINT) / (count(*) * 64) AS fill
         |  FROM packeda GROUP BY lang
         |  UNION ALL
         |  SELECT 'length_desc' AS strategy, lang, count(*) AS n_seqs,
         |    CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
         |    CAST(sum(n_toks_total) AS BIGINT) AS n_toks,
         |    max(n_toks_total) AS max_seq_toks,
         |    CAST(sum(n_toks_total) AS BIGINT) / (count(*) * 64) AS fill
         |  FROM packedd GROUP BY lang)
         |ORDER BY strategy, lang""".stripMargin,

    "txt_chunks" ->
      s"""WITH $baseDuck, c AS (
         |  SELECT doc_id,
         |    list_transform(range(0, greatest(CAST(ceil(len(toks) / 32.0) AS INT), 1)),
         |      i -> array_to_string(list_slice(toks, i * 32 + 1, i * 32 + 32), ' ')) AS chunks
         |  FROM base),
         |x AS (
         |  SELECT doc_id,
         |    unnest(range(0, len(chunks))) AS chunk_idx,
         |    unnest(chunks) AS chunk_text
         |  FROM c)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text,
         |  CAST(length(chunk_text) AS BIGINT) AS chunk_chars
         |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,

    "txt_balance" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 64
        |ORDER BY lang, rk""".stripMargin,

    "txt_clean_corpus" ->
      s"""WITH $baseDuck, $gopherStatsDuck,
         |g AS (
         |  SELECT pr.doc_id FROM pr LEFT JOIN top ON pr.doc_id = top.doc_id
         |  WHERE $gopherPassPredDuck),
         |$exactKeepDuck,
         |$shinglePairsDuck,
         |$nearDropsDuck
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d
         |SEMI JOIN g ON g.doc_id = d.doc_id
         |SEMI JOIN ex ON ex.keep_id = d.doc_id
         |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.ib = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // the curation chain's per-stage loss report: raw -> gopher quality ->
    // exact dedup -> near-dup, each stage counted on the previous stage's
    // survivors; kept_frac is each stage's share of the RAW corpus
    "txt_curation_funnel" ->
      s"""WITH $baseDuck, $gopherStatsDuck,
         |g AS (
         |  SELECT pr.doc_id FROM pr LEFT JOIN top ON pr.doc_id = top.doc_id
         |  WHERE $gopherPassPredDuck),
         |$exactKeepDuck,
         |$shinglePairsDuck,
         |$nearDropsDuck,
         |flags AS (
         |  SELECT d.doc_id,
         |    (g.doc_id IS NOT NULL) AS f_q,
         |    (ex.keep_id IS NOT NULL) AS f_x,
         |    (dr.ib IS NOT NULL) AS f_n
         |  FROM documents d
         |  LEFT JOIN g ON g.doc_id = d.doc_id
         |  LEFT JOIN ex ON ex.keep_id = d.doc_id
         |  LEFT JOIN drops dr ON dr.ib = d.doc_id),
         |c AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(count(*) FILTER (WHERE f_q) AS BIGINT) AS n1,
         |    CAST(count(*) FILTER (WHERE f_q AND f_x) AS BIGINT) AS n2,
         |    CAST(count(*) FILTER (WHERE f_q AND f_x AND NOT f_n) AS BIGINT) AS n3
         |  FROM flags)
         |SELECT CAST(0 AS BIGINT) AS stage_id, 'raw' AS stage,
         |  n0 AS n_in, n0 AS n_kept, n0 - n0 AS n_dropped, n0 / n0 AS kept_frac FROM c
         |UNION ALL SELECT 1, 'quality_gopher', n0, n1, n0 - n1, n1 / n0 FROM c
         |UNION ALL SELECT 2, 'exact_dedup', n1, n2, n1 - n2, n2 / n0 FROM c
         |UNION ALL SELECT 3, 'near_dedup', n2, n3, n2 - n3, n3 / n0 FROM c
         |ORDER BY stage_id""".stripMargin,

    "txt_shards" ->
      s"""WITH $baseDuck, s AS (
         |  SELECT CAST(${hex4("md5(CAST(doc_id AS VARCHAR))")} % 16 AS BIGINT) AS shard,
         |    CAST(len(toks) AS BIGINT) AS n_toks, n_chars
         |  FROM base)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_toks_total,
         |  max(n_chars) AS max_chars
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    // 90/5/5 by salted md5 draw; lang_frac = split's share of its language
    "txt_split" ->
      s"""WITH s AS (
         |  SELECT lang, n_chars,
         |    CASE WHEN ${hex4("md5(CAST(doc_id AS VARCHAR) || ':split')")} < 58982 THEN 'train'
         |         WHEN ${hex4("md5(CAST(doc_id AS VARCHAR) || ':split')")} < 62259 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |g AS (
         |  SELECT lang, split, count(*) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars_total
         |  FROM s GROUP BY lang, split)
         |SELECT lang, split, n_docs, n_chars_total,
         |  n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_frac
         |FROM g ORDER BY lang, split""".stripMargin,

    "txt_mixture" ->
      s"""WITH m AS (
         |  SELECT doc_id, source, lang,
         |    ${hex4("md5(CAST(doc_id AS VARCHAR) || ':' || source)")} / CAST(65536 AS DOUBLE) AS draw,
         |    CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0
         |      THEN CAST(0.75 AS DOUBLE) ELSE CAST(0.25 AS DOUBLE) END AS rate
         |  FROM documents)
         |SELECT doc_id, source, lang, draw, rate
         |FROM m WHERE draw < rate ORDER BY doc_id""".stripMargin,

    // all-BIGINT floor-div chain; weights = the txt_mixture parity
    // convention as integers (even 3 / odd 1); budget = 2x total tokens
    "txt_data_budget" ->
      s"""WITH $baseDuck, persrc AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(toks)) AS BIGINT) AS avail_toks
         |  FROM base GROUP BY source),
         |w AS (
         |  SELECT *, CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0
         |    THEN CAST(3 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS weight
         |  FROM persrc),
         |g AS (
         |  SELECT *, $DataBudgetEpochs * CAST(sum(avail_toks) OVER () AS BIGINT) AS budget_toks,
         |    CAST(sum(weight) OVER () AS BIGINT) AS w_total
         |  FROM w)
         |SELECT source, weight, n_docs, avail_toks, budget_toks,
         |  (budget_toks * weight) // w_total AS requested_toks,
         |  ((budget_toks * weight) // w_total) // avail_toks AS full_epochs,
         |  ((budget_toks * weight) // w_total) % avail_toks AS rem_toks,
         |  (budget_toks * weight) // w_total > avail_toks AS must_repeat
         |FROM g ORDER BY source""".stripMargin,

    "mm_join" ->
      s"""SELECT d.doc_id, d.lang, d.n_chars, e.label,
         |  ${dot("e.embedding", "e.embedding", 1)} AS nrm
         |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         |ORDER BY d.doc_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
        |f AS (
        |  SELECT doc_id, n_bytes,
        |    unnest(range(0, least(n_bytes // 256, 7) + 1)) AS frame_idx
        |  FROM d)
        |SELECT doc_id, frame_idx, frame_idx * 256 AS frame_off,
        |  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS frame_digest
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "dd_minhash_sig" -> minhashSigDuck,

    "dd_minhash_wide" -> minhashWideSigDuck,
    "dd_minhash_wide128" -> minhashWideSigDuckN(128),

    // production-width LSH: 16 bands x 4 rows over the 64-slice signature,
    // per-(band, bucket) cap mirrored from the Spark side
    "dd_minhash_wide_pairs" ->
      s"""WITH $baseDuck, ${wideSigStackDuck()},
         |${cappedBandsDuck("")},
         |${bandCandDuck("")}
         |SELECT ia, ib,
         |  $wideEstSimDuck AS est_sim
         |FROM cand JOIN sig sa ON ia = sa.doc_id JOIN sig sb ON ib = sb.doc_id
         |ORDER BY est_sim DESC, ia, ib LIMIT 200""".stripMargin,

    // banding-accuracy census: exact blocked pairs binned by true Jaccard
    // twentieth (INTEGER floor div — no float binning), each bin counting
    // how many of its truth pairs the capped 16x4 banded candidate
    // generation retrieves; the measured S-curve of the band geometry
    "dd_minhash_recall" ->
      s"""WITH $baseDuck, $shinglePairsDuck,
         |${wideSigStackDuck("_w")},
         |${cappedBandsDuck("_w")},
         |${bandCandDuck("_w")},
         |$jaccardBinsDuck
         |SELECT bin, bin * 5 AS j_lo_pct,
         |  count(*) AS n_pairs, count(c.ia) AS n_retrieved,
         |  count(c.ia) / count(*) AS recall
         |FROM truth t LEFT JOIN cand_w c ON t.ia = c.ia AND t.ib = c.ib
         |GROUP BY bin ORDER BY bin""".stripMargin,

    // estimator calibration: over banded candidates WITH blocked truth,
    // per true-Jaccard twentieth — exact BIGINT slice-match sums and the
    // mean estimate as one int/int division (Broder E[est] = J, measured)
    "dd_minhash_calibration" ->
      s"""WITH $baseDuck, $shinglePairsDuck,
         |${wideSigStackDuck("_w")},
         |${cappedBandsDuck("_w")},
         |${bandCandDuck("_w")},
         |$jaccardBinsDuck
         |SELECT bin, count(*) AS n_pairs,
         |  CAST(sum($wideMatchesDuck) AS BIGINT) AS sum_matches,
         |  CAST(sum($wideMatchesDuck) AS BIGINT) / ($MinhashWidePerms * count(*)) AS avg_est
         |FROM cand_w c JOIN truth t ON c.ia = t.ia AND c.ib = t.ib
         |  JOIN sig_w sa ON c.ia = sa.doc_id JOIN sig_w sb ON c.ib = sb.doc_id
         |GROUP BY bin ORDER BY bin""".stripMargin,

    // incremental near-dup: the batch (>= split) LSH-probed against the
    // corpus (< split) through the wide signature; corpus-side bucket cap
    // (the probe's wider one) mirrored
    "dd_incremental_near" ->
      s"""WITH $baseDuck, ${wideSigStackDuck()},
         |cb0 AS (
         |  ${wideBandsDuckBranches(s" WHERE doc_id < $IncrementalSplit")}),
         |cb AS (
         |  SELECT doc_id, band, bh FROM (
         |    SELECT doc_id, band, bh,
         |      row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
         |    FROM cb0)
         |  WHERE rn <= $IncrementalProbeCap),
         |bb AS (
         |  ${wideBandsDuckBranches(s" WHERE doc_id >= $IncrementalSplit")}),
         |cand AS (
         |  SELECT DISTINCT b.doc_id AS ia, c.doc_id AS ib
         |  FROM bb b JOIN cb c ON b.band = c.band AND b.bh = c.bh),
         |scored AS (
         |  SELECT ia, ib,
         |    $wideEstSimDuck AS est_sim
         |  FROM cand JOIN sig sa ON ia = sa.doc_id JOIN sig sb ON ib = sb.doc_id),
         |best AS (
         |  SELECT ia, ib, est_sim FROM (
         |    SELECT ia, ib, est_sim,
         |      row_number() OVER (PARTITION BY ia ORDER BY est_sim DESC, ib) AS rn
         |    FROM scored)
         |  WHERE rn = 1)
         |SELECT d.doc_id, best.ib AS match_id, best.est_sim,
         |  (best.est_sim IS NULL OR best.est_sim < 0.5) AS kept
         |FROM documents d LEFT JOIN best ON d.doc_id = best.ia
         |WHERE d.doc_id >= $IncrementalSplit
         |ORDER BY d.doc_id""".stripMargin,

    // cap accounting for the incremental probe: what the corpus-side
    // bucket cap cut (pinned to zero on the synthetic corpora)
    "dd_incremental_capped" ->
      s"""WITH $baseDuck, ${wideSigStackDuck()},
         |cb0 AS (
         |  ${wideBandsDuckBranches(s" WHERE doc_id < $IncrementalSplit")}),
         |buckets AS (
         |  SELECT band, bh, count(*) AS cnt FROM cb0 GROUP BY band, bh)
         |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN cnt > $IncrementalProbeCap THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_capped,
         |  CAST(sum(greatest(cnt - $IncrementalProbeCap, 0)) AS BIGINT) AS n_rows_capped_out
         |FROM buckets""".stripMargin,

    // ingestion-health census: the oracle recomputes the per-reason counts
    // from the deterministic damage rule alone — the Spark side must
    // recover exactly that split through the real permissive parser
    "ingest_quarantine" ->
      """SELECT CASE WHEN doc_id % 10 = 3 THEN 'torn_json'
        |            WHEN doc_id % 10 = 5 THEN 'missing_doc_id'
        |            WHEN doc_id % 10 = 7 THEN 'missing_text'
        |            ELSE 'ok' END AS reason, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,

    "dd_minhash_pairs" ->
      s"""WITH $baseDuck, sh AS (
         |  SELECT doc_id, md5(unnest($shinglesDuck)) AS h1, md5('x' || unnest($shinglesDuck)) AS h2 FROM base),
         |sig AS (
         |  SELECT doc_id, $minhashSliceCols
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  ${(0 until 4).map(bd => s"SELECT doc_id, $bd AS band, md5(mh${2 * bd} || mh${2 * bd + 1}) AS bh FROM sig")
              .mkString("\n  UNION ALL ")}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT ia, ib,
         |  (${(0 until 8).map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END").mkString(" + ")}) / 8.0 AS est_sim
         |FROM cand JOIN sig sa ON ia = sa.doc_id JOIN sig sb ON ib = sb.doc_id
         |ORDER BY est_sim DESC, ia, ib LIMIT 200""".stripMargin,

    "dd_simhash" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(list_distinct(toks)) AS t FROM base),
         |hashed AS (
         |  SELECT doc_id, CAST(${hex4("md5(t)")} AS BIGINT) AS h FROM tok),
         |bits AS (
         |  SELECT doc_id,
         |    ${(0 until 16).map(i => s"sum(CASE WHEN (h // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n    ")}
         |  FROM hashed GROUP BY doc_id)
         |SELECT doc_id,
         |  CAST(${(0 until 16).map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin,

    "dd_incremental" ->
      s"""WITH existing AS (
        |  SELECT md5(text) AS fp FROM documents WHERE doc_id < $IncrementalSplit)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.doc_id >= $IncrementalSplit
        |  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.fp = md5(d.text))
        |ORDER BY d.doc_id""".stripMargin,

    // same semantics as dd_incremental — the bucketed variant changes the
    // physical plan (zero corpus-side exchange), never the result
    "dd_incremental_bucketed" ->
      s"""WITH existing AS (
        |  SELECT md5(text) AS fp FROM documents WHERE doc_id < $IncrementalSplit)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d
        |WHERE d.doc_id >= $IncrementalSplit
        |  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.fp = md5(d.text))
        |ORDER BY d.doc_id""".stripMargin,

    // same 1/2 content sample as the Spark side (evenFpSpark) — the
    // didactic 16-bit twin is bounded identically in both engines
    "dd_simhash_pairs" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(list_distinct(toks)) AS t FROM base
         |  WHERE substr(md5(text), 1, 1) IN ('0','2','4','6','8','a','c','e')),
         |hashed AS (
         |  SELECT doc_id, CAST(${hex4("md5(t)")} AS BIGINT) AS h FROM tok),
         |bits AS (
         |  SELECT doc_id,
         |    ${(0 until 16).map(i => s"sum(CASE WHEN (h // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n    ")}
         |  FROM hashed GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(${(0 until 16).map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |  FROM bits),
         |bands AS (
         |  SELECT doc_id, simhash, band,
         |    (simhash // CAST(pow(16, band) AS BIGINT)) % 16 AS bv
         |  FROM sig, unnest([0, 1, 2, 3]) AS u(band)),
         |capped AS (
         |  SELECT doc_id, simhash, band, bv FROM (
         |    SELECT *, row_number() OVER (PARTITION BY band, bv ORDER BY doc_id) AS rn
         |    FROM bands) WHERE rn <= $SimhashBucketCap),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib, a.simhash AS ha, b.simhash AS hb
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT ia, ib, bit_count(xor(ha, hb)) AS hamming
         |FROM cand
         |WHERE bit_count(xor(ha, hb)) <= 3
         |ORDER BY hamming, ia, ib LIMIT 200""".stripMargin,

    "dd_simhash_wide" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(list_distinct(toks)) AS t FROM base),
         |hashed AS (
         |  SELECT doc_id, ${hex15("md5(t)")} AS h FROM tok),
         |bits AS (
         |  SELECT doc_id,
         |    ${(0 until 60).map(i => s"sum(CASE WHEN (h // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n    ")}
         |  FROM hashed GROUP BY doc_id)
         |SELECT doc_id,
         |  CAST(${(0 until 60).map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin,

    "dd_simhash_wide_pairs" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(list_distinct(toks)) AS t FROM base),
         |hashed AS (
         |  SELECT doc_id, ${hex15("md5(t)")} AS h FROM tok),
         |bits AS (
         |  SELECT doc_id,
         |    ${(0 until 60).map(i => s"sum(CASE WHEN (h // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n    ")}
         |  FROM hashed GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(${(0 until 60).map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
         |  FROM bits),
         |bands AS (
         |  SELECT doc_id, simhash, band,
         |    (simhash // CAST(pow(2, 10 * band) AS BIGINT)) % 1024 AS bv
         |  FROM sig, unnest([0, 1, 2, 3, 4, 5]) AS u(band)),
         |capped AS (
         |  SELECT doc_id, simhash, band, bv FROM (
         |    SELECT *, row_number() OVER (PARTITION BY band, bv ORDER BY doc_id) AS rn
         |    FROM bands) WHERE rn <= $SimhashBucketCap),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib, a.simhash AS ha, b.simhash AS hb
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT ia, ib, bit_count(xor(ha, hb)) AS hamming
         |FROM cand
         |WHERE bit_count(xor(ha, hb)) <= 5
         |ORDER BY hamming, ia, ib LIMIT 200""".stripMargin,

    "dd_embed_topk" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding, ${dot("embedding", "embedding", 1)} AS nrm
         |  FROM (
         |    SELECT vec_id, label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS lrk
         |    FROM embeddings)
         |  WHERE lrk <= $EmbedLabelCap)
         |SELECT a.vec_id AS ia, b.vec_id AS ib, a.label AS label,
         |  (${dot("a.embedding", "b.embedding", 1)}) / sqrt(a.nrm * b.nrm) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, ia, ib LIMIT 50""".stripMargin,

    "dd_embed_lsh" ->
      s"""WITH $paramsDuck,
         |e AS (
         |  SELECT vec_id, label, embedding,
         |    ${dot("embedding", "embedding", 1)} AS nrm,
         |    CAST(${bucketExpr("embedding", 1)} AS BIGINT) AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS ia, b.vec_id AS ib, a.label AS label, a.bucket AS bucket,
         |  (${dot("a.embedding", "b.embedding", 1)}) / sqrt(a.nrm * b.nrm) AS cos
         |FROM e a JOIN e b
         |  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, ia, ib LIMIT 50""".stripMargin,

    "sim_topk_cosine" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding", 1)} AS nrm
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id, embedding, nrm FROM e
         |  WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT $SimQueryCap),
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM q JOIN e c ON q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "sim_ann_multiprobe" ->
      s"""WITH $paramsDuck,
         |$annEDuck,
         |${annRankedDuck("", annQMultiDuck)}
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH $paramsDuck,
         |$annEDuck,
         |${annRankedDuck("", annQHomeDuck)}
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "sim_ivf" ->
      s"""WITH $paramsDuck,
         |$ivfCellChainDuck,
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM cell q JOIN cell c
         |    ON q.cell = c.cell AND q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // SERVE path: corpus (vec_id % 4 <> 3) builds the index — centroids
    // are its k lowest-id members — and held-out (% 200 = 3) vectors are
    // quantized at query time and ranked within their cell
    "sim_ivf_serve" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |corpus AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 <> 3)
         |  WHERE ark = 1),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cents.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 200 = 3)
         |  WHERE ark = 1),
         |pairs AS (
         |  SELECT q.qid, c.vec_id AS cid,
         |    (${dot("q.qe", "c.embedding", 1)}) / sqrt(q.qn * c.nrm) AS cos_exact
         |  FROM q JOIN corpus c ON q.cell = c.cell),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // SERVE path against the COMPRESSED index: corpus-only centroids AND
    // corpus-only PQ codebook (dense code = rank in vec_id order); held-out
    // queries probe ServeNprobe cells, ADC-score the cells' codes, and the
    // top-PqRerankDepth shortlist is re-ranked with exact cosines
    "sim_ivf_serve_pq" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |corpus AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 <> 3)
         |  WHERE ark = 1),
         |q2 AS (
         |  SELECT qid, qn, cell FROM (
         |    SELECT e.vec_id AS qid, e.nrm AS qn, cents.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 200 = 3)
         |  WHERE ark <= $ServeNprobe),
         |scb AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS code, embedding
         |  FROM (SELECT vec_id, embedding FROM e WHERE vec_id % 4 <> 3
         |        ORDER BY vec_id LIMIT $PqCodes)),
         |enc AS (
         |${(0 until PqM).map { s =>
             val b = s * PqSub + 1
             s"""  SELECT v.vec_id, $s AS s, b.code,
                |    (${pqDot("b.embedding", "b.embedding", b)}) - 2 * (${pqDot("v.embedding", "b.embedding", b)}) AS d
                |  FROM e v CROSS JOIN scb b WHERE v.vec_id % 4 <> 3""".stripMargin
           }.mkString("\n  UNION ALL\n")}),
         |enc_rk AS (
         |  SELECT vec_id, s, code,
         |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code) AS erk
         |  FROM enc),
         |codes AS (
         |  SELECT vec_id, list(code ORDER BY s) AS codes
         |  FROM enc_rk WHERE erk = 1 GROUP BY vec_id),
         |qpart AS (
         |${(0 until PqM).map { s =>
             val b = s * PqSub + 1
             s"""  SELECT q.vec_id AS qid, $s AS s, b.code,
                |    (${pqDot("q.embedding", "b.embedding", b)}) AS part
                |  FROM e q CROSS JOIN scb b WHERE q.vec_id % 200 = 3""".stripMargin
           }.mkString("\n  UNION ALL\n")}),
         |qtab AS (
         |  SELECT qid, list(part ORDER BY s, code) AS qtab
         |  FROM qpart GROUP BY qid),
         |pairs AS (
         |  SELECT q.qid, c.vec_id AS cid,
         |    (${(0 until PqM).map(s => s"(t.qtab[($s * $PqCodes + k2.codes[${s + 1}]) + 1])").mkString(" + ")})
         |      / sqrt(q.qn * c.nrm) AS cos_adc
         |  FROM q2 q JOIN corpus c ON q.cell = c.cell
         |  JOIN qtab t ON t.qid = q.qid
         |  JOIN codes k2 ON k2.vec_id = c.vec_id),
         |short AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS ark
         |    FROM pairs)
         |  WHERE ark <= $PqRerankDepth),
         |rer AS (
         |  SELECT s.qid, s.cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.qid
         |  JOIN e c ON c.vec_id = s.cid),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM rer)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // filtered search against the compressed index: label predicate joins
    // the ADC cell scan (code rows carry their label); FilteredNprobe
    // probes; top-PqRerankDepth shortlist re-ranked exactly
    "sim_ivf_filtered_pq" ->
      s"""WITH $paramsDuck,
         |e AS (
         |  SELECT vec_id, embedding, label, ${dot("embedding", "embedding", 1)} AS nrm
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
         |  FROM e WHERE vec_id % 4 <> 3
         |  ORDER BY vec_id LIMIT (SELECT k FROM params)),
         |corpus AS (
         |  SELECT vec_id, embedding, nrm, label, cent_id AS cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, e.label, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 <> 3)
         |  WHERE ark = 1),
         |q2 AS (
         |  SELECT qid, qn, qlabel, cell FROM (
         |    SELECT e.vec_id AS qid, e.nrm AS qn, e.label AS qlabel, cents.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 200 = 3)
         |  WHERE ark <= $FilteredNprobe),
         |scb AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS code, embedding
         |  FROM (SELECT vec_id, embedding FROM e WHERE vec_id % 4 <> 3
         |        ORDER BY vec_id LIMIT $PqCodes)),
         |enc AS (
         |${(0 until PqM).map { s =>
             val b = s * PqSub + 1
             s"""  SELECT v.vec_id, $s AS s, b.code,
                |    (${pqDot("b.embedding", "b.embedding", b)}) - 2 * (${pqDot("v.embedding", "b.embedding", b)}) AS d
                |  FROM e v CROSS JOIN scb b WHERE v.vec_id % 4 <> 3""".stripMargin
           }.mkString("\n  UNION ALL\n")}),
         |enc_rk AS (
         |  SELECT vec_id, s, code,
         |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code) AS erk
         |  FROM enc),
         |codes AS (
         |  SELECT vec_id, list(code ORDER BY s) AS codes
         |  FROM enc_rk WHERE erk = 1 GROUP BY vec_id),
         |qpart AS (
         |${(0 until PqM).map { s =>
             val b = s * PqSub + 1
             s"""  SELECT q.vec_id AS qid, $s AS s, b.code,
                |    (${pqDot("q.embedding", "b.embedding", b)}) AS part
                |  FROM e q CROSS JOIN scb b WHERE q.vec_id % 200 = 3""".stripMargin
           }.mkString("\n  UNION ALL\n")}),
         |qtab AS (
         |  SELECT qid, list(part ORDER BY s, code) AS qtab
         |  FROM qpart GROUP BY qid),
         |pairs AS (
         |  SELECT q.qid, c.vec_id AS cid, q.qlabel,
         |    (${(0 until PqM).map(s => s"(t.qtab[($s * $PqCodes + k2.codes[${s + 1}]) + 1])").mkString(" + ")})
         |      / sqrt(q.qn * c.nrm) AS cos_adc
         |  FROM q2 q JOIN corpus c ON q.cell = c.cell AND q.qlabel = c.label
         |  JOIN qtab t ON t.qid = q.qid
         |  JOIN codes k2 ON k2.vec_id = c.vec_id),
         |short AS (
         |  SELECT qid, cid, qlabel FROM (
         |    SELECT qid, cid, qlabel,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS ark
         |    FROM pairs)
         |  WHERE ark <= $PqRerankDepth),
         |rer AS (
         |  SELECT s.qid, s.cid, s.qlabel,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.qid
         |  JOIN e c ON c.vec_id = s.cid),
         |ranked AS (
         |  SELECT qid, cid, qlabel, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM rer)
         |SELECT qid, rk, cid, qlabel AS label, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // serve-index INSERT path: held-out vectors quantized against the
    // frozen corpus centroids + encoded against the frozen corpus PQ
    // codebook — the row appended to the code index
    "sim_ivf_serve_insert" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |assigned AS (
         |  SELECT vec_id, nrm, cent_id AS cell FROM (
         |    SELECT e.vec_id, e.nrm, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 = 3)
         |  WHERE ark = 1),
         |scb AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS code, embedding
         |  FROM (SELECT vec_id, embedding FROM e WHERE vec_id % 4 <> 3
         |        ORDER BY vec_id LIMIT $PqCodes)),
         |enc AS (
         |${(0 until PqM).map { s =>
             val b = s * PqSub + 1
             s"""  SELECT v.vec_id, $s AS s, b.code,
                |    (${pqDot("b.embedding", "b.embedding", b)}) - 2 * (${pqDot("v.embedding", "b.embedding", b)}) AS d
                |  FROM e v CROSS JOIN scb b WHERE v.vec_id % 4 = 3""".stripMargin
           }.mkString("\n  UNION ALL\n")}),
         |enc_rk AS (
         |  SELECT vec_id, s, code,
         |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code) AS erk
         |  FROM enc),
         |codes AS (
         |  SELECT vec_id, list(code ORDER BY s) AS codes
         |  FROM enc_rk WHERE erk = 1 GROUP BY vec_id)
         |SELECT a.vec_id, a.cell, a.nrm,
         |  ${(0 until PqM).map(s => s"CAST(k2.codes[${s + 1}] AS BIGINT) AS c$s").mkString(", ")}
         |FROM assigned a JOIN codes k2 ON k2.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    // serve-index DELETE: per-cell tombstone census over the frozen
    // corpus assignment (tombstones = vec_id % 5 = 0) + compact-at-0.8
    "sim_ivf_serve_delete" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |corpus AS (
         |  SELECT vec_id, cent_id AS cell FROM (
         |    SELECT e.vec_id, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 <> 3)
         |  WHERE ark = 1)
         |SELECT cell, count(*) AS n_before,
         |  count(*) FILTER (vec_id % 5 = 0) AS n_deleted,
         |  count(*) FILTER (vec_id % 5 <> 0) AS n_live,
         |  count(*) FILTER (vec_id % 5 <> 0) / count(*) AS live_frac,
         |  count(*) FILTER (vec_id % 5 <> 0) / count(*) < 0.8 AS compact
         |FROM corpus GROUP BY cell ORDER BY cell""".stripMargin,

    // compaction execution: census per cell (same live_frac arithmetic as
    // the decision query), compact cells drop tombstones, others keep them
    "sim_ivf_compact" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |corpus AS (
         |  SELECT vec_id, cent_id AS cell, (vec_id % 5 = 0) AS tomb0 FROM (
         |    SELECT e.vec_id, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 <> 3)
         |  WHERE ark = 1),
         |census AS (
         |  SELECT cell,
         |    (count(*) - count(*) FILTER (tomb0)) / count(*) < 0.8 AS compacted
         |  FROM corpus GROUP BY cell)
         |SELECT t.vec_id, t.cell,
         |  (t.tomb0 AND NOT c.compacted) AS tomb, c.compacted
         |FROM corpus t JOIN census c USING (cell)
         |WHERE NOT (c.compacted AND t.tomb0)
         |ORDER BY t.cell, t.vec_id""".stripMargin,

    // re-train decision: post-insert occupancy census (corpus + held-out
    // arrivals assigned to the frozen centroids) + the two drift signals
    "sim_ivf_retrain" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |assign AS (
         |  SELECT vec_id, cell, ins FROM (
         |    SELECT e.vec_id, cents.cent_id AS cell,
         |      CAST(e.vec_id % 4 = 3 AS BIGINT) AS ins,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents)
         |  WHERE ark = 1),
         |census AS (
         |  SELECT cell, count(*) AS n_total,
         |    CAST(sum(ins) AS BIGINT) AS n_inserted,
         |    count(*) - CAST(sum(ins) AS BIGINT) AS n_corpus
         |  FROM assign GROUP BY cell),
         |g AS (
         |  SELECT CAST(sum(n_total) AS BIGINT) AS g_total,
         |    CAST(sum(n_inserted) AS BIGINT) AS g_ins,
         |    count(*) AS g_cells, max(n_total) AS g_max
         |  FROM census)
         |SELECT cell, n_corpus, n_inserted, n_total,
         |  g_ins / g_total AS frac_inserted,
         |  (g_max * g_cells) / g_total AS skew,
         |  (g_ins / g_total >= 0.2 OR (g_max * g_cells) / g_total >= 2.0) AS retrain
         |FROM census CROSS JOIN g ORDER BY cell""".stripMargin,

    // re-train executed: one integer Lloyd round over corpus ∪ arrivals
    // (quantized component sums — the kmeans mirror's exact update), then
    // every member re-assigned; before/after occupancy + skew both ways
    "sim_ivf_retrain_exec" ->
      s"""WITH $paramsDuck,
         |$serveECentsDuck,
         |members AS (
         |  SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cents.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents)
         |  WHERE ark = 1),
         |sums AS (
         |  SELECT cell, $kmSumsVecDuck
         |  FROM members GROUP BY cell),
         |cn AS (SELECT cell AS ncell, svec, ${dot("svec", "svec", 1)} AS snrm FROM sums),
         |after0 AS (
         |  SELECT m.vec_id, c.ncell,
         |    row_number() OVER (PARTITION BY m.vec_id
         |      ORDER BY (${dot("m.embedding", "c.svec", 1)}) / sqrt(m.nrm * c.snrm) DESC,
         |               c.ncell) AS ark
         |  FROM members m CROSS JOIN cn c),
         |bc AS (SELECT cell, count(*) AS n_before FROM members GROUP BY cell),
         |ac AS (SELECT ncell AS cell, count(*) AS n_after FROM after0 WHERE ark = 1 GROUP BY ncell),
         |j AS (
         |  SELECT coalesce(bc.cell, ac.cell) AS cell,
         |    coalesce(n_before, 0) AS n_before, coalesce(n_after, 0) AS n_after
         |  FROM bc FULL JOIN ac ON bc.cell = ac.cell),
         |g AS (
         |  SELECT max(n_before) AS mb, max(n_after) AS ma, count(*) AS nc,
         |    CAST(sum(n_before) AS BIGINT) AS tb, CAST(sum(n_after) AS BIGINT) AS ta
         |  FROM j)
         |SELECT cell, n_before, n_after,
         |  (mb * nc) / tb AS skew_before,
         |  (ma * nc) / ta AS skew_after,
         |  (ma * nc) / ta <= (mb * nc) / tb AS rebalanced
         |FROM j CROSS JOIN g ORDER BY cell""".stripMargin,

    // filtered search: the label predicate joins INTO the cell scan;
    // queries probe FilteredNprobe cells against the label-carrying index
    "sim_ivf_filtered" ->
      s"""WITH $paramsDuck,
         |e AS (
         |  SELECT vec_id, embedding, label, ${dot("embedding", "embedding", 1)} AS nrm
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
         |  FROM e WHERE vec_id % 4 <> 3
         |  ORDER BY vec_id LIMIT (SELECT k FROM params)),
         |corpus AS (
         |  SELECT vec_id, embedding, nrm, label, cent_id AS cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, e.label, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 4 <> 3)
         |  WHERE ark = 1),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe, nrm AS qn, label AS qlabel, cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, e.label, cents.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents WHERE e.vec_id % 200 = 3)
         |  WHERE ark <= $FilteredNprobe),
         |pairs AS (
         |  SELECT q.qid, c.vec_id AS cid, q.qlabel,
         |    (${dot("q.qe", "c.embedding", 1)}) / sqrt(q.qn * c.nrm) AS cos_exact
         |  FROM q JOIN corpus c ON q.cell = c.cell AND q.qlabel = c.label),
         |ranked AS (
         |  SELECT qid, cid, qlabel, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, qlabel AS label, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // same quantizer CTEs; queries probe their rank-1 AND rank-2 cells
    "sim_ivf_nprobe2" ->
      s"""WITH $paramsDuck,
         |$ivfCellChainDuck,
         |q2 AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM ass
         |  WHERE ark <= 2 AND vec_id % 50 = 0),
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM q2 q JOIN cell c
         |    ON q.cell = c.cell AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // recall census: brute-force truth on the capped sample vs the IVF
    // top-5 at nprobe=1 (cell) and nprobe=2 (ark<=2); per-qid overlap
    // counts and the int/int recall division
    "sim_ivf_recall" ->
      s"""WITH $paramsDuck,
         |$ivfCellChainDuck,
         |$bruteTruthDuck,
         |np1 AS (
         |  SELECT qid, cid FROM (
         |    SELECT a.vec_id AS qid, c.vec_id AS cid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY (${dot("a.embedding", "c.embedding", 1)}) / sqrt(a.nrm * c.nrm) DESC,
         |                 c.vec_id) AS rk
         |    FROM cell a JOIN cell c
         |      ON a.cell = c.cell AND a.vec_id % 50 = 0 AND a.vec_id <> c.vec_id)
         |  WHERE rk <= 5),
         |np2 AS (
         |  SELECT qid, cid FROM (
         |    SELECT a.vec_id AS qid, c.vec_id AS cid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY (${dot("a.embedding", "c.embedding", 1)}) / sqrt(a.nrm * c.nrm) DESC,
         |                 c.vec_id) AS rk
         |    FROM (SELECT vec_id, embedding, nrm, cent_id AS cell FROM ass WHERE ark <= 2) a
         |      JOIN cell c ON a.cell = c.cell AND a.vec_id % 50 = 0 AND a.vec_id <> c.vec_id)
         |  WHERE rk <= 5)
         |SELECT t.qid,
         |  count(n1.cid) AS hits_np1, count(n1.cid) / 5 AS recall_np1,
         |  count(n2.cid) AS hits_np2, count(n2.cid) / 5 AS recall_np2
         |FROM truth t
         |LEFT JOIN np1 n1 ON t.qid = n1.qid AND t.cid = n1.cid
         |LEFT JOIN np2 n2 ON t.qid = n2.qid AND t.cid = n2.cid
         |GROUP BY t.qid ORDER BY t.qid""".stripMargin,

    // TWO-LEVEL IVF: nested deterministic quantizers — level-1 first-kc
    // centroids, level-2 the kc lowest-id members of each cell; queries
    // scan only their leaf. kc = largest c with c^3 <= N (integer search
    // in params, matching the Scala side exactly)
    "sim_ivf2" ->
      s"""WITH $paramsDuck,
         |e AS (
         |  SELECT vec_id, embedding, ${dot("embedding", "embedding", 1)} AS nrm
         |  FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cemb, nrm AS cnrm
         |  FROM e WHERE vec_id < (SELECT kc FROM params)),
         |l1 AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
         |    SELECT e.vec_id, e.embedding, e.nrm, cents.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY (${dot("e.embedding", "cents.cemb", 1)}) / sqrt(e.nrm * cents.cnrm) DESC,
         |                 cents.cent_id) AS ark
         |    FROM e CROSS JOIN cents)
         |  WHERE ark = 1),
         |subc AS (
         |  SELECT cell AS scell, vec_id AS sub_id, embedding AS semb, nrm AS ssnrm FROM (
         |    SELECT vec_id, embedding, nrm, cell,
         |      row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS srk
         |    FROM l1)
         |  WHERE srk <= (SELECT kc FROM params)),
         |l2 AS (
         |  SELECT vec_id, embedding, nrm, cell, sub_id AS subcell FROM (
         |    SELECT l1.vec_id, l1.embedding, l1.nrm, l1.cell, s.sub_id,
         |      row_number() OVER (PARTITION BY l1.vec_id
         |        ORDER BY (${dot("l1.embedding", "s.semb", 1)}) / sqrt(l1.nrm * s.ssnrm) DESC,
         |                 s.sub_id) AS ark
         |    FROM l1 JOIN subc s ON l1.cell = s.scell)
         |  WHERE ark = 1),
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM l2 q JOIN l2 c
         |    ON q.cell = c.cell AND q.subcell = c.subcell
         |    AND q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // k-means-refined IVF: KmRounds sampled Lloyd rounds with INTEGER
    // quantized-component sums (exact in both engines under any execution
    // order); the un-normalized sum vector is the centroid — cosine needs
    // only the direction, so Lloyd's divide-by-count cancels. The static
    // SQL unrolls ALL rounds; the Spark builder's early stop at the
    // assignment fixed point is result-identical (see KmRounds' Scaladoc).
    // All post-sum arithmetic is the same left-associated double chains
    // Spark folds.
    "sim_ivf_kmeans" ->
      s"""WITH $paramsDuck,
         |$eNrmDuck,
         |$kmCellChainDuck,
         |pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM cell1 q JOIN cell1 c
         |    ON q.cell = c.cell AND q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // quantizer-balance census: per-cell occupancy histograms of the
    // first-k and k-means-refined assignments, reading the two hoisted
    // quantizer chains over ONE shared e base
    "sim_ivf_balance" ->
      s"""WITH $paramsDuck,
         |$ivfCellChainDuck,
         |$kmCellChainDuck,
         |occ_f AS (SELECT cell, count(*) AS occ FROM cell GROUP BY cell),
         |occ_k AS (SELECT cell, count(*) AS occ FROM cell1 GROUP BY cell)
         |SELECT quantizer, occ, n_cells FROM (
         |  SELECT 'first_k' AS quantizer, occ, count(*) AS n_cells
         |  FROM occ_f GROUP BY occ
         |  UNION ALL
         |  SELECT 'kmeans' AS quantizer, occ, count(*) AS n_cells
         |  FROM occ_k GROUP BY occ)
         |ORDER BY quantizer, occ""".stripMargin,

    // IVF-PQ/ADC: shared CTE body in ivfPqPairsDuck (see its Scaladoc)
    "sim_ivf_pq" ->
      s"""WITH $paramsDuck,
         |$ivfPqPairsDuck,
         |ranked AS (
         |  SELECT qid, cid, cos_adc,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_adc
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // production 8-bit code width: same CTE body at a 256-entry codebook
    "sim_ivf_pq256" ->
      s"""WITH $paramsDuck,
         |${ivfPqPairsDuckN(PqCodesProd)},
         |ranked AS (
         |  SELECT qid, cid, cos_adc,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS rk
         |  FROM pairs)
         |SELECT qid, rk, cid, cos_adc
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // code-width recall census: brute-force truth on the capped sample vs
    // the ADC top-5 at the 16-code yardstick and the production 8-bit
    // width — two pqChainDuck instantiations over ONE shared cell chain
    "sim_pq_recall" ->
      s"""WITH $paramsDuck,
         |$ivfCellChainDuck,
         |${pqChainDuck(PqCodes, "_16")},
         |${pqChainDuck(PqCodesProd, "_256")},
         |$bruteTruthDuck,
         |top_16 AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS rk
         |    FROM pairs_16)
         |  WHERE rk <= 5),
         |top_256 AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS rk
         |    FROM pairs_256)
         |  WHERE rk <= 5)
         |SELECT t.qid,
         |  count(p16.cid) AS hits_pq16, count(p16.cid) / 5 AS recall_pq16,
         |  count(p256.cid) AS hits_pq256, count(p256.cid) / 5 AS recall_pq256
         |FROM truth t
         |LEFT JOIN top_16 p16 ON t.qid = p16.qid AND t.cid = p16.cid
         |LEFT JOIN top_256 p256 ON t.qid = p256.qid AND t.cid = p256.cid
         |GROUP BY t.qid ORDER BY t.qid""".stripMargin,

    // IVF-PQ + exact re-rank: ADC shortlist (top PqRerankDepth per query,
    // (cos_adc, cid) order), then full-precision cosine on just those
    // pairs decides the emitted top-5 — mirrors simIvfPqRerank exactly
    "sim_ivf_pq_rerank" ->
      s"""WITH $paramsDuck,
         |$ivfPqPairsDuck,
         |short AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_adc DESC, cid) AS ark
         |    FROM pairs)
         |  WHERE ark <= $PqRerankDepth),
         |rer AS (
         |  SELECT s.qid, s.cid,
         |    (${dot("q.embedding", "c.embedding", 1)}) / sqrt(q.nrm * c.nrm) AS cos_exact
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.qid
         |  JOIN e c ON c.vec_id = s.cid),
         |ranked AS (
         |  SELECT qid, cid, cos_exact,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_exact DESC, cid) AS rk
         |  FROM rer)
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // radius-2 multiprobe: the full MaxPlanes mask list sliced to the
    // 1 + pl + pl(pl-1)/2 masks valid for the data-sized plane count
    // (the list is ordered by highest set bit, so that slice is exact)
    "sim_ann_probe2" ->
      s"""WITH $paramsDuck,
         |$annEDuck,
         |${annRankedDuck("", annQProbe2Duck)}
         |SELECT qid, rk, cid, cos_exact AS cos
         |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    // LSH recall census: brute-force truth vs the three probing radii
    "sim_ann_recall" ->
      s"""WITH $paramsDuck,
         |$annEDuck,
         |$bruteTruthDuck,
         |${annRankedDuck("r0", annQHomeDuck)},
         |${annRankedDuck("r1", annQMultiDuck)},
         |${annRankedDuck("r2", annQProbe2Duck)}
         |SELECT t.qid,
         |  count(a0.cid) AS hits_r0, count(a0.cid) / 5 AS recall_r0,
         |  count(a1.cid) AS hits_r1, count(a1.cid) / 5 AS recall_r1,
         |  count(a2.cid) AS hits_r2, count(a2.cid) / 5 AS recall_r2
         |FROM truth t
         |LEFT JOIN (SELECT qid, cid FROM rankedr0 WHERE rk <= 5) a0
         |  ON t.qid = a0.qid AND t.cid = a0.cid
         |LEFT JOIN (SELECT qid, cid FROM rankedr1 WHERE rk <= 5) a1
         |  ON t.qid = a1.qid AND t.cid = a1.cid
         |LEFT JOIN (SELECT qid, cid FROM rankedr2 WHERE rk <= 5) a2
         |  ON t.qid = a2.qid AND t.cid = a2.cid
         |GROUP BY t.qid ORDER BY t.qid""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha_hex, source
        |FROM documents ORDER BY doc_id""".stripMargin,

    // integer-exact mirror: bigint tf sums, one final double division;
    // head-of-vocabulary join (top-K by (n_t, t)) with tail types as
    // singletons — identical to the Spark side's bounded broadcast
    "txt_rarity" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(toks) AS t FROM base),
         |tf AS (
         |  SELECT t, count(*) AS n_t FROM tok GROUP BY t),
         |total AS (
         |  SELECT sum(n_t) AS n_corpus FROM tf),
         |tfhead AS (
         |  SELECT t, n_t FROM tf ORDER BY n_t DESC, t LIMIT $RarityVocabCap)
         |SELECT doc_id, count(*) AS n_toks,
         |  CAST(sum(coalesce(n_t, 1)) AS BIGINT) AS sum_tf,
         |  CAST(min(coalesce(n_t, 1)) AS BIGINT) AS min_tf,
         |  CAST(CAST(sum(coalesce(n_t, 1)) AS BIGINT) AS DOUBLE) / count(*) / (SELECT n_corpus FROM total) AS mean_tf_share
         |FROM tok LEFT JOIN tfhead USING (t)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // same quantizer CTEs as sim_ivf; low-id in-cluster max cosine + verdict
    "dd_semdedup" ->
      s"""WITH $paramsDuck,
         |$ivfCellChainDuck,
         |low AS (
         |  SELECT a.vec_id,
         |    max((${dot("a.embedding", "b.embedding", 1)}) / sqrt(a.nrm * b.nrm)) AS max_cos_lower
         |  FROM cell a JOIN cell b ON a.cell = b.cell AND b.vec_id < a.vec_id
         |  GROUP BY a.vec_id)
         |SELECT c.vec_id, c.cell, l.max_cos_lower,
         |  (l.max_cos_lower IS NULL OR l.max_cos_lower < 0.9) AS kept
         |FROM cell c LEFT JOIN low l ON c.vec_id = l.vec_id
         |ORDER BY c.vec_id""".stripMargin)

  private def minhashSliceCols: String =
    (0 until 8).map { j =>
      val (h, off) = if (j < 4) ("h1", j) else ("h2", j - 4)
      s"min(substr($h, ${1 + 8 * off}, 8)) AS mh$j"
    }.mkString(", ")

  private def minhashSigDuck: String =
    s"""WITH $baseDuck, sh AS (
       |  SELECT doc_id, md5(unnest($shinglesDuck)) AS h1, md5('x' || unnest($shinglesDuck)) AS h2 FROM base)
       |SELECT doc_id, $minhashSliceCols
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** 64 min-slice aggregates over the 16 seeded digests h0..h15 — the
    * DuckDB mirror of [[buildMinhashWideSig]]'s slicing. */
  private def minhashWideSliceCols: String = minhashWideSliceColsN(64)

  private def minhashWideSliceColsN(perms: Int): String =
    (0 until perms).map(j => s"min(substr(h${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS mh$j")
      .mkString(", ")

  /** The [[wideBands]] geometry as DuckDB SQL — one UNION ALL branch per
    * band over the named sig CTE, with `pred` appended as a WHERE clause
    * (empty for the whole table). The single mirror of the Spark-side
    * band hash composition. */
  private def wideBandsDuckBranches(pred: String, sigName: String = "sig"): String =
    (0 until MinhashWideBands).map(bd =>
      s"SELECT doc_id, $bd AS band, md5(mh${4 * bd} || mh${4 * bd + 1} || mh${4 * bd + 2} || mh${4 * bd + 3}) AS bh FROM $sigName$pred")
      .mkString("\n  UNION ALL ")

  private def minhashWideSigDuck: String = minhashWideSigDuckN(64)

  /** The signature-table mirror generalized over permutation count —
    * perms/4 seeded digests, [[minhashWideSliceColsN]] slicing. */
  private def minhashWideSigDuckN(perms: Int): String =
    s"""WITH $baseDuck, sh AS (
       |  SELECT doc_id, unnest($shinglesDuck) AS s FROM base),
       |h AS (
       |  SELECT doc_id, ${(0 until perms / 4).map(d => s"md5('w$d:' || s) AS h$d").mkString(", ")}
       |  FROM sh)
       |SELECT doc_id, ${minhashWideSliceColsN(perms)}
       |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
