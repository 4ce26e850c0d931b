package graft.analytics

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The DuckDB mirror layer: every shared SQL fragment and the full
  * per-query oracle map. Moved verbatim from LlmOps (round 15). */
private[analytics] trait LlmOracles {
  this: OpsKernels with TxtOps with DedupOps with SimOps with IngestOps =>

  /** Same tokens — DuckDB fragment. */
  private[analytics] lazy val toksDuck = raw"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"

  /** Same (DuckDB, 1-based lists). */
  private[analytics] lazy val shinglesDuck =
    "list_distinct(list_transform(range(1, greatest(len(toks)-2, 0)+1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"


  /** The oracle-side twin of [[annPlanes]]/[[ivfK]]: a `params` CTE the
    * sized oracle queries prepend — k and pl computed from count(*) with
    * the exact formulas above. `range(0,17)` + min() is the integer-exact
    * power-of-two search (no float log2). */
  private[analytics] lazy val paramsDuck: String =
    """nrows AS (SELECT count(*) AS n FROM embeddings),
      |params AS (SELECT
      |  greatest(16, CAST(floor(sqrt(n // 2)) AS BIGINT)) AS k,
      |  greatest(4, least(16, coalesce((SELECT min(p) FROM range(0,17) t(p), nrows
      |    WHERE 64 * (CAST(1 AS BIGINT) << p) >= n), 16))) AS pl,
      |  greatest(8, coalesce((SELECT max(c) FROM range(1,2100) t(c), nrows
      |    WHERE c * c * c <= n), 1)) AS kc
      |  FROM nrows)""".stripMargin


  /** The Duck CTE chain matching [[urlNormalized]] — fragments verbatim. */
  private[analytics] lazy val urlNormDuck =
    s"""p AS (SELECT doc_id, $urlPidSql AS pid FROM documents),
       |u AS (SELECT doc_id, $urlRawSql AS url FROM p),
       |n AS (SELECT doc_id, url, $urlNormSql AS url_norm FROM u)""".stripMargin


  /** The Duck twin of [[txtLangid]]'s marker-scoring projection — shared
    * by the per-doc readout and the confusion census. */
  private[analytics] lazy val langidScoredDuck: String = {
    val scores = langMarkers.map { case (lang, ws) =>
      s"CAST(len(list_filter(toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS s_$lang"
    }.mkString(",\n  ")
    s"""scored AS (
       |  SELECT doc_id, lang AS lang_label, $scores
       |  FROM base)""".stripMargin
  }


  /** The Duck twin of [[TxtOps.piiScored]] — contact-enriched text
    * ([[piiRawSql]] verbatim), per-category match counts, and the
    * order-chained redaction. Patterns come from the SAME [[piiRes]]
    * constants the Spark side uses (backslash-free, so DuckDB's RE2 and
    * Java regex compile identically); DuckDB needs the explicit 'g' flag
    * where Spark's regexp_replace is always global. */
  private[analytics] lazy val piiScoredDuck: String = {
    val counts = piiRes.map { case (cat, re) =>
      s"CAST(len(regexp_extract_all(raw, '$re')) AS BIGINT) AS n_${cat}s"
    }.mkString(",\n  ")
    val clean = piiRes.foldLeft("raw") { case (e, (cat, re)) =>
      s"regexp_replace($e, '$re', '<$cat>', 'g')"
    }
    s"""pii_p AS (SELECT doc_id, source, $piiRawSql AS raw FROM documents),
       |pii_s AS (SELECT doc_id, source, raw,
       |  $counts,
       |  $clean AS clean
       |  FROM pii_p)""".stripMargin
  }


  /** The crawl-funnel gate-flag CTE chain — [[DedupOps.crawlFlags]]'s
    * mirror, ONE definition for the corpus-level funnel and the
    * per-source slice. Expects `base` and the urlNorm chain (`n`) in
    * scope; closes with a `flags` CTE of (doc_id, source, f_u, f_h, f_x,
    * f_n). */
  private[analytics] def crawlFlagsDuck: String =
    s"""uk AS (SELECT min(doc_id) AS doc_id, url_norm FROM n GROUP BY url_norm),
       |hk AS (SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY $hostOfSql ORDER BY doc_id) AS rk
       |    FROM uk) WHERE rk <= $HostCap),
       |$exactKeepDuck,
       |$shinglePairsDuck,
       |$nearDropsDuck,
       |flags0 AS (
       |  SELECT d.doc_id, d.source,
       |    (uk.doc_id IS NOT NULL) AS f_u,
       |    (hk.doc_id IS NOT NULL) AS f_h,
       |    (ex.keep_id IS NOT NULL) AS f_x,
       |    (dr.ib IS NOT NULL) AS f_n
       |  FROM documents d
       |  LEFT JOIN uk ON uk.doc_id = d.doc_id
       |  LEFT JOIN hk ON hk.doc_id = d.doc_id
       |  LEFT JOIN ex ON ex.keep_id = d.doc_id
       |  LEFT JOIN drops dr ON dr.ib = d.doc_id),
       |flags AS (
       |  SELECT doc_id, source,
       |    f_u AS p1, (f_u AND f_h) AS p2,
       |    (f_u AND f_h AND f_x) AS p3,
       |    (f_u AND f_h AND f_x AND NOT f_n) AS p4
       |  FROM flags0)""".stripMargin


  /** The budget-plan CTE chain (per-source availability → weights →
    * corpus totals), ONE definition shared by the planner readout
    * (txt_data_budget) and the manifest execution (txt_sample_exec) so
    * the plan a manifest executes cannot drift from the plan reported.
    * Expects `base` in scope; closes with `g`. */
  private[analytics] lazy val budgetChainDuck: String =
    s"""persrc AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(toks)) AS BIGINT) AS avail_toks
       |  FROM base GROUP BY source),
       |w AS (
       |  SELECT *, $sourceWeightSql AS weight
       |  FROM persrc),
       |g AS (
       |  SELECT *, $DataBudgetEpochs * CAST(sum(avail_toks) OVER () AS BIGINT) AS budget_toks,
       |    CAST(sum(weight) OVER () AS BIGINT) AS w_total
       |  FROM w)""".stripMargin


  /** One admission-contract mirror for the single-scan gate and its
    * bucketed-state twin (same rows by contract). */
  private[analytics] lazy val urlIncrementalDuck: String =
    s"""WITH $urlNormDuck,
       |f AS (SELECT DISTINCT url_norm FROM n WHERE doc_id % 4 <> 3)
       |SELECT doc_id, url_norm FROM n
       |WHERE doc_id % 4 = 3 AND url_norm NOT IN (SELECT url_norm FROM f)
       |ORDER BY doc_id""".stripMargin


  // ------------------------------------------------------- DuckDB oracles


  private[analytics] lazy val baseDuck =
    s"base AS (SELECT doc_id, lang, source, n_chars, text, $toksDuck AS toks FROM documents)"


  /** The quantized Lloyd centroid update's component list, ONE definition
    * for every Duck mirror that re-trains centroids ([[kmCentroids]]'
    * cross-engine twin): 64 per-dimension sums of round(x * KmQuant) as
    * BIGINT — the integer-exact update that cannot drift with partition
    * order. */
  private[analytics] def kmSumsVecDuck: String =
    s"[${(1 to 64).map(i =>
      s"SUM(CAST(round(CAST(embedding[$i] AS DOUBLE) * $KmQuant) AS BIGINT))").mkString(", ")}] AS svec"


  /** The serve lifecycle's frozen base, ONE definition for the e/cents
    * CTE pair that every serve-index mirror (serve, serve_pq, insert,
    * delete, compact, retrain, retrain_exec) opens with: embeddings with
    * norms, and the corpus-only centroid table — the k lowest-id
    * non-held-out (vec_id % 4 <> 3) vectors. Twin of [[serveCentroids]]
    * on the Spark side; edits to the frozen-index definition happen here
    * or nowhere. */
  private[analytics] def serveECentsDuck: String =
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
  private[analytics] def gopherStatsDuck: String =
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
  private[analytics] def gopherPassPredDuck: String =
    """n_words >= 5 AND n_words <= 100000
      |    AND sum_wl / nullif(n_words, 0) BETWEEN 2.0 AND 12.0
      |    AND n_dup / nullif(n_lines, 0) <= 0.5
      |    AND top_n / nullif(n_bigrams, 0) <= 0.3
      |    AND n_bullet / nullif(n_lines, 0) <= 0.5""".stripMargin


  /** Jaccard-0.8 near-duplicate DROP set over [[shinglePairsDuck]]'s
    * `pairs`/`sizes` (the higher doc_id of each qualifying pair) —
    * [[nearDropSet]]'s mirror, shared by dd_dedup_keep, the clean-corpus
    * gate, and the curation funnel. */
  private[analytics] def nearDropsDuck: String =
    """drops AS (
      |  SELECT DISTINCT ib FROM pairs
      |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
      |  WHERE common / (sa.n + sb.n - common) >= 0.8)""".stripMargin


  /** Exact-dedup canonical keeper set (min doc_id per identical-text md5
    * group) — [[exactKeepFlag]]'s mirror, ONE definition of the
    * canonicalization shared by txt_clean_corpus and the curation
    * funnel. */
  private[analytics] def exactKeepDuck: String =
    "ex AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text))"


  /** (lang, length-bucket)-blocked shingle→candidate-pair CTE chain
    * (sh0→sh→sizes→rare→capped→pairs, undirected `a.doc_id < b.doc_id`)
    * shared by the Jaccard-family mirrors (dd_ngram_jaccard, dd_dedup_keep,
    * dd_dedup_keep_best, dd_cluster). ONE site for the blocking scheme,
    * [[StopShingleCap]], and the first-4-md5-bytes shingle hash — a drifted
    * copy in any one mirror would silently break only that query's parity. */
  private[analytics] def shinglePairsDuck: String =
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
  private[analytics] def ccClosureDuck: String =
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
  private[analytics] def wideSigStackDuck(sfx: String = ""): String =
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
  private[analytics] def cappedBandsDuck(sfx: String): String =
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
  private[analytics] def bandCandDuck(sfx: String): String =
    s"""cand$sfx AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bands$sfx a JOIN bands$sfx b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin


  /** 64-slice signature-agreement COUNT over `sig` aliases sa/sb — the
    * integer est_sim numerator, exposed separately for the calibration
    * census's exact BIGINT sums ([[wideMatches]]'s mirror). */
  /** The benchmark excerpt windows keyed by item (bx → bwt CTEs) — the
    * Duck twin of DedupOps.benchExcerptWindows, shared by BOTH
    * contamination mirrors so the two directions cannot drift. Expects a
    * `base` CTE in scope. */
  private[analytics] def benchWindowsDuck: String =
    s"""bx AS (
       |  SELECT doc_id AS bench_id, list_slice(toks, 5, 24) AS et
       |  FROM base WHERE doc_id % 89 = 7),
       |bwt AS (
       |  SELECT DISTINCT bench_id,
       |    unnest(list_transform(range(1, greatest(len(et) - 7, 0) + 1),
       |      i -> substr(md5(array_to_string(list_slice(et, i, i + 7), ' ')), 1, 16))) AS bw
       |  FROM bx)""".stripMargin

  private[analytics] def wideMatchesDuck: String =
    s"(${(0 until MinhashWidePerms).map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END").mkString(" + ")})"


  /** 64-slice signature-agreement estimate over `sig` aliases sa/sb —
    * the wide-MinHash est_sim expression shared by the banded-pairs and
    * incremental-probe mirrors. */
  private[analytics] def wideEstSimDuck: String =
    s"$wideMatchesDuck / $MinhashWidePerms.0"


  /** Blocked truth pairs with their integer Jaccard twentieth
    * (`(20·common) // union`) over [[shinglePairsDuck]]'s `pairs`/`sizes`
    * — [[jaccardBins]]' mirror, shared by the recall and calibration
    * census oracles. */
  private[analytics] def jaccardBinsDuck: String =
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
  private[analytics] def bpeRoundsDuck(k: Int): String = {
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
  private[analytics] def classifierScoredDuck: String = {
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
  private[analytics] def packSeqDuck(order: String, sfx: String): String =
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
  private[analytics] lazy val ivfCellChainDuck: String =
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
  private[analytics] def eNrmDuck: String =
    s"""e AS (
       |  SELECT vec_id, embedding, ${dot("embedding", "embedding", 1)} AS nrm
       |  FROM embeddings)""".stripMargin


  /** The k-means-refined quantizer chain (cents0→a0→m0→ rounds →a1→cell1),
    * DuckDB text, requiring `e`/`params` in scope — [[ivfKmeansAssignment]]'s
    * mirror (sampled Lloyd rounds, integer-quantized component sums),
    * hoisted out of the sim_ivf_kmeans entry so the balance census reads
    * the SAME chain. The static SQL unrolls all [[KmRounds]] rounds; the
    * Spark builder's fixed-point early stop is result-identical. */
  private[analytics] def kmCellChainDuck: String =
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
  private[analytics] lazy val annEDuck: String =
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    ${dot("embedding", "embedding", 1)} AS nrm,
       |    ${bucketExpr("embedding", 1)} AS bucket
       |  FROM embeddings)""".stripMargin


  /** Brute-force truth (q → truth): the capped query sample's exact
    * top-5 as (qid, cid) — shared by both recall-census oracles. Requires
    * an `e` CTE with (vec_id, embedding, nrm) in scope. */
  private[analytics] lazy val bruteTruthDuck: String =
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
  private[analytics] lazy val annQHomeDuck: String =
    "SELECT vec_id AS qid, embedding AS qe, nrm AS qn, bucket AS probe " +
      "FROM e WHERE vec_id % 50 = 0"

  private[analytics] lazy val annQMultiDuck: String =
    "SELECT vec_id AS qid, embedding AS qe, nrm AS qn, " +
      s"unnest(([bucket${(0 until MaxPlanes).map(p => s", xor(bucket, ${1 << p})").mkString}])[1:1+(SELECT pl FROM params)]) AS probe " +
      "FROM e WHERE vec_id % 50 = 0"

  private[analytics] lazy val annQProbe2Duck: String =
    "SELECT vec_id AS qid, embedding AS qe, nrm AS qn, " +
      s"unnest(([${probe2Masks(MaxPlanes).map(m => if (m == 0) "bucket" else s"xor(bucket, $m)").mkString(", ")}])[1:(SELECT 1 + pl + (pl*(pl-1))//2 FROM params)]) AS probe " +
      "FROM e WHERE vec_id % 50 = 0"


  /** Exact-ranked LSH candidates for one probing radius (`ranked$sfx`),
    * generic over the probe source — ONE definition for the three base
    * oracles (sfx = "", full output) and the recall census (suffixed,
    * rk<=5 projected). */
  private[analytics] def annRankedDuck(sfx: String, qSrc: String): String =
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
  private[analytics] lazy val ivfPqPairsDuck: String = ivfPqPairsDuckN(PqCodes)


  /** The CTE body generalized over the code width — the codebook CTE keeps
    * first-`nCodes` selection and the ADC lookup stride becomes `nCodes`,
    * exactly mirroring [[ivfPqAdcPairsWith]]. */
  private[analytics] def ivfPqPairsDuckN(nCodes: Int): String =
    s"""$ivfCellChainDuck,
       |${pqChainDuck(nCodes, "")}""".stripMargin


  /** The PQ encode + ADC chain alone (cb→enc→enc_rk→codes→qpart→qtab→
    * pairs, every CTE `sfx`-suffixed), generic over code width and
    * WITHOUT the cell chain — so the code-width recall census can
    * instantiate TWO widths over one shared [[ivfCellChainDuck]].
    * Requires `e`/`cell` in scope. */
  private[analytics] def pqChainDuck(nCodes: Int, sfx: String): String =
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

    "txt_langid" ->
      s"""WITH $baseDuck, $langidScoredDuck
         |SELECT doc_id, lang_label, s_en, s_de, s_es, s_fr,
         |  $argmaxCase AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin,

    // row-normalized confusion matrix over the same scored fragment;
    // sum() over BIGINT yields HUGEINT in DuckDB, hence the CASTs
    "txt_langid_confusion" ->
      s"""WITH $baseDuck, $langidScoredDuck,
         |pred AS (SELECT lang_label, $argmaxCase AS pred_lang FROM scored),
         |cm AS (SELECT lang_label, pred_lang, count(*) AS n
         |  FROM pred GROUP BY lang_label, pred_lang)
         |SELECT lang_label, pred_lang, n,
         |  CAST(sum(n) OVER (PARTITION BY lang_label) AS BIGINT) AS n_true,
         |  n / CAST(sum(n) OVER (PARTITION BY lang_label) AS BIGINT) AS frac
         |FROM cm ORDER BY lang_label, pred_lang""".stripMargin,

    "txt_pii" ->
      s"""WITH $piiScoredDuck
         |SELECT doc_id, n_urls, n_emails, n_phones, n_ips,
         |  md5(clean) AS clean_fp,
         |  CAST(length(raw) - length(clean) AS BIGINT) AS chars_redacted
         |FROM pii_s ORDER BY doc_id""".stripMargin,

    "txt_pii_census" ->
      s"""WITH $piiScoredDuck
         |SELECT coalesce(source, '*') AS source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE n_urls + n_emails + n_phones + n_ips > 0) AS BIGINT) AS n_docs_pii,
         |  CAST(sum(n_urls) AS BIGINT) AS n_urls,
         |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
         |  CAST(sum(n_phones) AS BIGINT) AS n_phones,
         |  CAST(sum(n_ips) AS BIGINT) AS n_ips,
         |  count(*) FILTER (WHERE n_urls + n_emails + n_phones + n_ips > 0) / count(*) AS pii_doc_frac
         |FROM pii_s GROUP BY ROLLUP(source) ORDER BY source""".stripMargin,

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
         |SELECT $hostOfSql AS host,
         |  count(*) AS n_docs, count(DISTINCT url_norm) AS n_pages,
         |  CAST(count(*) - count(DISTINCT url_norm) AS BIGINT) AS n_dup_docs
         |FROM n GROUP BY 1 ORDER BY host""".stripMargin,

    // batch admission vs the frontier: mod-4 held-out split so planted
    // page-pairs cross it (url_norm is never NULL, so NOT IN is exact).
    // The bucketed-state variant admits the same set by contract — one
    // oracle text for both (the dd_incremental/_bucketed convention).
    "dd_url_incremental" -> urlIncrementalDuck,
    "dd_url_incremental_bucketed" -> urlIncrementalDuck,

    // per-host cap: the window formulation IS the oracle here — DuckDB
    // runs single-node where the skewed sort is harmless; the Spark side
    // under test replaces it with the bounded map-side topk_min aggregate
    "dd_host_cap" ->
      s"""WITH $urlNormDuck,
         |h AS (SELECT doc_id, $hostOfSql AS host FROM n),
         |r AS (SELECT host, doc_id,
         |    row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk,
         |    count(*) OVER (PARTITION BY host) AS n_docs
         |  FROM h)
         |SELECT host, n_docs, least(n_docs, $HostCap) AS n_kept,
         |  greatest(n_docs - $HostCap, 0) AS n_dropped, doc_id AS kept_id
         |FROM r WHERE rk <= $HostCap ORDER BY host, kept_id""".stripMargin,

    // staged admission funnel: flags mirror the family conventions
    // (min-id URL keep, row_number host cap over URL-kept pages, min-id
    // exact keep, Jaccard-0.8 near drops), folded once, 5 UNION'd rows
    "dd_crawl_funnel" ->
      s"""WITH $baseDuck, $urlNormDuck,
         |$crawlFlagsDuck,
         |c AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(count(*) FILTER (WHERE p1) AS BIGINT) AS n1,
         |    CAST(count(*) FILTER (WHERE p2) AS BIGINT) AS n2,
         |    CAST(count(*) FILTER (WHERE p3) AS BIGINT) AS n3,
         |    CAST(count(*) FILTER (WHERE p4) AS BIGINT) AS n4
         |  FROM flags)
         |SELECT CAST(0 AS BIGINT) AS stage_id, 'fetched' AS stage,
         |  n0 AS n_in, n0 AS n_kept, n0 - n0 AS n_dropped, n0 / n0 AS kept_frac FROM c
         |UNION ALL SELECT 1, 'url_dedup',   n0, n1, n0 - n1, n1 / n0 FROM c
         |UNION ALL SELECT 2, 'host_cap',    n1, n2, n1 - n2, n2 / n0 FROM c
         |UNION ALL SELECT 3, 'exact_dedup', n2, n3, n2 - n3, n3 / n0 FROM c
         |UNION ALL SELECT 4, 'near_dedup',  n3, n4, n3 - n4, n4 / n0 FROM c
         |ORDER BY stage_id""".stripMargin,

    // the same flags sliced by source instead of folded to one row
    "dd_funnel_by_source" ->
      s"""WITH $baseDuck, $urlNormDuck,
         |$crawlFlagsDuck
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_fetched,
         |  CAST(count(*) FILTER (WHERE p1) AS BIGINT) AS n_url_kept,
         |  CAST(count(*) FILTER (WHERE p2) AS BIGINT) AS n_host_kept,
         |  CAST(count(*) FILTER (WHERE p3) AS BIGINT) AS n_exact_kept,
         |  CAST(count(*) FILTER (WHERE p4) AS BIGINT) AS n_clean,
         |  count(*) FILTER (WHERE p4) / count(*) AS clean_frac
         |FROM flags GROUP BY source ORDER BY source""".stripMargin,

    // takedown propagation: each state censused independently — the
    // doc-keyed states from one documents pass, the frontier per-URL
    // bool_and, the band state over the capped-band CTE the incremental
    // probe's mirror uses
    "dd_takedown" ->
      s"""WITH $baseDuck, $urlNormDuck, ${wideSigStackDuck()},
         |cb0 AS (
         |  ${wideBandsDuckBranches(s" WHERE doc_id < $IncrementalSplit")}),
         |cb AS (
         |  SELECT doc_id, band, bh FROM (
         |    SELECT doc_id, band, bh,
         |      row_number() OVER (PARTITION BY band, bh ORDER BY doc_id) AS rn
         |    FROM cb0)
         |  WHERE rn <= $IncrementalProbeCap),
         |s_doc AS (
         |  SELECT
         |    CAST(count(*) AS BIGINT) AS c_b,
         |    CAST(count(*) FILTER (WHERE $takedownSql) AS BIGINT) AS c_r,
         |    CAST(count(*) FILTER (WHERE NOT ($takedownSql)) AS BIGINT) AS c_a,
         |    CAST(count(*) FILTER (WHERE doc_id < $IncrementalSplit) AS BIGINT) AS f_b,
         |    CAST(count(*) FILTER (WHERE doc_id < $IncrementalSplit AND ($takedownSql)) AS BIGINT) AS f_r,
         |    CAST(count(*) FILTER (WHERE doc_id < $IncrementalSplit AND NOT ($takedownSql)) AS BIGINT) AS f_a,
         |    CAST(sum(len(toks)) AS BIGINT) AS m_b,
         |    CAST(sum(CASE WHEN $takedownSql THEN len(toks) ELSE 0 END) AS BIGINT) AS m_r,
         |    CAST(sum(CASE WHEN NOT ($takedownSql) THEN len(toks) ELSE 0 END) AS BIGINT) AS m_a
         |  FROM base),
         |s_band AS (
         |  SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(count(*) FILTER (WHERE $takedownSql) AS BIGINT) AS r,
         |    CAST(count(*) FILTER (WHERE NOT ($takedownSql)) AS BIGINT) AS a
         |  FROM cb),
         |s_fr0 AS (SELECT url_norm, bool_and($takedownSql) AS gone
         |  FROM n WHERE doc_id % 4 <> 3 GROUP BY url_norm),
         |s_fr AS (
         |  SELECT CAST(count(*) AS BIGINT) AS b,
         |    CAST(count(*) FILTER (WHERE gone) AS BIGINT) AS r,
         |    CAST(count(*) FILTER (WHERE NOT gone) AS BIGINT) AS a
         |  FROM s_fr0)
         |SELECT CAST(0 AS BIGINT) AS state_id, 'corpus' AS state,
         |  c_b AS n_before, c_r AS n_removed, c_a AS n_after FROM s_doc
         |UNION ALL SELECT 1, 'fingerprints', f_b, f_r, f_a FROM s_doc
         |UNION ALL SELECT 2, 'band_state', b, r, a FROM s_band
         |UNION ALL SELECT 3, 'frontier', b, r, a FROM s_fr
         |UNION ALL SELECT 4, 'shard_manifest', m_b, m_r, m_a FROM s_doc
         |ORDER BY state_id""".stripMargin,

    // snapshot diff: v1/v2 mod-splits + the %7=3 content revision shared
    // verbatim with the Spark side; category off the fp full outer join
    "dd_snapshot_diff" ->
      s"""WITH v1 AS (SELECT doc_id, md5(text) AS fp1 FROM documents WHERE $snapV1Pred),
         |v2 AS (SELECT doc_id, md5($snapRev2Sql) AS fp2 FROM documents WHERE $snapV2Pred),
         |c AS (
         |  SELECT CASE WHEN fp1 IS NULL THEN 'added'
         |              WHEN fp2 IS NULL THEN 'removed'
         |              WHEN fp1 <> fp2 THEN 'changed'
         |              ELSE 'unchanged' END AS category
         |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
         |SELECT category, count(*) AS n_docs,
         |  count(*) / CAST(sum(count(*)) OVER () AS BIGINT) AS frac
         |FROM c GROUP BY category ORDER BY category""".stripMargin,

    "dd_source_overlap" ->
      s"""WITH $baseDuck, $shinglePairsDuck,
         |pr AS (
         |  SELECT ia, ib FROM pairs
         |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
         |  WHERE common / (sa.n + sb.n - common) >= 0.2),
         |lab AS (
         |  SELECT least(da.source, db.source) AS src_a,
         |    greatest(da.source, db.source) AS src_b
         |  FROM pr JOIN documents da ON pr.ia = da.doc_id
         |  JOIN documents db ON pr.ib = db.doc_id)
         |SELECT src_a, src_b, count(*) AS n_pairs
         |FROM lab GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

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
         |$benchWindowsDuck,
         |bench AS (SELECT DISTINCT bw AS w FROM bwt)
         |SELECT doc_id, count(DISTINCT w0.w) AS n_shared_windows
         |FROM w0 JOIN bench ON w0.w = bench.w
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // benchmark-side fold of the same passage semi-join; total row keyed
    // bench_id = -1 carries contaminated_frac (int/int division);
    // bx/bwt = the ONE benchWindowsDuck construction shared with the
    // dd_contamination8 mirror
    "dd_contamination_rate" ->
      s"""WITH $baseDuck, w0 AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(toks) - 7, 0) + 1),
         |      i -> substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 16))) AS w
         |  FROM base),
         |$benchWindowsDuck,
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
         |  CASE WHEN count(*) > 0
         |    THEN count(*) FILTER (WHERE leaked) / count(*) END FROM per
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
         |    $sourceRateSql AS rate
         |  FROM documents)
         |SELECT doc_id, source, lang, draw, rate
         |FROM m WHERE draw < rate ORDER BY doc_id""".stripMargin,

    // all-BIGINT floor-div chain; weights = the txt_mixture parity
    // convention as integers (even 3 / odd 1); budget = 2x total tokens
    "txt_data_budget" ->
      s"""WITH $baseDuck, $budgetChainDuck
         |SELECT source, weight, n_docs, avail_toks, budget_toks,
         |  (budget_toks * weight) // w_total AS requested_toks,
         |  ((budget_toks * weight) // w_total) // avail_toks AS full_epochs,
         |  ((budget_toks * weight) // w_total) % avail_toks AS rem_toks,
         |  (budget_toks * weight) // w_total > avail_toks AS must_repeat
         |FROM g ORDER BY source""".stripMargin,

    // the plan EXECUTED: per-doc multiplicity, deterministic hash-shuffle
    // partial-epoch prefix, multiplicity-0 docs excluded
    "txt_sample_exec" ->
      s"""WITH $baseDuck, $budgetChainDuck,
         |plan AS (SELECT source,
         |    ((budget_toks * weight) // w_total) // avail_toks AS full_epochs,
         |    ((budget_toks * weight) // w_total) % avail_toks AS rem_toks
         |  FROM g),
         |d AS (SELECT source, doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM base),
         |o AS (SELECT d.source, d.doc_id, d.n_toks, p.full_epochs, p.rem_toks,
         |    CAST(sum(d.n_toks) OVER (PARTITION BY d.source
         |      ORDER BY md5('sample:' || CAST(d.doc_id AS STRING)), d.doc_id) AS BIGINT) AS cum
         |  FROM d JOIN plan p ON d.source = p.source),
         |m AS (SELECT source, doc_id, n_toks,
         |    CAST(full_epochs + CASE WHEN cum - n_toks < rem_toks THEN 1 ELSE 0 END AS BIGINT) AS mult
         |  FROM o)
         |SELECT source, doc_id, n_toks, mult FROM m
         |WHERE mult > 0 ORDER BY source, doc_id""".stripMargin,

    "mm_join" ->
      s"""SELECT d.doc_id, d.lang, d.n_chars, e.label,
         |  ${dot("e.embedding", "e.embedding", 1)} AS nrm
         |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         |ORDER BY d.doc_id""".stripMargin,

    // pair curation: the (2k, 2k+1)-share-image-2k plant, cross-modal
    // cosine through the explicit left-associated dot chain (bit-equal
    // to the Spark side's dot_f), LAION 0.28 gate
    "mm_clip_filter" ->
      s"""WITH t AS (
         |  SELECT d.doc_id, d.source, e.embedding AS temb,
         |    d.doc_id - (d.doc_id % 2) AS img_id
         |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |p AS (
         |  SELECT t.source,
         |    (${dot("t.temb", "i.embedding", 1)}) /
         |      sqrt((${dot("t.temb", "t.temb", 1)}) * (${dot("i.embedding", "i.embedding", 1)})) AS cos
         |  FROM t JOIN embeddings i ON t.img_id = i.vec_id)
         |SELECT source, count(*) AS n_pairs,
         |  count(*) FILTER (WHERE cos >= $ClipThresholdSql) AS n_kept,
         |  count(*) FILTER (WHERE cos >= $ClipThresholdSql) / count(*) AS kept_frac
         |FROM p GROUP BY source ORDER BY source""".stripMargin,

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


  private[analytics] def minhashSliceCols: String =
    (0 until 8).map { j =>
      val (h, off) = if (j < 4) ("h1", j) else ("h2", j - 4)
      s"min(substr($h, ${1 + 8 * off}, 8)) AS mh$j"
    }.mkString(", ")


  private[analytics] def minhashSigDuck: String =
    s"""WITH $baseDuck, sh AS (
       |  SELECT doc_id, md5(unnest($shinglesDuck)) AS h1, md5('x' || unnest($shinglesDuck)) AS h2 FROM base)
       |SELECT doc_id, $minhashSliceCols
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin


  /** 64 min-slice aggregates over the 16 seeded digests h0..h15 — the
    * DuckDB mirror of [[buildMinhashWideSig]]'s slicing. */
  private[analytics] def minhashWideSliceCols: String = minhashWideSliceColsN(64)


  private[analytics] def minhashWideSliceColsN(perms: Int): String =
    (0 until perms).map(j => s"min(substr(h${j / 4}, ${1 + 8 * (j % 4)}, 8)) AS mh$j")
      .mkString(", ")


  /** The [[wideBands]] geometry as DuckDB SQL — one UNION ALL branch per
    * band over the named sig CTE, with `pred` appended as a WHERE clause
    * (empty for the whole table). The single mirror of the Spark-side
    * band hash composition. */
  private[analytics] def wideBandsDuckBranches(pred: String, sigName: String = "sig"): String =
    (0 until MinhashWideBands).map(bd =>
      s"SELECT doc_id, $bd AS band, md5(mh${4 * bd} || mh${4 * bd + 1} || mh${4 * bd + 2} || mh${4 * bd + 3}) AS bh FROM $sigName$pred")
      .mkString("\n  UNION ALL ")


  private[analytics] def minhashWideSigDuck: String = minhashWideSigDuckN(64)


  /** The signature-table mirror generalized over permutation count —
    * perms/4 seeded digests, [[minhashWideSliceColsN]] slicing. */
  private[analytics] def minhashWideSigDuckN(perms: Int): String =
    s"""WITH $baseDuck, sh AS (
       |  SELECT doc_id, unnest($shinglesDuck) AS s FROM base),
       |h AS (
       |  SELECT doc_id, ${(0 until perms / 4).map(d => s"md5('w$d:' || s) AS h$d").mkString(", ")}
       |  FROM sh)
       |SELECT doc_id, ${minhashWideSliceColsN(perms)}
       |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
