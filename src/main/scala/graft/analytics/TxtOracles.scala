package graft.analytics

/** DuckDB oracle mirrors for the text-curation (txt_ prefix)
  * family — the per-query entries moved VERBATIM out of the LlmOracles
  * monolith (round 16, same family seams as the round-15 ops split);
  * every shared fragment stays in [[LlmOracles]], reached through the
  * self-type. */
private[analytics] trait TxtOracles {
  this: OpsKernels with TxtOps with DedupOps with SimOps with IngestOps with LlmOracles =>

  private[analytics] lazy val txtOracleMap: Map[String, String] = Map(
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


    // CCNet perplexity buckets over the unigram LM: per-TYPE quantized
    // integer surprisal (the one ln() per type — the 1e-4 grid absorbs
    // libm ulp differences), exact BIGINT sums per doc, exact terciles
    // by (mean, doc_id) row_number — same tok/tf/head chain as txt_rarity
    "txt_lm_score" ->
      s"""WITH $baseDuck, tok AS (
         |  SELECT doc_id, unnest(toks) AS t FROM base),
         |tf AS (
         |  SELECT t, count(*) AS n_t FROM tok GROUP BY t),
         |total AS (
         |  SELECT CAST(sum(n_t) AS BIGINT) AS n_corpus FROM tf),
         |tfhead AS (
         |  SELECT t, n_t FROM tf ORDER BY n_t DESC, t LIMIT $RarityVocabCap),
         |surpr AS (
         |  SELECT t, CAST(round(ln(CAST((SELECT n_corpus FROM total) AS DOUBLE) / n_t) * 10000) AS BIGINT) AS s_t
         |  FROM tfhead),
         |oov AS (
         |  SELECT CAST(round(ln(CAST(n_corpus AS DOUBLE) / 1) * 10000) AS BIGINT) AS s_oov
         |  FROM total),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_toks,
         |    CAST(sum(coalesce(s_t, (SELECT s_oov FROM oov))) AS BIGINT) AS sum_surprisal
         |  FROM tok LEFT JOIN surpr USING (t)
         |  GROUP BY doc_id),
         |rk AS (
         |  SELECT doc_id, n_toks, sum_surprisal,
         |    CAST(sum_surprisal AS DOUBLE) / n_toks / 10000 AS mean_surprisal,
         |    row_number() OVER (ORDER BY CAST(sum_surprisal AS DOUBLE) / n_toks / 10000, doc_id) AS rnk,
         |    count(*) OVER () AS n_docs
         |  FROM scored)
         |SELECT doc_id, n_toks, sum_surprisal, mean_surprisal,
         |  CASE WHEN rnk * 3 <= n_docs THEN 'head'
         |       WHEN rnk * 3 <= n_docs * 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM rk ORDER BY doc_id""".stripMargin)
}
