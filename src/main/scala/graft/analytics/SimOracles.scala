package graft.analytics

/** DuckDB oracle mirrors for the similarity/ANN (sim_ prefix)
  * family — the per-query entries moved VERBATIM out of the LlmOracles
  * monolith (round 16, same family seams as the round-15 ops split);
  * every shared fragment stays in [[LlmOracles]], reached through the
  * self-type. */
private[analytics] trait SimOracles {
  this: OpsKernels with TxtOps with DedupOps with SimOps with IngestOps with LlmOracles =>

  private[analytics] lazy val simOracleMap: Map[String, String] = Map(

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
         |GROUP BY t.qid ORDER BY t.qid""".stripMargin)
}
