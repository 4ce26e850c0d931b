package graft.analytics

/** DuckDB oracle mirrors for the ingestion + multimodal (ingest_ and mm_ prefixes)
  * family — the per-query entries moved VERBATIM out of the LlmOracles
  * monolith (round 16, same family seams as the round-15 ops split);
  * every shared fragment stays in [[LlmOracles]], reached through the
  * self-type. */
private[analytics] trait IngestOracles {
  this: OpsKernels with TxtOps with DedupOps with SimOps with IngestOps with LlmOracles =>

  private[analytics] lazy val ingestOracleMap: Map[String, String] = Map(

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


    // ingestion-health census: the oracle recomputes the per-reason counts
    // from the deterministic damage rule alone — the Spark side must
    // recover exactly that split through the real permissive parser
    "ingest_quarantine" ->
      """SELECT CASE WHEN doc_id % 10 = 3 THEN 'torn_json'
        |            WHEN doc_id % 10 = 5 THEN 'missing_doc_id'
        |            WHEN doc_id % 10 = 7 THEN 'missing_text'
        |            ELSE 'ok' END AS reason, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,


    "mm_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha_hex, source
        |FROM documents ORDER BY doc_id""".stripMargin)
}
