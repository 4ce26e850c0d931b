package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface (SURVEY.md §2.9: the reference has no
  * streaming semantics — this is the driver-facing extension over the
  * `events` shape): watermarked tumbling-window aggregation plus a
  * stateful sessionizer via `flatMapGroupsWithState`.
  *
  * Both transforms take an un-bounded input DataFrame (`readStream` file /
  * kafka / memory source — caller's choice) with schema
  * `(event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,
  * value DOUBLE)` and return streaming DataFrames; tests drive them with
  * `MemoryStream` and a memory sink.
  */
object EventStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(nEvents: Long, sumValue: Double, lastSec: Long)
  case class SessionOut(user_id: Long, n_events: Long, sum_value: Double)

  /** Watermarked 5-minute tumbling-window counts per event_type. Late data
    * beyond 10 minutes is dropped; state is bounded by the watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Stateful gap sessionization (30-minute inactivity) with
    * flatMapGroupsWithState — emits a row when an event arrives more than
    * the gap after the previous one, closing the prior session. (A
    * production variant would add `GroupStateTimeout` to also close idle
    * sessions on a clock; kept timeout-free here so semantics are purely
    * data-driven and deterministic.) */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          // same epoch-nanos reconstruction as the as-of/funnel transforms:
          // ordering matches the batch window's (ts, event_id) down to the
          // nanosecond, and `sec` is the reconstructed ns under the SAME
          // truncating division as q10's `ts div 1000000000` — equal at
          // every epoch, pre-1970 included, because both divide the same
          // nanos value with the same rounding
          def ns(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000) * 1000000000L + t.getNanos
          val events = batch.toSeq.sortBy(e => (ns(e.ts), e.event_id))
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          events.foreach { e =>
            val sec = ns(e.ts) / 1000000000L
            cur match {
              case Some(s) if sec - s.lastSec > 1800 =>
                // HALF_UP, matching Spark's round(col, 2) in the batch
                // sessionization q10 this transform is parity-pinned
                // against (math.rint is HALF_EVEN — the two modes diverge
                // on exact .xx5 sums)
                closed ::= SessionOut(userId, s.nEvents,
                  BigDecimal(s.sumValue).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
                cur = Some(SessionState(1, e.value, sec))
              case Some(s) =>
                cur = Some(SessionState(s.nEvents + 1, s.sumValue + e.value, sec))
              case None =>
                cur = Some(SessionState(1, e.value, sec))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  /** Streaming exact dedup: drops re-deliveries of the same event_id
    * arriving within the watermark horizon — the streaming twin of the
    * batch `dd_exact` operator. `dropDuplicatesWithinWatermark` keys state
    * on event_id and EVICTS it once the watermark passes, so state stays
    * bounded no matter how long the stream runs (a plain `dropDuplicates`
    * on a stream accumulates keys forever — never deploy that at scale). */
  def dedupe(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each incoming event picks up its user's
    * attributes from a static (batch) dimension. Spark broadcast-joins the
    * static side per micro-batch — no stream state at all, and the dim can
    * be refreshed by re-reading between restarts. The streaming twin of the
    * batch star joins (q04/q05). */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** Stream-stream interval join: click events join view events of the
    * same user when the click lands within [0, 10 minutes] AFTER the view
    * — the attribution join, both sides unbounded. Both streams carry
    * watermarks and the join condition carries the time interval, which is
    * what lets Spark EVICT join state: a buffered view can be dropped once
    * the click-side watermark passes view_ts + 10 min, so state is bounded
    * by (rate × interval) instead of growing forever. Without the interval
    * bound (or the watermarks) the state store grows without limit — the
    * stream-stream analogue of the dropDuplicates trap [[dedupe]] avoids. */
  def attributeClicks(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.select(col("event_id").as("view_id"), col("user_id"),
      col("ts").as("view_ts")).withWatermark("view_ts", "10 minutes")
    val c = clicks.select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
      col("ts").as("click_ts"), col("value")).withWatermark("click_ts", "10 minutes")
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"), col("view_ts"), col("click_ts"), col("value"))
  }

  case class PendingView(view_id: Long, ns: Long)
  case class AsofOut(view_id: Long, user_id: Long, next_purchase_id: Long, secs_to_purchase: Long)

  /** Streaming FORWARD as-of attribution — the streaming twin of the
    * batch q37 (`Relational.q37AsofForward`): each view attributes to the
    * user's NEXT purchase, emitted only when conversion lands inside the
    * 3-day horizon. The stateful shape is a per-user PENDING-VIEW buffer:
    * views enqueue; a purchase flushes the whole buffer (it is the first
    * later purchase for everything buffered — earlier purchases already
    * emptied it), emitting the in-horizon views and silently expiring the
    * rest; any event lets views older than the horizon fall out of state;
    * and an EVENT-TIME TIMEOUT (watermark past last-seen + horizon)
    * clears the buffer of a user who never sends another event — without
    * it, one-time users would pin their pending views forever. Clearing
    * on timeout is semantics-preserving: a purchase arriving after the
    * watermark passed lastSeen + horizon is either dropped as late or
    * beyond every buffered view's horizon anyway. Together the two
    * eviction rules bound state at each user's trailing 3 days of views —
    * the flatMapGroupsWithState analogue of the watermark-evicted join
    * buffer in [[attributeClicks]]. The late-data guard (`now >= v.ns`)
    * keeps an out-of-order purchase that predates a buffered view from
    * stealing the attribution the batch ordering would never produce.
    * Arithmetic is epoch-NANOS rebuilt from the Timestamp (getNanos
    * carries the full sub-second), so the horizon compare and the emitted
    * seconds match the batch query's nanosecond `div` bit-for-bit;
    * EventStreamSpec drives chronological micro-batches and pins the sink
    * equal to the oracle-checked q37. */
  def attributeForward(events: Dataset[Event]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val horizonNs = 259200L * 1000000000L
    events.withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[PendingView], AsofOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[List[PendingView]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def ns(t: java.sql.Timestamp): Long =
              Math.floorDiv(t.getTime, 1000) * 1000000000L + t.getNanos
            val sorted = batch.toSeq.sortBy(e => (ns(e.ts), e.event_id))
            var pending = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[AsofOut]
            sorted.foreach { e =>
              val now = ns(e.ts)
              e.event_type match {
                case "view" =>
                  pending = (pending :+ PendingView(e.event_id, now))
                    .filter(v => now - v.ns <= horizonNs)
                case "purchase" =>
                  pending.foreach { v =>
                    val d = now - v.ns
                    if (d >= 0 && d <= horizonNs)
                      out += AsofOut(v.view_id, uid, e.event_id, d / 1000000000L)
                  }
                  pending = Nil
                case _ =>
                  pending = pending.filter(v => now - v.ns <= horizonNs)
              }
            }
            if (pending.isEmpty) state.remove()
            else {
              state.update(pending)
              // evict an idle user's buffer once the watermark proves no
              // attributable purchase can still arrive (ms granularity is
              // fine for a timeout — it only needs to be AT OR AFTER the
              // last moment an in-horizon purchase could be on time)
              val lastMs = sorted.lastOption.map(_.ts.getTime).getOrElse(0L)
              state.setTimeoutTimestamp(lastMs + horizonNs / 1000000L + 1)
            }
            out.result().iterator
          }
      }
  }

  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long], t4: Option[Long])
  case class FunnelOut(user_id: Long, stage: Int, event_type: String, event_id: Long)

  /** Streaming ORDERED FUNNEL — the streaming twin of the batch q40
    * (`Relational.q40Funnel`): emits a row the moment a user FIRST
    * reaches each stage of signup → view → click → purchase, where a
    * stage only counts strictly after the previous one. State is four
    * optional epoch-nanos per user — the minimal funnel memory any
    * engine needs, bounded by |users| independent of stream length, and
    * it must NOT be dropped on completion: a completed user's state is
    * what stops a later signup from re-opening stage 1 (stages are
    * once-per-user, exactly as the batch min-based definition has them).
    * Chronological processing makes first-qualifying equal the batch
    * MIN: stage k's candidate arrives after stage k-1's timestamp is
    * already final, so the first event with ns strictly greater IS the
    * minimum — the same argument, per stage, as [[attributeForward]]'s
    * buffer flush (and the same chronological-drive caveat; epoch-nanos
    * rebuilt from the Timestamp so the strict compare matches the batch
    * `>` bit-for-bit). EventStreamSpec pins the per-stage user counts
    * equal to the oracle-checked q40. */
  def funnelStages(events: Dataset[Event]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val stageOf = Map("signup" -> 1, "view" -> 2, "click" -> 3, "purchase" -> 4)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          def ns(t: java.sql.Timestamp): Long =
              Math.floorDiv(t.getTime, 1000) * 1000000000L + t.getNanos
          val sorted = batch.toSeq.sortBy(e => (ns(e.ts), e.event_id))
          var s = state.getOption.getOrElse(FunnelState(None, None, None, None))
          val out = List.newBuilder[FunnelOut]
          sorted.foreach { e =>
            stageOf.get(e.event_type).foreach { k =>
              val now = ns(e.ts)
              // stage 1 is unconstrained (every real ns > MinValue)
              val prev = k match {
                case 1 => Some(Long.MinValue)
                case 2 => s.t1
                case 3 => s.t2
                case _ => s.t3
              }
              val unreached = (k match {
                case 1 => s.t1; case 2 => s.t2; case 3 => s.t3; case _ => s.t4
              }).isEmpty
              if (unreached && prev.exists(now > _)) {
                s = k match {
                  case 1 => s.copy(t1 = Some(now))
                  case 2 => s.copy(t2 = Some(now))
                  case 3 => s.copy(t3 = Some(now))
                  case _ => s.copy(t4 = Some(now))
                }
                out += FunnelOut(uid, k, e.event_type, e.event_id)
              }
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  /** Streaming INGESTION dedup — the streaming twin of the batch
    * incremental dedup (`LlmOps.ddIncremental` / the bucketed driver-path
    * variant): each micro-batch of incoming documents is content-
    * fingerprinted and LEFT ANTI joined against the static corpus
    * fingerprint state, so already-ingested content never re-enters the
    * corpus. The static side is the same bucketed fingerprint table the
    * batch path maintains — it re-reads per micro-batch (refreshable
    * between restarts), needs no stream state at all, and at scale the
    * bucket layout keeps the per-batch anti-join from ever re-shuffling
    * the corpus side. Duplicates WITHIN one micro-batch are the
    * upstream's concern (compose with [[dedupe]] keyed on fp). */
  def dedupeAgainstCorpus(docs: DataFrame, corpusFps: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .join(corpusFps, Seq("fp"), "left_anti")

  /** Streaming URL-GATE twin — the in-stream counterpart of the batch
    * URL-stage dedup (`LlmOps.ddUrl`), completing the streaming admission
    * triad (exact fingerprint, near-dup LSH, and now the cheapest gate of
    * all): each arriving fetch's URL is normalized with the SAME shared
    * fragment the batch gate uses (`LlmOps.urlNormSql` — scheme, `www.`,
    * case, query, fragment, trailing slash erased) and LEFT ANTI joined
    * against the static crawl-frontier state (the normalized URLs already
    * fetched), so a re-crawl of a known page is refused before its
    * CONTENT is ever hashed — in a real crawler this runs on the URL
    * manifest alone, ahead of the fetch itself. Stateless like
    * [[dedupeAgainstCorpus]]: the frontier re-reads per micro-batch
    * (refreshable between restarts), no stream state at all; duplicates
    * WITHIN one micro-batch are the upstream's concern (compose with
    * [[dedupe]] keyed on url_norm). Input schema (doc_id, url); the
    * admitted rows keep both plus the normalized key for the write-back
    * that extends the frontier. */
  def urlDedupeAgainstFrontier(fetches: DataFrame, frontier: DataFrame): DataFrame = {
    import graft.analytics.LlmOps
    fetches
      .withColumn("url_norm", expr(LlmOps.urlNormSql))
      .join(frontier, Seq("url_norm"), "left_anti")
  }


  /** Streaming OPT-OUT gate — the governance head of the streaming
    * admission chain (`LlmOps.ddOptout` / crawlFlags p1 is the batch
    * twin): each arriving fetch's URL is normalized with the SAME shared
    * fragment as every other gate, its host extracted with the SAME
    * `hostOfSql` fragment, and fetches on a host in the
    * `LlmOps.optoutHostsSql` policy list are REFUSED — before the
    * frontier is consulted, before any quota is spent, before content is
    * hashed, which is the compliance ordering a crawler must honor (a
    * disallowed host's pages are never fetched at all). Stateless like
    * the URL gate: the policy list is a literal (in production a small
    * broadcast table, refreshable between restarts), no stream state;
    * admitted rows keep (doc_id, url, url_norm, host) so the chain's
    * later stages ([[urlDedupeAgainstFrontier]], [[hostCapAdmission]])
    * compose directly. EventStreamSpec pins the three-stage composition
    * equal to the batch gate order on an all-hosts planted corpus. */
  def optoutGate(fetches: DataFrame): DataFrame = {
    import graft.analytics.LlmOps
    fetches
      .withColumn("url_norm", expr(LlmOps.urlNormSql))
      .withColumn("host", expr(LlmOps.hostOfSql))
      .filter(!expr(s"host IN ${LlmOps.optoutHostsSql}"))
  }

  case class NearDupVerdict(doc_id: Long, match_id: Option[Long],
                            est_sim: Option[Double], kept: Boolean)

  /** Streaming NEAR-dup ingestion — the streaming twin of the batch
    * `LlmOps.ddIncrementalNear`, closing the admission-consistency gap
    * between the two paths: [[dedupeAgainstCorpus]] anti-joins exact
    * fingerprints only, so an in-stream pipeline would admit near-
    * re-crawls (ads/timestamps changed, content the same) that the batch
    * probe later rejects. Each arriving document's 64-slice wide-MinHash
    * signature is computed ROW-LOCALLY (`LlmOps.withWideSigPerRow` — the
    * same seeded digests, slicing, and min as the batch signature table,
    * evaluable in a stateless streaming select), its 16 band hashes
    * probe the static capped corpus band state (`LlmOps
    * .nearDupCorpusState`, re-read per micro-batch like the fingerprint
    * state), and the per-doc best match collapses in a
    * flatMapGroupsWithState reducer — stream-native argmax, since a
    * streaming frame allows neither window functions nor append-mode
    * aggregation. Verdicts are per-doc and depend only on the corpus
    * state, so they are IDENTICAL however the batch is micro-batched —
    * EventStreamSpec pins the accumulated sink equal to the
    * oracle-checked batch probe on the same split.
    *
    * PRECONDITION — distinct arrivals: the reducer collapses duplicates
    * only WITHIN a micro-batch (no cross-batch state is kept), so a
    * doc_id that re-arrives in a LATER micro-batch emits a second
    * verdict, where the batch twin emits exactly one row per doc. The
    * "identical however micro-batched" claim therefore holds for any
    * micro-batching of DISTINCT arrivals; a deployment whose upstream
    * can re-deliver should key its sink by doc_id (idempotent upsert) or
    * front this with [[dedupe]] keyed on doc_id within the watermark.
    * State is never
    * stored (the group exists only to reduce within the micro-batch);
    * per arriving doc the work is ≤ bands × cap candidates regardless
    * of corpus size — the batch probe's bound, kept in-stream. */
  def nearDedupeAgainstCorpus(docs: DataFrame, corpusState: DataFrame): Dataset[NearDupVerdict] = {
    import docs.sparkSession.implicits._
    import graft.analytics.LlmOps
    val sigd = LlmOps.withWideSigPerRow(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("sig"),
        explode(LlmOps.wideBandsPerRow(col("sig"))).as("b"))
      .select(col("doc_id"), col("sig"),
        col("b.band").as("band"), col("b.bh").as("bh"))
    val cs = corpusState.select(Seq(col("ib"), col("band").as("cband"),
      col("bh").as("cbh")) ++ (0 until 64).map(j => col(s"mh$j")): _*)
    val cands = sigd.join(cs,
        col("band") === col("cband") && col("bh") === col("cbh"), "left")
      .select(col("doc_id"), col("ib"),
        when(col("ib").isNotNull, LlmOps.wideEstSimPerRow(col("sig"))).as("est"))
      .as[(Long, Option[Long], Option[Double])]
    cands.groupByKey(_._1)
      .flatMapGroupsWithState[Int, NearDupVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (docId: Long, rows: Iterator[(Long, Option[Long], Option[Double])],
         state: GroupState[Int]) =>
          // the group only reduces within the micro-batch — no state kept
          val cands = rows.collect { case (_, Some(ib), Some(e)) => (ib, e) }.toSeq
          val best = if (cands.isEmpty) None
            else Some(cands.minBy { case (ib, e) => (-e, ib) }) // est desc, id asc
          Iterator.single(NearDupVerdict(docId, best.map(_._1), best.map(_._2),
            kept = best.forall(_._2 < 0.5)))
      }
  }

  case class ServeHit(qid: Long, rk: Int, cid: Long, cos: Double)

  /** Streaming ANN SERVE — the similarity family's streaming twin,
    * closing the last family without one: arriving query vectors probe
    * the STATIC IVF serve index per micro-batch, verdicts pinned equal to
    * the oracle-checked batch `LlmOps.simIvfServe`. Three stages, only
    * the last stateful:
    *
    * 1. CELL ASSIGNMENT, row-local: the k centroids arrive packed as ONE
    *    static row (collect_list sorted by cent_id), and an `aggregate`
    *    higher-order fold picks the best cell. The fold's dot product —
    *    `zip_with` double-casts then left-to-right double accumulation
    *    from 0.0 — reproduces the `dot_f` kernel's arithmetic EXACTLY
    *    (same widening, same order), and the strict `>` over ascending
    *    cent_id reproduces the batch argmax's (cos desc, cent_id) tie
    *    rule, so stream and batch assign every query to the same cell
    *    bit-for-bit. A window (the batch formulation) is unavailable in a
    *    streaming frame; this is its stream-native equal. k × dim doubles
    *    per arriving row — the serve-path cost, independent of index
    *    size.
    * 2. CANDIDATE SCAN: stream-static equi-join on the assigned cell
    *    against the corpus cell table (the memoized serve-index state,
    *    re-read per micro-batch like every static state here); per
    *    candidate, the exact cosine through the same codegen'd dot_f.
    * 3. TOP-5: a stateless flatMapGroupsWithState reducer per query
    *    (the near-dup probe's pattern — no state kept, the group exists
    *    to reduce within the micro-batch; per query the work is one
    *    cell's occupancy). Distinct-arrival precondition as there.
    *
    * `queries`: streaming (vec_id, embedding ARRAY<FLOAT>); `cents`:
    * static (cent_id, cemb, cnrm); `corpus`: static (cid, ce, cn,
    * ccell). */
  def annServe(queries: DataFrame, cents: DataFrame, corpus: DataFrame): Dataset[ServeHit] = {
    import queries.sparkSession.implicits._
    import graft.analytics.LlmOps.dotF
    val packed = cents
      .agg(sort_array(collect_list(struct(col("cent_id"), col("cemb"), col("cnrm"))))
        .as("cents"))
      .withColumn("one", lit(1))
    // each cosine computed ONCE (transform), then a strict-> fold over the
    // ascending-cent_id structs — the (cos desc, cent_id asc) argmax.
    // PRECONDITION (bit-exact parity): centroid AND query norms are
    // nonzero (serveCentroids draws centroids from corpus vectors; real
    // embeddings are non-degenerate) — a zero norm on either side yields
    // NaN cosines, which `>` never selects while the batch window's
    // NaN-first DESC order would. A query whose cosines are ALL NaN
    // keeps the (-2.0, -1) sentinel cell, joins no corpus cell below,
    // and surfaces as an EXPLICIT rejected verdict (rk 0, cid -1,
    // cos NaN) rather than silently disappearing from the stream.
    val dotC = "aggregate(zip_with(embedding, c.cemb, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val bestSql =
      s"""aggregate(
         |  transform(cents, c -> named_struct(
         |    'cos', $dotC / sqrt(qn * c.cnrm), 'cell', c.cent_id)),
         |  named_struct('cos', CAST(-2.0 AS DOUBLE), 'cell', CAST(-1 AS BIGINT)),
         |  (acc, s) -> CASE WHEN s.cos > acc.cos THEN s ELSE acc END)""".stripMargin
    // LEFT join: a degenerate query (sentinel cell -1, or a cell with no
    // members) still reaches the reducer, which emits the explicit
    // rejected verdict — loud, not lost.
    val cands = queries
      .withColumn("qn", dotF(col("embedding"), col("embedding")))
      .withColumn("one", lit(1))
      .join(broadcast(packed), Seq("one"))
      .withColumn("cell", expr(bestSql).getField("cell"))
      .join(corpus, col("cell") === col("ccell"), "left")
      .select(col("vec_id").as("qid"), col("cid"),
        when(col("cid").isNotNull,
          dotF(col("embedding"), col("ce")) / sqrt(col("qn") * col("cn"))).as("cos"))
      .as[(Long, Option[Long], Option[Double])]
    cands.groupByKey(_._1)
      .flatMapGroupsWithState[Int, ServeHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (qid: Long, rows: Iterator[(Long, Option[Long], Option[Double])],
         state: GroupState[Int]) =>
          // Spark's DESC double ordering puts NaN FIRST; Scala's default
          // negate-and-sort would put it last — use the explicit reversed
          // TotalOrdering so a NaN cosine ranks exactly as the batch
          // window does
          val hits = rows.collect { case (_, Some(cid), Some(cos)) => (cid, cos) }.toSeq
          if (hits.isEmpty)
            // rejected-query marker: rk 0 never collides with real ranks
            Iterator.single(ServeHit(qid, 0, -1L, Double.NaN))
          else hits
            .sortBy { case (cid, cos) => (cos, cid) }(
              Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long))
            .take(5).zipWithIndex
            .map { case ((cid, cos), i) => ServeHit(qid, i + 1, cid, cos) }.iterator
      }
  }

  /** Streaming RETRAIN-DECISION twin (census half) — the last
    * serve-lifecycle member without a streaming analogue: the retrain
    * decision ([[graft.analytics.LlmOps.simIvfRetrain]]) is an occupancy
    * census over the frozen corpus plus arriving INSERTS, and the insert
    * side is a natural complete-mode aggregation. Each arriving vector is
    * assigned its serve cell ROW-LOCALLY — [[annServe]]'s packed-centroid
    * broadcast fold, same dot arithmetic, same strict-> ascending-cent_id
    * tie-break, so cells are identical to the batch serveInsertAssign's
    * window argmax — and the stream state is the k-row per-cell insert
    * count, re-published whole each micro-batch (the decision's input is
    * the CURRENT census, so complete mode is the correct output
    * semantics, as with the takedown ledger). State cost: one long per
    * cell, O(k), never insert volume. Input schema (vec_id, embedding);
    * `cents` is [[graft.analytics.LlmOps.serveCentroids]]'
    * (cent_id, cemb, cnrm) frame. */
  def retrainInsertCensus(inserts: DataFrame, cents: DataFrame): DataFrame =
    assignInsertCells(inserts, cents)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_inserted"))


  /** Row-local serve-cell assignment of arriving inserts — the shared
    * map-side head of [[retrainInsertCensus]] and [[retrainLloydSums]]
    * (annServe's packed-centroid broadcast fold, same dot arithmetic,
    * same strict-> ascending-cent_id tie-break, so cells are identical
    * to the batch serveInsertAssign's window argmax). Zero-norm guard
    * (the annServe/retrainReassign convention): qn = 0 makes every
    * cosine NaN, so the fold keeps its (-2.0, -1) seed — previously that
    * sentinel leaked into the census as a phantom cell indistinguishable
    * from real occupancy. Cell -1 is a DELIBERATE diagnostic bucket:
    * degenerate inserts are counted there loudly (no-silent-drops),
    * [[retrainDecision]] excludes it from the drift signals, and the
    * Lloyd-sum composer excludes it from the centroid update — a corrupt
    * arrival can neither trigger/mask a re-train nor move a centroid.
    * Output: (cell, embedding) plus the input columns. */
  private def assignInsertCells(inserts: DataFrame, cents: DataFrame): DataFrame = {
    import graft.analytics.LlmOps.dotF
    val packed = cents
      .agg(sort_array(collect_list(struct(col("cent_id"), col("cemb"), col("cnrm"))))
        .as("cents"))
      .withColumn("one", lit(1))
    val dotC = "aggregate(zip_with(embedding, c.cemb, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val bestSql =
      s"""aggregate(
         |  transform(cents, c -> named_struct(
         |    'cos', $dotC / sqrt(qn * c.cnrm), 'cell', c.cent_id)),
         |  named_struct('cos', CAST(-2.0 AS DOUBLE), 'cell', CAST(-1 AS BIGINT)),
         |  (acc, s) -> CASE WHEN s.cos > acc.cos THEN s ELSE acc END)""".stripMargin
    inserts
      .withColumn("qn", dotF(col("embedding"), col("embedding")))
      .withColumn("one", lit(1))
      .join(broadcast(packed), Seq("one"))
      .withColumn("cell", when(col("qn") > 0, expr(bestSql).getField("cell"))
        .otherwise(lit(-1L)))
  }


  /** Streaming RETRAIN-EXECUTION twin (Lloyd-sum half) — closes the last
    * serve-lifecycle member without a streaming analogue. The execution's
    * only insert-dependent input is the per-(cell, pos) QUANTIZED
    * component sums, and integer sums are exactly what a complete-mode
    * streaming aggregation can accumulate losslessly: each arriving
    * vector is cell-assigned row-locally ([[assignInsertCells]], identical
    * cells to the batch serveInsertAssign), then folded into the SAME
    * [[graft.analytics.LlmOps.lloydPosSums]] projection the batch
    * centroid update runs — one streaming aggregation, O(k·dim) state,
    * never insert volume. The re-assignment pass itself stays a batch
    * boundary by design (it must scan every CORPUS member against the
    * final centroids — a full-index pass no per-arrival operator can
    * amortize); [[graft.analytics.LlmOps.simIvfRetrainExecFromSums]]
    * composes the drained sums with the corpus sums by plain integer
    * addition — bit-equal to the batch one-pass union sum — and
    * EventStreamSpec pins the composed execution row-for-row equal to
    * the oracle-checked sim_ivf_retrain_exec. */
  def retrainLloydSums(inserts: DataFrame, cents: DataFrame): DataFrame =
    graft.analytics.LlmOps.lloydPosSums(
      assignInsertCells(inserts, cents).select(col("cell"), col("embedding")))

  /** Batch-side composition of the retrain DECISION from the drained
    * insert census and the static per-cell corpus occupancy (the
    * [[ledgerWithSeeds]] move — Structured Streaming cannot hold a
    * static aggregate inside a complete-mode agg): full-outer on cell,
    * zero-seeded counts, then the SAME drift signals and thresholds as
    * the batch [[graft.analytics.LlmOps.simIvfRetrain]] (window
    * aggregates over the k-row census, frac_inserted >= 0.2 or
    * skew >= 2.0) — row-for-row comparable, which EventStreamSpec pins
    * against the oracle-checked batch census. `corpusOcc` schema
    * (cell, n_corpus). */
  def retrainDecision(drained: DataFrame, corpusOcc: DataFrame): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    // cell -1 is the census's zero-norm diagnostic bucket (see
    // retrainInsertCensus): its row is PUBLISHED (the drop stays visible)
    // but excluded from every drift aggregate — a degenerate arrival has
    // no meaningful cell, so it must neither inflate frac_inserted nor
    // count as a cell in the skew denominator. With no diagnostic row
    // present the conditional sums equal the plain ones, so parity with
    // the batch simIvfRetrain (which never emits -1) is unchanged.
    val real = col("cell") >= 0L
    corpusOcc.join(drained, Seq("cell"), "full_outer")
      .withColumn("n_corpus", coalesce(col("n_corpus"), lit(0L)))
      .withColumn("n_inserted", coalesce(col("n_inserted"), lit(0L)))
      .withColumn("n_total", col("n_corpus") + col("n_inserted"))
      .withColumn("g_total", sum(when(real, col("n_total"))).over(wAll))
      .withColumn("g_ins", sum(when(real, col("n_inserted"))).over(wAll))
      .withColumn("g_cells", count(when(real, lit(1))).over(wAll))
      .withColumn("g_max", max(when(real, col("n_total"))).over(wAll))
      .withColumn("frac_inserted", col("g_ins") / col("g_total"))
      .withColumn("skew", (col("g_max") * col("g_cells")) / col("g_total"))
      .withColumn("retrain", col("frac_inserted") >= 0.2 || col("skew") >= 2.0)
      .select(col("cell"), col("n_corpus"), col("n_inserted"), col("n_total"),
        col("frac_inserted"), col("skew"), col("retrain"))
      .orderBy(col("cell"))
  }

  /** LATE-DATA loss census — the one streaming loss mode the family had
    * no accounting for: rows arriving behind the watermark are dropped
    * BEFORE the stateful operator, so they appear in no sink and no
    * census row. Spark meters exactly that drop per micro-batch
    * (`numRowsDroppedByWatermark` on each stateful operator's progress);
    * this folds the query's progress history into the one number an
    * ingestion dashboard alarms on — the no-silent-drops rule
    * (quarantine census, cap accounting) applied to event time. Bounded
    * by the progress retention window (`spark.sql.streaming
    * .numRecentProgressUpdates`, default 100 micro-batches); a deployment
    * accumulates the per-batch values into its metrics store instead.
    * EventStreamSpec plants late arrivals and pins the admitted windows
    * equal to a batch recomputation minus exactly the planted rows, with
    * this census equal to the planted count. */
  def lateDrops(q: StreamingQuery): Long =
    q.recentProgress.map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum


  /** Wire a streaming DataFrame to a memory sink for tests/demos. */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  /** Streaming INGESTION-HEALTH twin — the in-stream counterpart of the
    * oracle-checked batch `LlmOps.ingestQuarantine`: without it, a
    * streaming pipeline ingesting permissive JSONL would drop torn lines
    * SILENTLY (the one loss mode the batch quarantine exists to make
    * measurable). Each raw line is classified with the SAME
    * [[graft.sources.JsonlDocs]] admission predicate and reason
    * classifier the batch path uses — a stateless per-row select, so the
    * verdicts cannot drift between the two engines' ingestion — then the
    * per-reason counts aggregate in COMPLETE output mode: the running
    * state is the O(reasons) census itself (4 rows), bounded at any
    * stream length, and every micro-batch's emitted table is the
    * accumulated health readout a dashboard polls. EventStreamSpec pins
    * the accumulated census over micro-batched planted damage equal to
    * the batch oracle row set. */
  def quarantineCensus(lines: DataFrame): DataFrame = {
    import graft.sources.JsonlDocs
    lines
      .filter(trim(col("value")) =!= "")
      .withColumn("j", from_json(col("value"), JsonlDocs.schema))
      .select(when(JsonlDocs.okCol(col("j")), lit("ok"))
        .otherwise(JsonlDocs.reasonCol(col("j"))).as("reason"))
      .groupBy(col("reason")).agg(count(lit(1)).as("n"))
  }

  /** Streaming PII CENSUS — the batch `LlmOps.txtPiiCensus` run as a
    * complete-mode aggregation over arriving documents: the identical
    * scan-side scoring fragment ([[graft.analytics.LlmOps.piiScoredOver]]
    * — pure per-row projection, so it lifts into a stream unchanged)
    * feeds a per-source census whose state IS the O(sources) table, like
    * [[quarantineCensus]]. Every micro-batch's emitted table is the
    * accumulated PII-rate readout per source; the batch twin's '*' rollup
    * row is the one thing complete mode can't express (no rollup on
    * streaming aggregations) — EventStreamSpec pins the accumulated
    * per-source rows equal to the oracle-checked batch census minus that
    * total row. Input schema (doc_id, source, text). */
  def piiCensus(docs: DataFrame): DataFrame = {
    import graft.analytics.LlmOps
    LlmOps.piiScoredOver(docs)
      .groupBy(col("source"))
      .agg(LlmOps.piiCensusAggs.head, LlmOps.piiCensusAggs.tail: _*)
      .withColumn("pii_doc_frac", col("n_docs_pii") / col("n_docs"))
  }

  /** Streaming CLIP-gate admission — the multimodal family's streaming
    * twin (the last family without one): arriving image-text pairs
    * (doc_id, source) are scored against the static embedding table with
    * the SAME shared pair-derivation/cosine kernel the batch census
    * aggregates ([[graft.analytics.LlmOps.clipScored]] — two stream-static
    * id-equi joins + the codegen'd dot product, all stateless), and each
    * pair gets an explicit admit/cut verdict at the LAION threshold. A
    * captioning pipeline runs this at ingest so mismatched pairs never
    * reach the corpus; the batch `mm_clip_filter` is the census of the
    * same gate. EventStreamSpec pins every verdict equal to a batch
    * recompute and the accumulated per-source admitted counts equal to
    * the oracle-checked census. Input schema (doc_id, source). */
  def clipAdmission(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    import graft.analytics.LlmOps
    LlmOps.clipScored(docs, embeddings)
      .select(col("doc_id"), col("source"), col("cos"),
        (col("cos") >= expr(LlmOps.ClipThresholdSql)).as("admitted"))
  }

  /** Streaming TAKEDOWN LEDGER — the right-to-be-forgotten sweep
    * (`LlmOps.ddTakedown`) run as requests ARRIVE instead of as a batch
    * pass: each micro-batch of takedown requests (doc_id rows) joins the
    * static per-row state layout
    * ([[graft.analytics.LlmOps.takedownDocStateRows]] — built from the
    * same kernels the batch census aggregates) and accumulates per-state
    * REMOVED units in complete mode. The running state is the O(states)
    * ledger itself (4 rows), bounded at any request volume, and every
    * micro-batch's emitted table is the cumulative deletion accounting a
    * compliance dashboard polls; after the full list drains it equals the
    * batch census's n_removed column exactly (EventStreamSpec pins it).
    * The url-keyed frontier needs all-holders semantics and cross-batch
    * per-URL state — that is the separate [[frontierTakedown]].
    *
    * Re-delivery is ENFORCED away, not assumed: a streaming
    * `dropDuplicates(doc_id)` ahead of the join swallows any re-delivered
    * request across micro-batches (at-least-once transports re-deliver;
    * a double-counted deletion ledger overstates compliance). Its state
    * is one entry per REQUESTED doc — bounded by the takedown list, never
    * the corpus. A state the drained requests never touch emits no row
    * (streaming can't union a static seed into the stream); dashboards
    * wanting the fixed 4-row ledger apply [[ledgerWithSeeds]] at
    * read-back. Input schema (doc_id). */
  def takedownCensus(requests: DataFrame, docStateRows: DataFrame): DataFrame =
    requests.dropDuplicates("doc_id")
      .join(docStateRows, "doc_id")
      .groupBy(col("state_id"), col("state"))
      .agg(sum(col("w")).as("n_removed"))

  /** Read-back seeding for the [[takedownCensus]] ledger: left-join the
    * drained (complete-mode) sink onto the full state dimension so every
    * doc-keyed state publishes a row even when zero of its units were
    * removed — row-for-row comparable with the batch [[ddTakedown]]
    * census, whose aggregation always emits all states. Batch-side (runs
    * on the sink table, not inside the stream) because Structured
    * Streaming cannot preserve a static side into a streaming result. */
  def ledgerWithSeeds(drained: DataFrame, docStateRows: DataFrame): DataFrame =
    docStateRows.select(col("state_id"), col("state")).distinct()
      .join(drained, Seq("state_id", "state"), "left")
      .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))

  /** Streaming SNAPSHOT-DIFF twin — the incremental half of the batch
    * [[graft.analytics.LlmOps.ddSnapshotDiff]] (the last batch family
    * without a streaming analogue): each arriving v2 fetch (doc_id, text)
    * is classified against the STATIC v1 fingerprint table the previous
    * crawl published — `added` (no v1 row), `changed` (fingerprint
    * differs), `unchanged` — with the same md5-content-fingerprint
    * convention, computed in the projection so only (doc_id, fp) reaches
    * the join. Stateless stream-static LEFT join: verdicts ship in append
    * mode the moment a fetch lands, and the drained verdict census equals
    * the batch diff's added/changed/unchanged rows exactly
    * (EventStreamSpec pins it on the planted mod-7 corpus).
    *
    * BOUNDARY (documented, structural): `removed` is undecidable
    * mid-crawl — a v1 doc with no v2 fetch YET is indistinguishable from
    * one v2 will never fetch; only the batch full-outer pass over the
    * COMPLETED v2 snapshot can close that category. A deployment runs
    * this gate during the crawl and the batch diff once the crawl ends.
    * Input schema (doc_id, text); v1 state schema (doc_id, fp1). */
  def snapshotDiff(fetches: DataFrame, v1Fp: DataFrame): DataFrame =
    fetches.select(col("doc_id"), md5(col("text")).as("fp2"))
      .join(v1Fp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("category"))

  case class FrontierRemoval(url_norm: String, n_holders: Long, last_doc: Long)

  /** Per-URL takedown progress for [[frontierTakedown]]: the tombstoned
    * holder doc_ids seen so far while the URL is pending, collapsing to
    * an O(1) tombstone (`done=true`, empty seen) the moment the last
    * holder lands — completed URLs cost one boolean forever, pending ones
    * cost their holder set (bounded by the URL's holder count, never
    * fetch volume). */
  case class FrontierState(done: Boolean, seen: Seq[Long])

  /** Streaming FRONTIER takedown — the one takedown state the stateless
    * ledger cannot express: a normalized URL leaves the crawl frontier
    * only when EVERY fetch that contributed it is taken down (the batch
    * census's bool_and), and the holders may be tombstoned in DIFFERENT
    * micro-batches. Arriving requests join the static holder graph
    * ([[graft.analytics.LlmOps.takedownFrontierHolders]] — each holder
    * row carries its URL's total holder count), then per-URL state counts
    * tombstoned holders — a [[FrontierState]] seen-set per URL ever named
    * by a request (O(requested URLs), never fetch volume) — emitting the
    * removal event exactly once, in the micro-batch where the LAST
    * holder arrives — so a URL with a surviving holder keeps refusing
    * re-crawls, and the crawler can drop it the moment it may.
    *
    * Re-delivery is ENFORCED away, not assumed: an arriving doc_id
    * already in the URL's seen-set (or duplicated within one batch) is
    * ignored, so the count reaches n_holders only when every holder is
    * GENUINELY tombstoned. On completion the state collapses to an O(1)
    * tombstone rather than `state.remove()` — a removed entry would
    * forget the URL completed, and a re-delivered holder arriving after
    * completion would then re-emit the removal (breaking this function's
    * exactly-once contract); the tombstone refuses it for the cost of
    * one boolean. Input schema (doc_id). */
  def frontierTakedown(requests: DataFrame, holders: DataFrame): Dataset[FrontierRemoval] = {
    import requests.sparkSession.implicits._
    requests.join(holders, "doc_id")
      .select(col("url_norm"), col("doc_id"), col("n_holders"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FrontierState, FrontierRemoval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (url: String, rows: Iterator[(String, Long, Long)], state: GroupState[FrontierState]) =>
          val st = state.getOption.getOrElse(FrontierState(done = false, Nil))
          if (st.done) Iterator.empty // completed: any arrival is a re-delivery
          else {
            val rs = rows.toArray
            val total = rs.head._3 // per-URL constant on every holder row
            val seen = st.seen.toSet
            val fresh = rs.map(_._2).distinct.filterNot(seen)
            val after = seen.size + fresh.length
            if (after >= total) {
              state.update(FrontierState(done = true, Nil))
              Iterator(FrontierRemoval(url, total, fresh.max))
            } else {
              state.update(FrontierState(done = false, st.seen ++ fresh))
              Iterator.empty
            }
          }
      }
  }

  case class HostCapVerdict(doc_id: Long, host: String, admitted: Boolean,
    host_admitted: Long, host_dropped: Long)

  /** Per-host quota state for [[hostCapAdmission]]: quota spent so far,
    * the highest doc_id ever verdict-ed — the O(1) re-delivery watermark
    * (fetches replay in doc_id order, so an arrival at or below `maxSeen`
    * is a duplicate that already holds a verdict) — and a counter of
    * arrivals that watermark has dropped. The counter is the
    * observability valve for the watermark's deliberate conflation of
    * re-delivery with out-of-order NEW fetches: under the in-order replay
    * contract every drop is a re-delivery, so an operator who knows the
    * transport's re-delivery rate can detect a VIOLATED contract (drops
    * exceeding it mean new fetches are being silently lost) from the
    * `host_dropped` field each verdict carries — without growing the
    * state beyond O(1) per host. */
  case class HostQuota(spent: Long, maxSeen: Long, dropped: Long)

  /** Streaming per-HOST admission QUOTA — the streaming twin of the batch
    * cap `LlmOps.ddHostCap` and the only admission stage that genuinely
    * needs CROSS-BATCH state: the URL gate, quarantine census, and
    * near-dup probe are all stateless against re-read static state, but
    * "at most [[graft.analytics.LlmOps.HostCap]] fetches per host" must
    * remember how many a host has already spent across every micro-batch
    * of the crawl. State is ONE long per host (O(hosts), bounded by the
    * host universe, never by fetch volume); per micro-batch each host's
    * arrivals are folded in fetch order (doc_id — the crawl sequence) so
    * the quota spends deterministically, and the per-batch sort is
    * bounded by that host's share of the micro-batch, never the corpus.
    *
    * Parity contract: when NEW fetches arrive in doc_id order
    * (chronological replay), the admitted set equals the batch cap's kept
    * set EXACTLY, however the stream is micro-batched: the batch keeps
    * the k smallest doc_ids per host, and an in-order quota admits
    * precisely those. Re-delivery is ENFORCED away, not assumed: the
    * per-host [[HostQuota]] carries the highest doc_id ever verdict-ed,
    * and an arrival at or below it — a transport re-delivery, or a
    * duplicate within one batch — is dropped without spending quota or
    * re-emitting (its verdict already shipped). The watermark deliberately
    * conflates "re-delivered" with "genuinely out-of-order new fetch":
    * under the in-order replay contract the latter cannot occur, and the
    * conflation is what keeps the state O(1) per host instead of a
    * per-host seen-set growing with fetch volume. Every drop INCREMENTS
    * the per-host `dropped` counter, published on each verdict as
    * `host_dropped` — so a violated ordering contract (drops outpacing
    * the transport's known re-delivery rate) is detectable from the
    * output rather than silent (see [[HostQuota]]).
    * EventStreamSpec pins it against the
    * oracle-checked dd_host_cap on the same corpus, with a host whose
    * quota exhausts in an EARLY micro-batch and must refuse in later
    * ones (the cross-batch property the stateless gates cannot express).
    * Input schema (doc_id, url) — the URL-manifest shape
    * [[urlDedupeAgainstFrontier]] uses; compose after that gate so
    * re-crawls never spend quota. */
  def hostCapAdmission(fetches: DataFrame, cap: Int): Dataset[HostCapVerdict] = {
    import fetches.sparkSession.implicits._
    import graft.analytics.LlmOps
    fetches
      .withColumn("url_norm", expr(LlmOps.urlNormSql))
      .select(col("doc_id"), expr(LlmOps.hostOfSql).as("host"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[HostQuota, HostCapVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host: String, rows: Iterator[(Long, String)], state: GroupState[HostQuota]) =>
          val st = state.getOption.getOrElse(HostQuota(0L, Long.MinValue, 0L))
          var spent = st.spent
          var maxSeen = st.maxSeen
          var dropped = st.dropped
          val out = rows.map(_._1).toArray.sorted.flatMap { id =>
            if (id <= maxSeen) {
              // re-delivery (or in-batch duplicate): verdict already
              // shipped — counted so a violated replay contract shows up
              dropped += 1
              None
            } else {
              maxSeen = id
              val admit = spent < cap
              if (admit) spent += 1
              Some(HostCapVerdict(id, host, admit, spent, dropped))
            }
          }
          state.update(HostQuota(spent, maxSeen, dropped))
          out.iterator
      }
  }
}
