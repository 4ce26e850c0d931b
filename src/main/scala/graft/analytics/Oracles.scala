package graft.analytics

/** DuckDB oracle SQL for every driver-checked query. Each statement must
  * produce the SAME column names, value rounding, and total ordering as its
  * Spark counterpart — the driver sorts columns by name and hash-compares
  * values (see the builder contract in SparkEntry).
  *
  * DuckDB/Spark compatibility notes baked in here:
  *  - `count(...)`/`count(*)` is BIGINT in both; `sum(<int>)` is avoided in
  *    oracle-facing output because DuckDB widens it to HUGEINT.
  *  - second-resolution epoch diffs use `date_diff('second', …)` (DuckDB) vs
  *    `cast(ts as long)` (Spark) — both floor to the second for positive
  *    epochs.
  *  - timestamps are emitted as `strftime`/`date_format` strings or DATE.
  */
object Oracles {

  /** DuckDB emulation of the JS number rendering for the cgt value range:
    * DuckDB's double→VARCHAR is shortest-round-trip (same digit selection
    * as JS); only the integral case differs (`178.0` vs JS `178`), handled
    * by the CASE. Valid for |x| < 2^63 and outside exponent-notation
    * thresholds — cgt money values live comfortably inside; verified with
    * zero mismatches over all 150k rendered values at sf0.1. The engine's
    * own `js_num` implements the full ECMA algorithm. */
  private def jsn(x: String): String =
    s"CASE WHEN $x = floor($x) THEN CAST(CAST($x AS BIGINT) AS VARCHAR) ELSE CAST($x AS VARCHAR) END"

  /** Z-order bit-interleave over pre-bound ints zx, zy — the DuckDB twin of
    * Relational.q32Zorder's expression, `//` for `div`. */
  private def zkeyDuck: String =
    (0 until 10).flatMap { i =>
      Seq(s"((zx // ${1L << i}) % 2) * CAST(${1L << (2 * i)} AS BIGINT)",
          s"((zy // ${1L << i}) % 2) * CAST(${1L << (2 * i + 1)} AS BIGINT)")
    }.mkString("(", " + ", ")")

  val relational: Map[String, String] = Map(
    "q33_bloom_prune" ->
      """WITH big AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
        |SELECT l_returnflag, count(*) AS n_exact,
        |  TRUE AS no_false_negatives, TRUE AS fp_bounded
        |FROM lineitem SEMI JOIN big ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q31_approx_quantile" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rk,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN l_extendedprice END) AS p50,
        |  max(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT) THEN l_extendedprice END) AS p90,
        |  count(*) AS n_rows,
        |  TRUE AS p50_in_bounds,
        |  TRUE AS p90_in_bounds
        |FROM r
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q32_zorder" ->
      s"""WITH b AS (
         |  SELECT CAST(o_custkey % 1024 AS BIGINT) AS zx,
         |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS zy
         |  FROM orders),
         |z AS (SELECT zx, zy, $zkeyDuck AS zkey FROM b)
         |SELECT zkey // ${(1L << 20) / 32} AS bucket, count(*) AS n,
         |  min(zx) AS min_x, max(zx) AS max_x,
         |  min(zy) AS min_y, max(zy) AS max_y
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,

    "cgt_lines" ->
      s"""WITH n AS (
         |  SELECT o_orderkey, o_orderdate,
         |    CASE WHEN o_orderstatus = 'F' THEN 'SELL' ELSE 'BUY' END AS kind,
         |    strftime(o_orderdate, '%d/%m/%Y') AS date,
         |    'ORD' || CAST(o_custkey % 50 AS VARCHAR) AS asset,
         |    o_totalprice / 1000.0 AS amount,
         |    CAST(1000.0 AS DOUBLE) AS price,
         |    o_totalprice * 0.001 AS expenses
         |  FROM orders)
         |SELECT o_orderkey,
         |  kind || ' ' || date || ' ' || asset || ' ' ||
         |  ${jsn("amount")} || ' ' || ${jsn("price")} || ' ' || ${jsn("expenses")} AS line
         |FROM n
         |ORDER BY CAST(o_orderdate AS DATE), o_orderkey""".stripMargin,
    "q23_asof_attr" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn FROM events),
        |w AS (
        |  SELECT event_id, user_id, event_type, tsn,
        |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_id,
        |    last_value(CASE WHEN event_type = 'view' THEN tsn END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_tsn
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id,
        |  strftime(make_timestamp(tsn // 1000), '%Y-%m-%d %H:%M:%S') AS purchase_time,
        |  last_view_id,
        |  (tsn - last_view_tsn) // 1000000000 AS secs_since_view
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,

    "q37_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn FROM events),
        |w AS (
        |  SELECT event_id, user_id, event_type, tsn,
        |    first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_id,
        |    first_value(CASE WHEN event_type = 'purchase' THEN tsn END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_tsn
        |  FROM e)
        |SELECT event_id AS view_id, user_id,
        |  strftime(make_timestamp(tsn // 1000), '%Y-%m-%d %H:%M:%S') AS view_time,
        |  next_purchase_id,
        |  (next_purchase_tsn - tsn) // 1000000000 AS secs_to_purchase
        |FROM w
        |WHERE event_type = 'view' AND next_purchase_id IS NOT NULL
        |  AND next_purchase_tsn - tsn <= CAST(259200 AS BIGINT) * 1000000000
        |ORDER BY view_id""".stripMargin,

    // fixed-point integer PageRank: micro-unit ranks, floor division
    // everywhere, 3 unrolled iterations — integer sums make the iterative
    // result exactly reproducible across engines (and partitionings)
    "q38_pagerank" ->
      """WITH up AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS cn, l.l_partkey * 2 + 1 AS pn
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e0 AS (SELECT cn AS src, pn AS dst FROM up
        |       UNION ALL SELECT pn AS src, cn AS dst FROM up),
        |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
        |e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg ON e0.src = deg.src),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
        |r1 AS (SELECT e.dst AS node,
        |         CAST(150000 + 85 * CAST(sum(r0.pr // e.deg) AS BIGINT) // 100 AS BIGINT) AS pr
        |       FROM e JOIN r0 ON e.src = r0.node GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node,
        |         CAST(150000 + 85 * CAST(sum(r1.pr // e.deg) AS BIGINT) // 100 AS BIGINT) AS pr
        |       FROM e JOIN r1 ON e.src = r1.node GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node,
        |         CAST(150000 + 85 * CAST(sum(r2.pr // e.deg) AS BIGINT) // 100 AS BIGINT) AS pr
        |       FROM e JOIN r2 ON e.src = r2.node GROUP BY e.dst)
        |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
        |  node // 2 AS node_id, pr
        |FROM r3
        |ORDER BY pr DESC, node_type, node_id LIMIT 100""".stripMargin,

    "q39_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 604800000000000 AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY user_id),
        |g AS (SELECT cohort_week, wk - cohort_week AS week_offset,
        |        count(*) AS n_users
        |      FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_users,
        |  CAST(n_users AS DOUBLE) / max(CASE WHEN week_offset = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort_week) AS retention
        |FROM g ORDER BY cohort_week, week_offset""".stripMargin,

    "q40_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN tsn END)
        |         OVER (PARTITION BY user_id) AS t1 FROM ev),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND tsn > t1 THEN tsn END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'click' AND tsn > t2 THEN tsn END)
        |         OVER (PARTITION BY user_id) AS t3 FROM w2),
        |w4 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tsn > t3 THEN tsn END)
        |         OVER (PARTITION BY user_id) AS t4 FROM w3),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
        |      FROM w4 GROUP BY user_id),
        |t AS (SELECT count(*) AS n0, count(t1) AS n1, count(t2) AS n2,
        |             count(t3) AS n3, count(t4) AS n4 FROM u)
        |SELECT stage, event_type, n_users,
        |  CASE WHEN n_prev = 0 THEN NULL
        |       ELSE CAST(n_users AS DOUBLE) / n_prev END AS conversion
        |FROM (
        |  SELECT 1 AS stage, 'signup' AS event_type, n1 AS n_users, n0 AS n_prev FROM t
        |  UNION ALL SELECT 2, 'view', n2, n1 FROM t
        |  UNION ALL SELECT 3, 'click', n3, n2 FROM t
        |  UNION ALL SELECT 4, 'purchase', n4, n3 FROM t)
        |ORDER BY stage""".stripMargin,

    "q30_grouping_sets" ->
      """SELECT
        |  CASE WHEN grouping(o_orderpriority) = 1 THEN '(by status)' ELSE o_orderpriority END AS priority,
        |  CASE WHEN grouping(o_orderstatus) = 1 THEN '(by priority)' ELSE o_orderstatus END AS status,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY priority, status""".stripMargin,

    "q29_window_range" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY d
        |        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trail7_total
        |FROM o
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // q35 = the plain orderkey join; the bucketed layout changes only the
    // physical plan (no exchange on either join side), never the result
    "q35_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*) AS n,
        |  round(sum(l.l_quantity), 2) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,

    // the NAIVE range join — DuckDB plans it natively; the Spark side's
    // week-bucket expansion must hash-match it exactly (nothing lost,
    // nothing duplicated by the bucketing)
    "q36_interval_join" ->
      """WITH probes AS (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS probe_d
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |li AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_d, l_quantity FROM lineitem)
        |SELECT strftime(p.probe_d, '%Y-%m-%d') AS probe_date,
        |  count(*) AS n_in_transit,
        |  round(sum(li.l_quantity), 2) AS qty_in_transit
        |FROM probes p JOIN li
        |  ON p.probe_d >= li.ship_d AND p.probe_d <= li.ship_d + INTERVAL 14 DAY
        |GROUP BY p.probe_d
        |ORDER BY probe_date""".stripMargin,

    // q34 = q28's join without the salt (AQE splits the skew at runtime
    // instead); the unsalted SQL is the oracle for BOTH formulations
    "q34_skew_aqe" ->
      """WITH dim AS (
        |  SELECT l_returnflag, round(sum(l_discount), 2) / count(*) AS flag_avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT f.l_returnflag AS f_flag, count(*) AS n,
        |  CAST(round(sum(CAST(f.l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE) * (1 - d.flag_avg_disc) AS sum_disc_price
        |FROM lineitem f JOIN dim d ON f.l_returnflag = d.l_returnflag
        |GROUP BY f.l_returnflag, d.flag_avg_disc
        |ORDER BY f_flag""".stripMargin,

    "q28_salted_join" ->
      """WITH dim AS (
        |  SELECT l_returnflag, round(sum(l_discount), 2) / count(*) AS flag_avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT f.l_returnflag AS f_flag, count(*) AS n,
        |  CAST(round(sum(CAST(f.l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE) * (1 - d.flag_avg_disc) AS sum_disc_price
        |FROM lineitem f JOIN dim d ON f.l_returnflag = d.l_returnflag
        |GROUP BY f.l_returnflag, d.flag_avg_disc
        |ORDER BY f_flag""".stripMargin,

    "q27_json" ->
      """WITH e AS (
        |  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, k % 10 AS kb,
        |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e
        |GROUP BY event_type, k % 10
        |ORDER BY event_type, kb""".stripMargin,

    "q24_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_f,
        |  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_o
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q25_percentile" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice, o_orderkey) AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT) THEN o_totalprice END) AS p90,
        |  count(*) AS n_orders
        |FROM r
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q26_exists_sql" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F' AND o2.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "cgt_normalize" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'SELL' ELSE 'BUY' END AS kind,
        |  strftime(o_orderdate, '%d/%m/%Y') AS date,
        |  'ORD' || CAST(o_custkey % 50 AS VARCHAR) AS asset,
        |  o_totalprice / 1000.0 AS amount,
        |  CAST(1000.0 AS DOUBLE) AS price,
        |  o_totalprice * 0.001 AS expenses
        |FROM orders
        |ORDER BY CAST(o_orderdate AS DATE), o_orderkey""".stripMargin,

    "q21_tumbling" ->
      """SELECT strftime(make_timestamp((epoch_ns(ts) // 1000000000) // 300 * 300 * 1000000),
        |                '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q22_cube" ->
      """SELECT coalesce(o_orderpriority, '(all)') AS priority,
        |  coalesce(o_orderstatus, '(all)') AS status,
        |  count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_total
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY priority, status""".stripMargin,

    // The exact sides hash-match DuckDB's own count(DISTINCT …); the
    // in-bounds booleans are asserted literal TRUE here, so a Spark-side HLL
    // estimate drifting past 3σ (rel err ≥ 0.06 at rsd 0.02) fails the hash
    // match — bounded-error verification without cross-engine sketch equality.
    "q20_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS orders_in_bounds,
        |  TRUE AS parts_in_bounds
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q19_hash_sample" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q01_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
        |  round(sum(l_quantity), 2) / count(*) AS avg_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE) / count(*) AS avg_price,
        |  round(sum(l_discount), 2) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_quantity <= 45
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q03_join_revenue" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q04_broadcast_star" ->
      """SELECT p_brand, s_nationkey,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_nationkey
        |ORDER BY p_brand, s_nationkey""".stripMargin,

    "q05_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q06_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "q08_window_topn" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 2
        |ORDER BY o_custkey, rk""".stripMargin,

    "q09_window_running" ->
      """SELECT user_id, event_id, event_type,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q10_sessionize" ->
      """WITH secs AS (
        |  SELECT user_id, event_id, ts, value,
        |    epoch_ns(ts) // 1000000000 AS s
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_id, ts, value, s,
        |    CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM secs
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end,
        |  round(sum(value), 2) AS sum_value
        |FROM sessions
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q11_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS region,
        |  coalesce(n_name, '(all)') AS nation,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_bal,
        |  count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q12_setops" ->
      """SELECT c_custkey, 'building_active' AS tag FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'building_dormant' AS tag FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY tag, c_custkey""".stripMargin,

    "q13_conditional_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
        |  CAST(round(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_f,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q14_distinct_agg" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderstatus) AS n_status
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q15_union_years" ->
      """SELECT 'ship' AS src, year(l_shipdate) AS yr, count(*) AS n
        |FROM lineitem GROUP BY year(l_shipdate)
        |UNION ALL
        |SELECT 'order' AS src, year(o_orderdate) AS yr, count(*) AS n
        |FROM orders GROUP BY year(o_orderdate)
        |ORDER BY src, yr""".stripMargin,

    "q16_above_brand_avg" ->
      """SELECT p_partkey, p_brand, p_retailprice, brand_avg
        |FROM (SELECT p_partkey, p_brand, p_retailprice,
        |        round(sum(p_retailprice) OVER (PARTITION BY p_brand), 2)
        |          / count(*) OVER (PARTITION BY p_brand) AS brand_avg
        |      FROM part) t
        |WHERE p_retailprice > brand_avg * 1.05
        |ORDER BY p_partkey""".stripMargin,

    "q17_events_hourly" ->
      """SELECT event_type, hour(ts) AS hr, count(*) AS n,
        |  round(sum(value), 2) / count(*) AS avg_value
        |FROM events
        |GROUP BY event_type, hour(ts)
        |ORDER BY event_type, hr""".stripMargin,

    "q18_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
