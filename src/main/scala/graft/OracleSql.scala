package graft

/** DuckDB-dialect oracle SQL, one entry per SparkEntry.queries key that is
  * SQL-expressible. Keys absent here get the driver's weaker rows-only
  * check (side-effecting or engine-specific ops: sorted write, compaction,
  * multimodal decode stub).
  *
  * Cross-engine determinism rules (SURVEY.md §5):
  *  - sums over DOUBLE go through DECIMAL(30,6): exact, order-independent;
  *  - time buckets are epoch-second BIGINTs via date_trunc (both engines
  *    see identical µs timestamps: DuckDB truncates ns on read, our reader
  *    truncates ns→µs in Tables.events);
  *  - window orderings carry a unique tiebreak column;
  *  - COUNT/row_number emitted as the same integer width on both sides.
  */
object OracleSql {

  private val scanDistinct: Map[String, String] = Map(
    "q_scan_eq" ->
      "SELECT event_id, user_id, value FROM events WHERE event_type = 'click'",
    "q_scan_range" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-05 00:00:00'
        |  AND value >= 50.0""".stripMargin,
    "q_projection" ->
      "SELECT l_orderkey, l_extendedprice FROM lineitem",
    "q_scan_in" ->
      "SELECT event_id, event_type FROM events WHERE event_type IN ('click','view','purchase')",
    "q_scan_regex" ->
      "SELECT event_id, event_type, user_id FROM events WHERE regexp_matches(event_type, '^(cl|si)')",
    "q_scan_neg" ->
      "SELECT event_id, user_id, event_type FROM events WHERE event_type <> 'error' AND user_id % 10 = 5",
    // semi-structured: the props JSON parsed and aggregated as a
    // typed column (DuckDB ->> mirrors get_json_object's $.k)
    "q_props_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
        |  CAST(SUM(CASE WHEN CAST(props->>'k' AS BIGINT) >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM events GROUP BY 1""".stripMargin,
    // typed shredding: the same key at two types (BIGINT sum vs
    // lexicographic VARCHAR max) + a declared-but-absent key pinning
    // missing-key -> NULL
    "q_props_shred" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(props->>'k') AS max_k_str,
        |  CAST(SUM(CASE WHEN props->>'m' IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_m
        |FROM events GROUP BY 1""".stripMargin,
    // write-time shred: the oracle re-derives k from the raw JSON, so
    // the hash proves the shredded store wrote faithful values AND the
    // pushed-filter query over it aggregates correctly
    "q_props_write_shred" ->
      """SELECT event_type, COUNT(*) AS n_high,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value_high
        |FROM events
        |WHERE CAST(props->>'k' AS BIGINT) >= 90
        |GROUP BY 1""".stripMargin,
    "q_distinct_one" ->
      "SELECT DISTINCT event_type FROM events",
    "q_distinct_series" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "q_series_select" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01 12:00:00'
        |  AND ts <= TIMESTAMP '2024-01-04 12:00:00'
        |  AND event_type = 'click'""".stripMargin,
    "q_label_names" ->
      """SELECT 'event_type' AS label, COUNT(DISTINCT event_type) AS cardinality FROM events
        |UNION ALL
        |SELECT 'user_id' AS label, COUNT(DISTINCT user_id) AS cardinality FROM events""".stripMargin,
    "q_tsdb_stats" ->
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_series,
        |       CAST(COUNT(*) AS BIGINT) AS n_samples,
        |       CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |       CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY 1""".stripMargin,
    "q_label_values" ->
      """SELECT DISTINCT CAST(user_id AS VARCHAR) AS label_value
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "q_label_values_regex" ->
      """SELECT DISTINCT CAST(user_id AS VARCHAR) AS label_value
        |FROM events
        |WHERE regexp_full_match(event_type, 'cl.*|vi.*')
        |  AND regexp_full_match(CAST(user_id AS VARCHAR), '1[0-9]')
        |  AND user_id <> 15""".stripMargin,
  )

  /** Schema-0 native-histogram bucket index: smallest k in [-6, 9] with
    * value <= 2^k (mirror of TimeSeries.nhK — the power-of-two literals
    * are exact in both engines' double parsing).
    */
  private lazy val nhKCase: String =
    (-6 to 9).map(k => s"WHEN value <= ${math.pow(2.0, k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 10 END")

  /** Generalized-schema bucket index (mirror of TimeSeries.nhKS). The
    * bound literals are generated from the SAME doubles the Spark plan
    * compares against (TimeSeries.nhBound), serialized via shortest-
    * round-trip Double.toString — DuckDB's correctly-rounded strtod
    * recovers the identical bits, so membership is bit-exact.
    */
  private def nhKCaseS(schema: Int): String = {
    val (lo, hi) = graft.operators.TimeSeries.nhIdx(schema)
    (lo to hi).map(i =>
      s"WHEN value <= ${graft.operators.TimeSeries.nhBound(schema, i)} THEN $i")
      .mkString("CASE ", " ", s" ELSE ${hi + 1} END")
  }

  /** The store-served rule-group oracle, parameterized by rule
    * names — one derivation shared by the batch-store and
    * stream-store (live) entries: both must hash-match the same
    * raw-events re-derivation.
    */
  private def groupStoreOracle(hot: String, rateA: String,
                               sm: String, av: String): String =
    s"""WITH steps AS (
         |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
         |samp AS (
         |  SELECT st.step, e.user_id, e.event_type, e.value,
         |         epoch_us(e.ts) AS us, e.event_id
         |  FROM events e JOIN steps st
         |    ON st.step * 1000000 >= epoch_us(e.ts)
         |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
         |  WHERE e.event_type IN ('click', 'view')),
         |g AS (SELECT step, user_id, event_type, value,
         |        lag(value) OVER (PARTITION BY step, user_id, event_type
         |                         ORDER BY us, event_id) AS prev
         |      FROM samp),
         |inc AS (SELECT step, user_id, event_type,
         |          CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0.0
         |                             WHEN value >= prev THEN value - prev
         |                             ELSE value END AS DECIMAL(30,6)))
         |            AS DOUBLE) AS inc
         |        FROM g GROUP BY 1, 2, 3),
         |vec AS (SELECT step, event_type,
         |          CAST(SUM(CAST(inc / 7200.0 AS DECIMAL(30,6))) AS DOUBLE)
         |            AS value
         |        FROM inc GROUP BY 1, 2),
         |held AS (SELECT * FROM vec WHERE value > 0.002),
         |isl AS (SELECT *, step - 3600 * ROW_NUMBER() OVER
         |          (PARTITION BY event_type ORDER BY step) AS island
         |        FROM held),
         |sp2 AS (SELECT event_type, island, MIN(step) AS a_start,
         |               MAX(step) AS a_end
         |        FROM isl GROUP BY 1, 2),
         |chains AS (SELECT *,
         |             CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END AS brk
         |           FROM (SELECT *, a_start - LAG(a_end) OVER
         |                   (PARTITION BY event_type ORDER BY a_start) AS gap
         |                 FROM sp2)),
         |chain2 AS (SELECT *, SUM(brk) OVER
         |             (PARTITION BY event_type ORDER BY a_start
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
         |           FROM chains),
         |ign AS (SELECT *, MIN(CASE WHEN a_end - a_start >= 7200
         |                           THEN a_start + 7200 END)
         |          OVER (PARTITION BY event_type, chain ORDER BY a_start
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS fire_time
         |        FROM chain2),
         |hs AS (SELECT i.step, i.event_type, i.value,
         |         CASE WHEN gg.fire_time IS NOT NULL AND i.step >= gg.fire_time
         |              THEN 'firing' ELSE 'pending' END AS alertstate
         |       FROM isl i JOIN ign gg
         |         ON gg.event_type = i.event_type AND gg.island = i.island),
         |sm AS (SELECT st.step, e.user_id, e.event_type,
         |         CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sv
         |       FROM events e JOIN steps st
         |         ON st.step * 1000000 >= epoch_us(e.ts)
         |        AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
         |       WHERE e.event_type = 'click'
         |       GROUP BY 1, 2, 3),
         |rec AS (SELECT step, user_id,
         |          CAST(SUM(CAST(sv AS DECIMAL(30,6))) AS DOUBLE) AS value
         |        FROM sm GROUP BY 1, 2),
         |av AS (SELECT st.step, e.user_id, e.event_type,
         |         CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE)
         |           / COUNT(*) AS value
         |       FROM events e JOIN steps st
         |         ON st.step * 1000000 >= epoch_us(e.ts)
         |        AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
         |       WHERE e.event_type = 'view'
         |       GROUP BY 1, 2, 3)
         |SELECT '$hot' AS rule, step, event_type AS series,
         |       alertstate, value
         |FROM (${alertOracle(3600L)}) rr
         |UNION ALL
         |SELECT '$rateA' AS rule, step, event_type AS series,
         |       alertstate, value
         |FROM hs
         |UNION ALL
         |SELECT '$sm' AS rule, step,
         |       CAST(user_id AS VARCHAR) AS series,
         |       'none' AS alertstate, value
         |FROM rec
         |UNION ALL
         |SELECT '$av' AS rule, step,
         |       CONCAT(CAST(user_id AS VARCHAR), ',', event_type) AS series,
         |       'none' AS alertstate, value
         |FROM av""".stripMargin

  /** Alerting-rule oracle (mirror of operators.Alerts.alertStates over
    * the stepped 2h-count expr): islands → hysteresis chains → running
    * ignition time; `keep` = 0 reduces to the plain `for:` rule (every
    * gap breaks the chain, no extension rows).
    */
  private def alertOracle(keep: Long): String = {
    val base =
      s"""WITH steps AS (
         |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
         |cnt AS (
         |  SELECT st.step, e.event_type, CAST(COUNT(*) AS DOUBLE) AS value
         |  FROM events e JOIN steps st
         |    ON st.step * 1000000 >= epoch_us(e.ts)
         |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
         |  WHERE regexp_full_match(e.event_type, 'click|view|purchase|signup|error')
         |  GROUP BY 1, 2),
         |held AS (SELECT * FROM cnt WHERE value > 6),
         |isl AS (
         |  SELECT *, step - 3600 * ROW_NUMBER() OVER
         |    (PARTITION BY event_type ORDER BY step) AS island
         |  FROM held),
         |spans AS (
         |  SELECT event_type, island, MIN(step) AS a_start, MAX(step) AS a_end
         |  FROM isl GROUP BY 1, 2),
         |chains AS (
         |  SELECT *, CASE WHEN gap IS NULL OR gap > ${keep + 3600L} THEN 1 ELSE 0 END AS brk
         |  FROM (SELECT *, a_start - LAG(a_end) OVER
         |          (PARTITION BY event_type ORDER BY a_start) AS gap
         |        FROM spans)),
         |chain2 AS (
         |  SELECT *, SUM(brk) OVER (PARTITION BY event_type ORDER BY a_start
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
         |  FROM chains),
         |ign AS (
         |  SELECT *, MIN(CASE WHEN a_end - a_start >= 7200 THEN a_start + 7200 END)
         |    OVER (PARTITION BY event_type, chain ORDER BY a_start
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fire_time
         |  FROM chain2),
         |hs AS (
         |  SELECT i.step, i.event_type, i.value,
         |         CASE WHEN g.fire_time IS NOT NULL AND i.step >= g.fire_time
         |              THEN 'firing' ELSE 'pending' END AS alertstate
         |  FROM isl i JOIN ign g
         |    ON g.event_type = i.event_type AND g.island = i.island)""".stripMargin
    if (keep <= 0L)
      base + "\nSELECT step, event_type, alertstate, value FROM hs"
    else
      base +
        s""",
           |ser AS (SELECT DISTINCT event_type FROM hs),
           |dense AS (
           |  SELECT g.step, g.event_type, h.alertstate, h.value,
           |    MAX(CASE WHEN h.alertstate IS NOT NULL THEN g.step END) OVER w AS last_held,
           |    last_value(h.alertstate IGNORE NULLS) OVER w AS last_state,
           |    last_value(CASE WHEN h.alertstate IS NOT NULL THEN h.value END IGNORE NULLS) OVER w AS last_value
           |  FROM (SELECT st.step, s.event_type FROM steps st CROSS JOIN ser s) g
           |  LEFT JOIN hs h ON h.step = g.step AND h.event_type = g.event_type
           |  WINDOW w AS (PARTITION BY g.event_type ORDER BY g.step
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |SELECT step, event_type,
           |       COALESCE(alertstate, 'firing') AS alertstate,
           |       COALESCE(value, last_value) AS value
           |FROM dense
           |WHERE alertstate IS NOT NULL
           |   OR (last_state = 'firing' AND step - last_held <= $keep)""".stripMargin
  }

  /** WIDE positive schemas (4..8) — mirrors of TimeSeries.nhBoundWide /
    * nhKSWide: the fixed sub-bound double table serialized via
    * shortest-round-trip Double.toString (DuckDB's correctly-rounded
    * strtod recovers the identical bits), octave scaling as exact
    * pow(2, m), index by the same guess-then-fix (each engine's log2
    * guess lands within ±1 of truth; the comparisons against the SAME
    * literal doubles settle an engine-identical index).
    */
  // The per-element '…'::DOUBLE string cast is load-bearing: DuckDB
  // types a bare numeric list literal DECIMAL(17,16) and its
  // decimal→double conversion DOUBLE-ROUNDS (int128/10^16 in floating
  // point — measured one ulp off on 2^(112/256)), so neither the bare
  // literal nor CAST(list AS DOUBLE[]) recovers the Spark-side bits.
  // The STRING→DOUBLE cast is correctly rounded (verified over the
  // whole table), recovering exactly the shortest-round-trip doubles
  // the Spark plan compares against.
  private def nhSubListS(schema: Int): String =
    graft.operators.TimeSeries.nhSubBounds(schema)
      .map(d => s"'$d'::DOUBLE").mkString("[", ", ", "]")

  /** bound(x) for a runtime integer expression `x` at a wide schema. */
  private def nhBoundArithS(schema: Int, x: String): String = {
    val parts = 1 << schema
    s"(list_extract(${nhSubListS(schema)}, " +
      s"CAST(($x) - $parts * CAST(floor(($x) / $parts.0) AS BIGINT) AS BIGINT) + 1) " +
      s"* pow(2.0, floor(($x) / $parts.0)))"
  }

  /** The wide-schema build CTE chain: `allk` = (step, event_type, k)
    * one row per event. Below-window values clamp to lo WITHOUT
    * touching log2 (the domain guard both engines share).
    */
  private def nhWideBuildCtes(schema: Int): String = {
    val parts = 1 << schema
    val (lo, hi) = graft.operators.TimeSeries.nhIdx(schema)
    val boundLo = graft.operators.TimeSeries.nhBound(schema, lo)
    val fixes = (-2 to 1).map(d =>
      s"(CASE WHEN value > ${nhBoundArithS(schema, s"g + $d")} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""ev AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
       |              event_type, value FROM events),
       |wide AS (
       |  SELECT step, event_type, value,
       |         CAST(ceil(log2(value) * $parts.0) AS BIGINT) AS g
       |  FROM ev WHERE value > $boundLo),
       |allk AS (
       |  SELECT step, event_type, CAST($lo AS BIGINT) AS k
       |  FROM ev WHERE value <= $boundLo
       |  UNION ALL
       |  SELECT step, event_type,
       |         GREATEST($lo, LEAST((g - 2) + $fixes, ${hi + 1})) AS k
       |  FROM wide)""".stripMargin
  }

  /** Shared CTE chain of the per-user activity alert (threshold
    * value > 0, for = 3600, keep = 3600, the q_promql_alerts_* grid):
    * the full state machine up to the DENSE per-(step, series) frame —
    * alertstate (null at missed evals), active_at (ActiveAt: fire_time
    * − for when firing, the island start when pending), and the
    * last-held/last-state/last-active carries the keep-extension rows
    * read. Both synthetic-series oracles select from `dense`.
    */
  private val alertsSeriesCtes: String =
    """steps AS (
      |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
      |cnt AS (
      |  SELECT st.step, e.user_id, CAST(COUNT(*) AS DOUBLE) AS value
      |  FROM events e JOIN steps st
      |    ON st.step * 1000000 >= epoch_us(e.ts)
      |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
      |  WHERE regexp_full_match(e.event_type, 'click|view|purchase|signup|error')
      |  GROUP BY 1, 2),
      |held AS (SELECT * FROM cnt WHERE value > 0),
      |isl AS (
      |  SELECT *, step - 3600 * ROW_NUMBER() OVER
      |    (PARTITION BY user_id ORDER BY step) AS island
      |  FROM held),
      |spans AS (
      |  SELECT user_id, island, MIN(step) AS a_start, MAX(step) AS a_end
      |  FROM isl GROUP BY 1, 2),
      |chains AS (
      |  SELECT *, CASE WHEN gap IS NULL OR gap > 7200 THEN 1 ELSE 0 END AS brk
      |  FROM (SELECT *, a_start - LAG(a_end) OVER
      |          (PARTITION BY user_id ORDER BY a_start) AS gap
      |        FROM spans)),
      |chain2 AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY a_start
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
      |  FROM chains),
      |ign AS (
      |  SELECT *, MIN(CASE WHEN a_end - a_start >= 3600 THEN a_start + 3600 END)
      |    OVER (PARTITION BY user_id, chain ORDER BY a_start
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fire_time
      |  FROM chain2),
      |hs AS (
      |  SELECT i.step, i.user_id,
      |         CASE WHEN g.fire_time IS NOT NULL AND i.step >= g.fire_time
      |              THEN 'firing' ELSE 'pending' END AS alertstate,
      |         CASE WHEN g.fire_time IS NOT NULL AND i.step >= g.fire_time
      |              THEN g.fire_time - 3600 ELSE g.a_start END AS active_at
      |  FROM isl i JOIN ign g
      |    ON g.user_id = i.user_id AND g.island = i.island),
      |ser AS (SELECT DISTINCT user_id FROM hs),
      |dense AS (
      |  SELECT g.step, g.user_id, h.alertstate, h.active_at,
      |    MAX(CASE WHEN h.alertstate IS NOT NULL THEN g.step END) OVER w AS last_held,
      |    last_value(h.alertstate IGNORE NULLS) OVER w AS last_state,
      |    last_value(CASE WHEN h.alertstate IS NOT NULL THEN h.active_at END
      |               IGNORE NULLS) OVER w AS last_active
      |  FROM (SELECT st.step, s.user_id FROM steps st CROSS JOIN ser s) g
      |  LEFT JOIN hs h ON h.step = g.step AND h.user_id = g.user_id
      |  WINDOW w AS (PARTITION BY g.user_id ORDER BY g.step
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  /** k → bound(k) literal CASE (mirror of TimeSeries.nhBoundCol). */
  private def nhBoundCaseS(schema: Int, k: String): String = {
    val (lo, hi) = graft.operators.TimeSeries.nhIdx(schema)
    (lo - 1 to hi).map(i =>
      s"WHEN ($k) = $i THEN ${graft.operators.TimeSeries.nhBound(schema, i)}")
      .mkString("CASE ", " ",
        s" ELSE ${graft.operators.TimeSeries.nhBound(schema, hi + 1)} END")
  }

  private val timeSeries: Map[String, String] = Map(
    "q_range_sum" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q_range_sum_by" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the full algebraic-measure family over the hourly step — also the
    // shared oracle for the MV-rewritten q_rollup_rewrite_stats
    "q_range_stats_by" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
        |       COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_rate" ->
      """WITH x AS (
        |  SELECT user_id, event_type, event_id, value,
        |         lag(value) OVER w AS prev_value,
        |         lag(epoch_us(ts)) OVER w AS prev_us,
        |         epoch_us(ts) AS us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
        |SELECT user_id, event_type, event_id,
        |       (value - prev_value) / ((us - prev_us) / 1000000.0) AS rate
        |FROM x WHERE prev_value IS NOT NULL AND us <> prev_us""".stripMargin,
    "q_count_over_time" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |       user_id, event_type, COUNT(*) AS n_samples
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_avg_min_max_over_time" ->
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS step,
        |       user_id, event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_value,
        |       MIN(value) AS min_value,
        |       MAX(value) AS max_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_topk" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |         user_id, event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT step, user_id, event_type, sum_value, CAST(rnk AS INTEGER) AS rnk
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY step ORDER BY sum_value DESC, user_id, event_type) AS rnk
        |      FROM per)
        |WHERE rnk <= 3""".stripMargin,
    "q_last_over_time" ->
      """SELECT user_id, event_type, event_id, value
        |FROM (SELECT user_id, event_type, event_id, value,
        |             row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    "q_histogram_quantile" ->
      """WITH x AS (
        |  SELECT event_type, value, event_id,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, value AS p95 FROM x
        |WHERE rn = CAST(ceil(round(n * 0.95, 9)) AS BIGINT)""".stripMargin,
    "q_increase" ->
      """SELECT (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 21600) * 21600 AS step,
        |       user_id, event_type, MAX(value) - MIN(value) AS increase
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // scrape-interval inference: integer µs gaps, rank-statistic
    // median/p95 per metric (the quantilePos contract) — mirrors
    // TimeSeries.scrapeInterval
    "q_scrape_interval" ->
      """WITH g0 AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY ts, event_id) AS pus
        |  FROM events),
        |g AS (SELECT event_type, us - pus AS gap_us FROM g0 WHERE pus IS NOT NULL),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |        MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us
        |      FROM g GROUP BY 1),
        |r AS (SELECT event_type, gap_us,
        |        row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn
        |      FROM g),
        |p AS (SELECT r.event_type,
        |        MAX(CASE WHEN rn = greatest(1, CAST(ceil(round(n_gaps * 0.5, 9)) AS BIGINT))
        |            THEN gap_us END) AS median_gap_us,
        |        MAX(CASE WHEN rn = greatest(1, CAST(ceil(round(n_gaps * 0.95, 9)) AS BIGINT))
        |            THEN gap_us END) AS p95_gap_us
        |      FROM r JOIN n USING (event_type) GROUP BY 1)
        |SELECT event_type, n_gaps, min_gap_us, median_gap_us, p95_gap_us,
        |       max_gap_us
        |FROM n JOIN p USING (event_type)""".stripMargin,
    "q_stddev_over_time" ->
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS step,
        |       user_id, event_type,
        |       sqrt(greatest(0.0,
        |         (CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |                        AS DECIMAL(38,12))) AS DOUBLE)
        |          - CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |            * CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
        |         / COUNT(*))) AS stddev_value,
        |       COUNT(*) AS n_samples
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_delta" ->
      """WITH x AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |         user_id, event_type, value,
        |         row_number() OVER w_asc  AS rn_a,
        |         row_number() OVER w_desc AS rn_d
        |  FROM events
        |  WINDOW
        |    w_asc  AS (PARTITION BY date_trunc('hour', ts), user_id, event_type
        |               ORDER BY ts, event_id),
        |    w_desc AS (PARTITION BY date_trunc('hour', ts), user_id, event_type
        |               ORDER BY ts DESC, event_id DESC))
        |SELECT step, user_id, event_type,
        |       MAX(CASE WHEN rn_d = 1 THEN value END)
        |       - MAX(CASE WHEN rn_a = 1 THEN value END) AS delta
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q_deriv" ->
      """WITH g AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |         user_id, event_type,
        |         COUNT(*) AS n,
        |         SUM(CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |             - CAST(epoch(date_trunc('hour', ts)) AS BIGINT)) AS sx,
        |         SUM((CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |              - CAST(epoch(date_trunc('hour', ts)) AS BIGINT))
        |             * (CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |                - CAST(epoch(date_trunc('hour', ts)) AS BIGINT))) AS sxx,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |                            - CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS DOUBLE)
        |                       * value AS DECIMAL(30,6))) AS DOUBLE) AS sxy
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT step, user_id, event_type,
        |       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS deriv
        |FROM g
        |WHERE n >= 2
        |  AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0""".stripMargin,
    "q_changes" ->
      """WITH x AS (
        |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS step,
        |         user_id, event_type, value,
        |         lag(value) OVER (PARTITION BY user_id, event_type
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT step, user_id, event_type,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> value THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q_resets" ->
      """WITH x AS (
        |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS step,
        |         user_id, event_type, value,
        |         lag(value) OVER (PARTITION BY user_id, event_type
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT step, user_id, event_type,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
        |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q_nhist_build" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |       CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_nhist_stats" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS hist_count,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS hist_sum,
        |       round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE), 12) AS hist_avg
        |FROM events GROUP BY 1, 2""".stripMargin,
    // bucket-midpoint variance about the exact header mean; term
    // quantization and op order mirror TimeSeries.nhistStddev exactly
    "q_nhist_stddev" ->
      s"""WITH h AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2, 3),
         |st AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |         CAST(COUNT(*) AS BIGINT) AS hist_count,
         |         round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
         |               / CAST(COUNT(*) AS DOUBLE), 12) AS hist_avg
         |  FROM events GROUP BY 1, 2),
         |t AS (
         |  -- DuckDB's decimal downscale cast TRUNCATES where Spark's
         |  -- rounds HALF_UP; adding half a target-scale ulp before the
         |  -- truncating cast makes it HALF_UP (sq >= 0 always)
         |  SELECT h.step, h.event_type, st.hist_count,
         |         CAST((CAST(3.0 * power(2.0, CAST(k AS DOUBLE) - 2.0) AS DECIMAL(16,12))
         |               - CAST(hist_avg AS DECIMAL(16,12)))
         |            * (CAST(3.0 * power(2.0, CAST(k AS DOUBLE) - 2.0) AS DECIMAL(16,12))
         |               - CAST(hist_avg AS DECIMAL(16,12)))
         |            + CAST('0.0000000000005' AS DECIMAL(14,13))
         |           AS DECIMAL(20,12)) * CAST(cnt AS DECIMAL(12,0)) AS term
         |  FROM h JOIN st ON st.step = h.step AND st.event_type = h.event_type)
         |SELECT step, event_type, hist_stdvar, sqrt(hist_stdvar) AS hist_stddev
         |FROM (SELECT step, event_type,
         |        CAST(CAST(SUM(term) + CAST('0.00005' AS DECIMAL(6,5))
         |                  AS DECIMAL(30,4)) AS DOUBLE)
         |          / CAST(MAX(hist_count) AS DOUBLE) AS hist_stdvar
         |      FROM t GROUP BY 1, 2)""".stripMargin,
    "q_nhist_quantile" ->
      s"""WITH h AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT step, event_type, k, cnt,
         |         SUM(cnt) OVER (PARTITION BY step, event_type ORDER BY k
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY step, event_type) AS n
         |  FROM h)
         |SELECT step, event_type,
         |       round(pow(2.0, k - 1) + (pow(2.0, k) - pow(2.0, k - 1)) *
         |             (CAST(rnk - cum + cnt AS DOUBLE) / CAST(cnt AS DOUBLE)), 12)
         |         AS q_value
         |FROM (SELECT *, CAST(ceil(round(n * 0.9, 9)) AS BIGINT) AS rnk FROM c)
         |WHERE cum >= rnk AND cum - cnt < rnk""".stripMargin,
    "q_nhist_fraction" ->
      s"""WITH h AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2, 3),
         |t AS (
         |  SELECT step, event_type, cnt,
         |         CAST(round(CAST(cnt AS DOUBLE) * least(1.0,
         |           greatest(0.0, least(${graft.operators.TimeSeries.NhFracHi}, pow(2.0, k))
         |                         - greatest(${graft.operators.TimeSeries.NhFracLo}, pow(2.0, k - 1)))
         |           / (pow(2.0, k) - pow(2.0, k - 1))), 12)
         |           AS DECIMAL(28,12)) AS term
         |  FROM h)
         |SELECT step, event_type,
         |       round(CAST(SUM(term) AS DOUBLE)
         |             / CAST(SUM(cnt) AS DOUBLE), 12) AS fraction
         |FROM t GROUP BY 1, 2""".stripMargin,
    // GENERALIZED schemas (round 15): the same build at schema −2
    // (base-16 buckets, exact powers of two) and schema +2 (4 sub-
    // buckets per octave from the fixed double bound table) — the
    // documented schema-0 restriction closed, still oracle-hashed
    "q_nhist_schema_neg" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |       CAST(${nhKCaseS(-2)} AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_nhist_schema_pos" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |       CAST(${nhKCaseS(2)} AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_nhist_quantile_pos" ->
      s"""WITH h AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |         CAST(${nhKCaseS(2)} AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT step, event_type, k, cnt,
         |         SUM(cnt) OVER (PARTITION BY step, event_type ORDER BY k
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY step, event_type) AS n
         |  FROM h)
         |SELECT step, event_type,
         |       round((${nhBoundCaseS(2, "k - 1")})
         |             + ((${nhBoundCaseS(2, "k")}) - (${nhBoundCaseS(2, "k - 1")})) *
         |             (CAST(rnk - cum + cnt AS DOUBLE) / CAST(cnt AS DOUBLE)), 12)
         |         AS q_value
         |FROM (SELECT *, CAST(ceil(round(n * 0.9, 9)) AS BIGINT) AS rnk FROM c)
         |WHERE cum >= rnk AND cum - cnt < rnk""".stripMargin,
    // WIDE schema 8 — upstream's finest resolution (round 16; VERDICT
    // r15 #7): 256 sub-buckets per octave from the frexp-style fixed
    // table, index by engine-identical guess-then-fix
    "q_nhist_schema_pos8" ->
      s"""WITH ${nhWideBuildCtes(8)}
         |SELECT step, event_type, CAST(k AS INTEGER) AS k,
         |       CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM allk GROUP BY 1, 2, 3""".stripMargin,
    "q_nhist_quantile_pos8" ->
      s"""WITH ${nhWideBuildCtes(8)},
         |h AS (
         |  SELECT step, event_type, CAST(k AS INTEGER) AS k,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM allk GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT step, event_type, k, cnt,
         |         SUM(cnt) OVER (PARTITION BY step, event_type ORDER BY k
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY step, event_type) AS n
         |  FROM h)
         |SELECT step, event_type,
         |       (${nhBoundArithS(8, "k - 1")})
         |             + ((${nhBoundArithS(8, "k")}) - (${nhBoundArithS(8, "k - 1")})) *
         |             (CAST(rnk - cum + cnt AS DOUBLE) / CAST(cnt AS DOUBLE))
         |         AS q_value
         |FROM (SELECT *, CAST(ceil(round(n * 0.9, 9)) AS BIGINT) AS rnk FROM c)
         |WHERE cum >= rnk AND cum - cnt < rnk""".stripMargin,
    // UPSTREAM-PARITY interpolation at schema 0: exponential-scale
    // interpolation q = 2^(k−1+frac) (Prometheus ≥ 2.47 semantics);
    // the exponent arithmetic is exact IEEE on both engines, the one
    // pow(2, e) rounds at 9 dp
    "q_nhist_quantile_exp" ->
      s"""WITH h AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT step, event_type, k, cnt,
         |         SUM(cnt) OVER (PARTITION BY step, event_type ORDER BY k
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY step, event_type) AS n
         |  FROM h)
         |SELECT step, event_type,
         |       round(pow(2.0, (CAST(k AS DOUBLE) - 1.0 +
         |             CAST(rnk - cum + cnt AS DOUBLE) / CAST(cnt AS DOUBLE)) / 1.0), 9)
         |         AS q_value
         |FROM (SELECT *, CAST(ceil(round(n * 0.9, 9)) AS BIGINT) AS rnk FROM c)
         |WHERE cum >= rnk AND cum - cnt < rnk""".stripMargin,
    "q_count_values" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |       CAST(floor(value / 10) AS BIGINT) AS v_bucket,
        |       COUNT(*) AS n_samples
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_promql_sum" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |       CAST(COUNT(*) AS DOUBLE) AS value
        |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin,
    // recording rule: the oracle re-derives the whole composition from
    // RAW events (inner per-user hourly decimal sum, outer cross-series
    // decimal sum), so the hash proves the recorded store wrote
    // faithful samples AND the evaluator read them back exactly
    // union-namespace mix: recorded rule / raw metric in one expr —
    // the oracle composes both sides from raw events
    "q_promql_recorded_mix" ->
      """WITH r AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |a AS (
        |  SELECT step, CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS va
        |  FROM r GROUP BY 1),
        |b AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |         CAST(COUNT(*) AS DOUBLE) AS vb
        |  FROM events WHERE event_type = 'click' GROUP BY 1)
        |SELECT a.step, va / vb AS value
        |FROM a JOIN b ON a.step = b.step WHERE vb <> 0.0""".stripMargin,
    "q_promql_recorded" ->
      """WITH r AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT step, CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM r GROUP BY 1""".stripMargin,
    // multi-label recording rule (round 16): inner per-(event_type,
    // user_id) hourly count, outer sum grouped by the payload-carried
    // source label — re-derived entirely from raw, so the hash proves
    // the props channel stored AND reconstituted the by() label set
    "q_promql_recorded_multi" ->
      """WITH r AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |         event_type AS src, user_id, CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events WHERE regexp_full_match(event_type, 'click|purchase')
        |  GROUP BY 1, 2, 3)
        |SELECT step, src, CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM r GROUP BY 1, 2""".stripMargin,
    "q_promql_topk" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT step, user_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY step ORDER BY value DESC, user_id) AS rn
        |  FROM per)
        |WHERE rn <= 3""".stripMargin,
    // limitk: per step, the 10 series with the smallest salted label
    // md5 (chr(1) is the label-tuple separator both engines share)
    "q_promql_limitk" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step, user_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY step
        |    ORDER BY md5('lk:' || chr(1) || CAST(user_id AS VARCHAR)), user_id) AS rn
        |  FROM per)
        |WHERE rn <= 10""".stripMargin,
    // limit_ratio: the 48-bit first-12-nibble md5 uniform under 0.3
    "q_promql_limit_ratio" -> {
      val nib = (1 to 12).map { k =>
        val mul = math.pow(16, 12 - k).toLong
        s"((instr('0123456789abcdef', substring(md5('lr:' || chr(1) || CAST(user_id AS VARCHAR)), $k, 1)) - 1) * $mul)"
      }.mkString(" + ")
      s"""WITH per AS (
         |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
         |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT step, user_id, value FROM per
         |WHERE CAST(($nib) AS DOUBLE) / 281474976710656.0 < 0.3""".stripMargin
    },
    // alerting-rule state machine (round 15): mirror of Alerts.rule —
    // stepped 2h-count expr > 6, gaps-and-islands `for:` clock, and
    // (keep variant) hysteresis chains + dense-grid extension rows
    // RULE GROUP (round 17): the union of every group rule's
    // independently re-derived output — the alert legs are the two
    // standalone alert oracles verbatim (the group must hash-match
    // rule-by-rule), the recording leg the hourly per-user click count
    "q_promql_rule_group" ->
      s"""SELECT 'hot_metric' AS rule, step, event_type AS series,
         |       alertstate, value
         |FROM (${alertOracle(0L)}) ga
         |UNION ALL
         |SELECT 'hot_metric_keep' AS rule, step, event_type AS series,
         |       alertstate, value
         |FROM (${alertOracle(3600L)}) gb
         |UNION ALL
         |SELECT 'grp_click_cnt1h' AS rule, st.step,
         |       CAST(e.user_id AS VARCHAR) AS series,
         |       'none' AS alertstate, CAST(COUNT(*) AS DOUBLE) AS value
         |FROM events e
         |JOIN (SELECT unnest(generate_series(1704067200, 1704153600, 3600))
         |        AS step) st
         |  ON st.step * 1000000 >= epoch_us(e.ts)
         | AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
         |WHERE e.event_type = 'click'
         |GROUP BY 1, 2, 3, 4""".stripMargin,
    // COUNTER rule group (round 17): the rate-alert leg re-derives the
    // whole chain — per-(step, series) reset-corrected growth sums
    // (lag over (us, event_id) order, per-pair DECIMAL quantization),
    // the outer exactSum vector, the comparison, and the for: state
    // machine — plus the increase recording leg
    "q_promql_rule_group_rate" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |samp AS (
        |  SELECT st.step, e.user_id, e.event_type, e.value,
        |         epoch_us(e.ts) AS us, e.event_id
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view')),
        |g AS (SELECT step, user_id, event_type, value,
        |        lag(value) OVER (PARTITION BY step, user_id, event_type
        |                         ORDER BY us, event_id) AS prev
        |      FROM samp),
        |inc AS (SELECT step, user_id, event_type,
        |          CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0.0
        |                             WHEN value >= prev THEN value - prev
        |                             ELSE value END AS DECIMAL(30,6)))
        |            AS DOUBLE) AS inc
        |        FROM g GROUP BY 1, 2, 3),
        |vec AS (SELECT step, event_type,
        |          CAST(SUM(CAST(inc / 7200.0 AS DECIMAL(30,6))) AS DOUBLE)
        |            AS value
        |        FROM inc GROUP BY 1, 2),
        |held AS (SELECT * FROM vec WHERE value > 0.002),
        |isl AS (SELECT *, step - 3600 * ROW_NUMBER() OVER
        |          (PARTITION BY event_type ORDER BY step) AS island
        |        FROM held),
        |sp2 AS (SELECT event_type, island, MIN(step) AS a_start,
        |               MAX(step) AS a_end
        |        FROM isl GROUP BY 1, 2),
        |chains AS (SELECT *,
        |             CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END AS brk
        |           FROM (SELECT *, a_start - LAG(a_end) OVER
        |                   (PARTITION BY event_type ORDER BY a_start) AS gap
        |                 FROM sp2)),
        |chain2 AS (SELECT *, SUM(brk) OVER
        |             (PARTITION BY event_type ORDER BY a_start
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
        |           FROM chains),
        |ign AS (SELECT *, MIN(CASE WHEN a_end - a_start >= 7200
        |                           THEN a_start + 7200 END)
        |          OVER (PARTITION BY event_type, chain ORDER BY a_start
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS fire_time
        |        FROM chain2),
        |hs AS (SELECT i.step, i.event_type, i.value,
        |         CASE WHEN gg.fire_time IS NOT NULL AND i.step >= gg.fire_time
        |              THEN 'firing' ELSE 'pending' END AS alertstate
        |       FROM isl i JOIN ign gg
        |         ON gg.event_type = i.event_type AND gg.island = i.island),
        |rec AS (SELECT step, user_id,
        |          CAST(SUM(CAST(inc AS DECIMAL(30,6))) AS DOUBLE) AS value
        |        FROM inc WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT 'grp_rate_alert' AS rule, step, event_type AS series,
        |       alertstate, value
        |FROM hs
        |UNION ALL
        |SELECT 'grp_click_inc' AS rule, step, CAST(user_id AS VARCHAR) AS series,
        |       'none' AS alertstate, value
        |FROM rec""".stripMargin,
    // OUTER-AGG rule group (round 17): max-by alert (for:=0 — every
    // held row fires, no islands machine needed), min-by recording
    // (min of per-series mins = the plain MIN), avg-by recording over
    // integral counts (decimal exactSum / count, bit-stable)
    "q_promql_rule_group_stats" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |mx AS (
        |  SELECT st.step, e.event_type, MAX(e.value) AS value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view', 'purchase')
        |  GROUP BY 1, 2),
        |mn AS (
        |  SELECT st.step, e.user_id, MIN(e.value) AS value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view')
        |  GROUP BY 1, 2),
        |cnt AS (
        |  SELECT st.step, e.user_id, e.event_type, COUNT(*) AS c
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view')
        |  GROUP BY 1, 2, 3),
        |av AS (
        |  SELECT step, user_id,
        |         CAST(SUM(CAST(CAST(c AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
        |           / COUNT(*) AS value
        |  FROM cnt GROUP BY 1, 2)
        |SELECT 'grp_max_alert' AS rule, step, event_type AS series,
        |       'firing' AS alertstate, value
        |FROM mx WHERE value > 150.0
        |UNION ALL
        |SELECT 'grp_min_val' AS rule, step, CAST(user_id AS VARCHAR) AS series,
        |       'none' AS alertstate, value
        |FROM mn
        |UNION ALL
        |SELECT 'grp_avg_cnt' AS rule, step, CAST(user_id AS VARCHAR) AS series,
        |       'none' AS alertstate, value
        |FROM av""".stripMargin,
    // DISTRIBUTION rule group (round 17): the stddev alert (max-by,
    // for:=0 — held rows fire), the stdvar recording at full grain,
    // and the discrete p90 pick at ceil(round(n·q, 9)) clamped >= 1
    "q_promql_rule_group_dist" ->
      """WITH steps2 AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |dev AS (
        |  SELECT st.step, e.event_type, e.user_id,
        |    (CAST(SUM(CAST(CAST(e.value AS DECIMAL(18,6))
        |                   * CAST(e.value AS DECIMAL(18,6))
        |                   AS DECIMAL(38,12))) AS DOUBLE)
        |     - CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE)
        |       * CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE)
        |       / COUNT(*)) / COUNT(*) AS var
        |  FROM events e JOIN steps2 st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view', 'purchase')
        |  GROUP BY 1, 2, 3),
        |mx AS (
        |  SELECT step, event_type,
        |         MAX(sqrt(greatest(0.0, var))) AS value
        |  FROM dev GROUP BY 1, 2),
        |var2 AS (
        |  SELECT st.step, e.user_id, e.event_type,
        |    greatest(0.0,
        |      (CAST(SUM(CAST(CAST(e.value AS DECIMAL(18,6))
        |                     * CAST(e.value AS DECIMAL(18,6))
        |                     AS DECIMAL(38,12))) AS DOUBLE)
        |       - CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE)
        |         * CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE)
        |         / COUNT(*)) / COUNT(*)) AS value
        |  FROM events e JOIN steps2 st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2, 3),
        |qx AS (
        |  SELECT st.step, e.user_id, e.event_type, e.value,
        |         row_number() OVER (PARTITION BY st.step, e.user_id
        |                            ORDER BY e.value, e.event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY st.step, e.user_id) AS n
        |  FROM events e JOIN steps2 st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click')
        |SELECT 'grp_dev_alert' AS rule, step, event_type AS series,
        |       'firing' AS alertstate, value
        |FROM mx WHERE value > 10.0
        |UNION ALL
        |SELECT 'grp_var' AS rule, step,
        |       CONCAT(CAST(user_id AS VARCHAR), ',', event_type) AS series,
        |       'none' AS alertstate, value
        |FROM var2
        |UNION ALL
        |SELECT 'grp_p90' AS rule, step,
        |       CONCAT(CAST(user_id AS VARCHAR), ',', event_type) AS series,
        |       'none' AS alertstate, value
        |FROM qx
        |WHERE rn = greatest(1, CAST(ceil(round(n * 0.9, 9)) AS BIGINT))""".stripMargin,
    // CARDINALITY + DISPERSION rule group (round 17): count-by = the
    // number of per-user series with data in the window; stddev-by =
    // population stddev of per-series counts via the exact decimal
    // sum/sumsq chain (the stddev_agg arithmetic over integral counts)
    "q_promql_rule_group_cnt" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |c1 AS (
        |  SELECT st.step, e.user_id, e.event_type, COUNT(*) AS c
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view')
        |  GROUP BY 1, 2, 3),
        |c2 AS (
        |  SELECT st.step, e.user_id, e.event_type, COUNT(*) AS c
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view')
        |  GROUP BY 1, 2, 3)
        |SELECT 'grp_cnt_series' AS rule, step, event_type AS series,
        |       'none' AS alertstate, CAST(COUNT(*) AS DOUBLE) AS value
        |FROM c1 GROUP BY 1, 2, 3, 4
        |UNION ALL
        |SELECT 'grp_dev_series' AS rule, step, event_type AS series,
        |       'none' AS alertstate,
        |       sqrt(greatest(0.0,
        |         (CAST(SUM(CAST(CAST(CAST(c AS DOUBLE) AS DECIMAL(18,6))
        |                   * CAST(CAST(c AS DOUBLE) AS DECIMAL(18,6))
        |                   AS DECIMAL(38,12))) AS DOUBLE)
        |          - CAST(SUM(CAST(CAST(c AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
        |            * CAST(SUM(CAST(CAST(c AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
        |            / COUNT(*)) / COUNT(*))) AS value
        |FROM c2 GROUP BY 1, 2, 3, 4""".stripMargin,
    // PAYLOAD-LABEL rule group (round 17): the k alert's outer sum of
    // per-series counts collapses to the direct count per (step, k)
    // (count decomposes); for:=0 — held rows fire
    "q_promql_rule_group_k" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |ka AS (
        |  SELECT st.step, regexp_extract(e.props, '"k": (\d+)', 1) AS k,
        |         CAST(COUNT(*) AS DOUBLE) AS value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type IN ('click', 'view')
        |  GROUP BY 1, 2),
        |uc AS (
        |  SELECT st.step, e.user_id, CAST(COUNT(*) AS DOUBLE) AS value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click'
        |  GROUP BY 1, 2)
        |SELECT 'grp_k_alert' AS rule, step, k AS series,
        |       'firing' AS alertstate, value
        |FROM ka WHERE value > 1.0
        |UNION ALL
        |SELECT 'grp_usr_cnt' AS rule, step, CAST(user_id AS VARCHAR) AS series,
        |       'none' AS alertstate, value
        |FROM uc""".stripMargin,
    // ROLLUP-SERVED rule group (round 17): the Spark side reads the
    // downsample store; this oracle re-derives every leg from RAW
    // events — the count-alert machine (the alert_keep oracle
    // verbatim), the rate-alert chain (per-pair decimal growth sums,
    // the exactSum vector, the for: machine), the per-user hourly
    // decimal sum (outer exactSum re-quantization included), and the
    // per-series 2h avg — so the hash proves the store partials
    // reproduce the raw evaluation bit-for-bit. Shared (parameterized
    // by rule names) with the LIVE twin, which serves the same group
    // from the STREAM-maintained store's fold bands.
    "q_promql_rule_group_rollup" ->
      groupStoreOracle("ru_hot", "ru_rate_alert", "ru_click_sum1h",
        "ru_view_avg2h"),
    "q_promql_rule_group_live" ->
      groupStoreOracle("rl_hot", "rl_rate_alert", "rl_click_sum1h",
        "rl_view_avg2h"),
    // RULES-FILE entry (round 17): the four group legs are the
    // store-group oracle verbatim; the fifth leg re-derives the
    // fallback alert — integral counts halved in double, for:=0 so
    // every held row fires
    "q_promql_rules_file" ->
      (groupStoreOracle("rf_hot", "rf_rate", "rf_click_sum1h",
        "rf_view_avg2h") +
        """
          |UNION ALL
          |SELECT 'rf_ratio' AS rule, st.step, e.event_type AS series,
          |       'firing' AS alertstate, CAST(COUNT(*) AS DOUBLE) / 2 AS value
          |FROM events e JOIN steps st
          |  ON st.step * 1000000 >= epoch_us(e.ts)
          | AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
          |WHERE e.event_type IN ('click', 'view')
          |GROUP BY 1, 2, 3, 4
          |HAVING CAST(COUNT(*) AS DOUBLE) / 2 > 3""".stripMargin),
    "q_promql_alert" -> alertOracle(0L),
    "q_promql_alert_keep" -> alertOracle(3600L),
    // ALERTS as series (round 16): the per-user activity alert's state
    // machine (for=3600, keep=3600, threshold value > 0), its FIRING
    // rows (held + keep-extension), joined against the raw hourly
    // per-user count — the whole composition from raw events
    "q_promql_alerts_series" ->
      s"""WITH $alertsSeriesCtes,
         |firing AS (
         |  SELECT step, user_id FROM dense
         |  WHERE alertstate = 'firing'
         |     OR (alertstate IS NULL AND last_state = 'firing'
         |         AND step - last_held <= 3600)),
         |raw1h AS (
         |  SELECT st.step, e.user_id, CAST(COUNT(*) AS DOUBLE) AS v
         |  FROM events e JOIN steps st
         |    ON st.step * 1000000 >= epoch_us(e.ts)
         |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
         |  WHERE regexp_full_match(e.event_type, 'click|view|purchase|signup|error')
         |  GROUP BY 1, 2)
         |SELECT f.step, f.user_id, 1.0 * r.v AS value
         |FROM firing f JOIN raw1h r
         |  ON r.step = f.step AND r.user_id = f.user_id""".stripMargin,
    // ALERTS_FOR_STATE (round 16): ActiveAt per active (step, series) —
    // a firing row's episode began when its governing ignition became
    // pending (fire_time − for, stable across bridged gaps); a pending
    // island is its own episode (its start)
    "q_promql_alerts_for_state" ->
      s"""WITH $alertsSeriesCtes
         |SELECT step, user_id,
         |       CAST(COALESCE(active_at, last_active) AS DOUBLE) AS value
         |FROM dense
         |WHERE alertstate IS NOT NULL
         |   OR (last_state = 'firing' AND step - last_held <= 3600)""".stripMargin,
    "q_promql_stepped" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value,
        |         row_number() OVER (PARTITION BY st.step, e.user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click')
        |SELECT step, CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM cov WHERE rn = 1 GROUP BY 1""".stripMargin,
    // true range-query rate: per-step lookback windows, reset-corrected
    // growth summed in DECIMAL exactly like the evaluator's exactSum
    // the wide stepped range verb (1d windows on a 2h grid) — the raw
    // twin whose hash the 1h-level rollup serving must reproduce
    "q_promql_stepped_wide" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704412800, 7200)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 86400) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click')
        |SELECT step, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM cov GROUP BY 1, 2""".stripMargin,
    "q_promql_stepped_rate" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value,
        |         epoch_us(e.ts) AS us, e.event_id
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 3600) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click'),
        |g AS (
        |  SELECT step, user_id, value,
        |         lag(value) OVER (PARTITION BY step, user_id
        |                          ORDER BY us, event_id) AS prev
        |  FROM cov)
        |SELECT step, user_id,
        |  CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0
        |                     WHEN value >= prev THEN value - prev
        |                     ELSE value END AS DECIMAL(30,6))) AS DOUBLE)
        |    / 3600.0 AS value
        |FROM g GROUP BY 1, 2""".stripMargin,
    // the month-long stepped range verb — the raw twin whose hash the
    // hybrid fresh-tail serving (q_promql_stepped_fresh: rollup for
    // closed steps + raw for the open tail) must reproduce (round 15)
    "q_promql_stepped_long" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1706659200, 3600)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click')
        |SELECT step, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM cov GROUP BY 1, 2""".stripMargin,
    // the week-window day-grid stepped verbs — raw twins whose hashes
    // the 1d chain level's serving must reproduce (round 15)
    "q_promql_stepped_vwide" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1706659200, 86400)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 604800) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click')
        |SELECT step, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM cov GROUP BY 1, 2""".stripMargin,
    "q_promql_stepped_rate_1w" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1706659200, 86400)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value,
        |         epoch_us(e.ts) AS us, e.event_id
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 604800) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click'),
        |g AS (
        |  SELECT step, user_id, value,
        |         lag(value) OVER (PARTITION BY step, user_id
        |                          ORDER BY us, event_id) AS prev
        |  FROM cov)
        |SELECT step, user_id,
        |  CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0
        |                     WHEN value >= prev THEN value - prev
        |                     ELSE value END AS DECIMAL(30,6))) AS DOUBLE)
        |    / 604800.0 AS value
        |FROM g GROUP BY 1, 2""".stripMargin,
    // the 2h-window stepped rate — the raw twin whose hash the 1h
    // chain level's counter serving (q_promql_rollup_rate_1h) must
    // reproduce (round 15)
    "q_promql_stepped_rate_2h" ->
      """WITH steps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step),
        |cov AS (
        |  SELECT st.step, e.user_id, e.value,
        |         epoch_us(e.ts) AS us, e.event_id
        |  FROM events e JOIN steps st
        |    ON st.step * 1000000 >= epoch_us(e.ts)
        |   AND (st.step - 7200) * 1000000 < epoch_us(e.ts)
        |  WHERE e.event_type = 'click'),
        |g AS (
        |  SELECT step, user_id, value,
        |         lag(value) OVER (PARTITION BY step, user_id
        |                          ORDER BY us, event_id) AS prev
        |  FROM cov)
        |SELECT step, user_id,
        |  CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0
        |                     WHEN value >= prev THEN value - prev
        |                     ELSE value END AS DECIMAL(30,6))) AS DOUBLE)
        |    / 7200.0 AS value
        |FROM g GROUP BY 1, 2""".stripMargin,
    "q_promql_changes" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id, value,
        |         lag(value) OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type = 'click')
        |SELECT step, user_id,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> value THEN 1 ELSE 0 END) AS DOUBLE) AS value
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_promql_resets" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id, value,
        |         lag(value) OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type = 'purchase')
        |SELECT step, user_id,
        |       CAST(SUM(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END) AS DOUBLE) AS value
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_promql_quantile_ot" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id, value,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400) AS n
        |  FROM events WHERE event_type = 'click')
        |SELECT step, user_id, value FROM x
        |WHERE rn = CAST(ceil(round(n * 0.5, 9)) AS BIGINT)""".stripMargin,
    "q_promql_mad_ot" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step,
        |         user_id, value, event_id
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT step, user_id, value,
        |        row_number() OVER (PARTITION BY step, user_id
        |                           ORDER BY value, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY step, user_id) AS n FROM x),
        |m AS (SELECT step, user_id, value AS med FROM r
        |      WHERE rn = CAST(ceil(round(n * 0.5, 9)) AS BIGINT)),
        |d AS (SELECT x.step, x.user_id, x.event_id, abs(x.value - m.med) AS dev
        |      FROM x JOIN m ON x.step = m.step AND x.user_id = m.user_id),
        |r2 AS (SELECT step, user_id, dev,
        |        row_number() OVER (PARTITION BY step, user_id
        |                           ORDER BY dev, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY step, user_id) AS n FROM d)
        |SELECT step, user_id, dev AS value FROM r2
        |WHERE rn = CAST(ceil(round(n * 0.5, 9)) AS BIGINT)""".stripMargin,
    "q_promql_last_ot" ->
      """SELECT step, user_id, value FROM (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id, value,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |WHERE rn = 1""".stripMargin,
    // 3.x experimental range verbs: first sample's value, and the
    // ts_of_* family (timestamp of the window's extremum / last
    // sample, epoch seconds as double — same int64 µs / 1e6 division
    // on both engines). ts_of ties: latest sample wins (Prometheus
    // iterates in time order with >= / <=), hence DESC time keys.
    "q_promql_first_ot" ->
      """SELECT step, user_id, value FROM (
        |  SELECT ((epoch_us(ts)//1000000) // 21600) * 21600 AS step, user_id, value,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 21600
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |WHERE rn = 1""".stripMargin,
    "q_promql_ts_of_last" ->
      """SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |       MAX(epoch_us(ts)) / 1000000.0 AS value
        |FROM events WHERE event_type = 'view' GROUP BY 1, 2""".stripMargin,
    "q_promql_ts_of_max" ->
      """SELECT step, user_id, epoch_us(ts) / 1000000.0 AS value FROM (
        |  SELECT ((epoch_us(ts)//1000000) // 21600) * 21600 AS step, user_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 21600
        |                            ORDER BY value DESC, epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |WHERE rn = 1""".stripMargin,
    "q_promql_ts_of_min" ->
      """SELECT step, user_id, epoch_us(ts) / 1000000.0 AS value FROM (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400
        |                            ORDER BY value ASC, epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click')
        |WHERE rn = 1""".stripMargin,
    // native-histogram verb family: the window's samples form the
    // implicit schema-0 histogram per (step, series); count/sum/avg
    // read the header, stddev/fraction estimate from the buckets
    // (mirrors of the q_nhist_* oracles keyed (step, user_id))
    "q_promql_hist_count" ->
      """SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |       CAST(COUNT(*) AS DOUBLE) AS value
        |FROM events WHERE event_type = 'view' GROUP BY 1, 2""".stripMargin,
    "q_promql_hist_sum" ->
      """SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM events WHERE event_type = 'view' GROUP BY 1, 2""".stripMargin,
    "q_promql_hist_avg" ->
      """SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |FROM events WHERE event_type = 'purchase' GROUP BY 1, 2""".stripMargin,
    "q_promql_hist_stddev" ->
      s"""WITH h AS (
         |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3),
         |st AS (
         |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         round(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
         |               / CAST(COUNT(*) AS DOUBLE), 12) AS hist_avg
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |t AS (
         |  SELECT h.step, h.user_id, st.n,
         |         CAST((CAST(3.0 * power(2.0, CAST(k AS DOUBLE) - 2.0) AS DECIMAL(16,12))
         |               - CAST(hist_avg AS DECIMAL(16,12)))
         |            * (CAST(3.0 * power(2.0, CAST(k AS DOUBLE) - 2.0) AS DECIMAL(16,12))
         |               - CAST(hist_avg AS DECIMAL(16,12)))
         |            + CAST('0.0000000000005' AS DECIMAL(14,13))
         |           AS DECIMAL(20,12)) * CAST(cnt AS DECIMAL(12,0)) AS term
         |  FROM h JOIN st ON st.step = h.step AND st.user_id = h.user_id)
         |SELECT step, user_id,
         |       sqrt(CAST(CAST(SUM(term) + CAST('0.00005' AS DECIMAL(6,5))
         |                      AS DECIMAL(30,4)) AS DOUBLE)
         |            / CAST(MAX(n) AS DOUBLE)) AS value
         |FROM t GROUP BY 1, 2""".stripMargin,
    "q_promql_hist_fraction" ->
      s"""WITH h AS (
         |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3),
         |t AS (
         |  SELECT step, user_id, cnt,
         |         CAST(round(CAST(cnt AS DOUBLE) * least(1.0,
         |           greatest(0.0, least(3.0, pow(2.0, k))
         |                         - greatest(0.3, pow(2.0, k - 1)))
         |           / (pow(2.0, k) - pow(2.0, k - 1))), 12)
         |           AS DECIMAL(28,12)) AS term
         |  FROM h)
         |SELECT step, user_id,
         |       round(CAST(SUM(term) AS DOUBLE)
         |             / CAST(SUM(cnt) AS DOUBLE), 12) AS value
         |FROM t GROUP BY 1, 2""".stripMargin,
    "q_promql_hist_quantile" ->
      s"""WITH h AS (
         |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
         |         CAST($nhKCase AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3),
         |c AS (
         |  SELECT step, user_id, k, cnt,
         |         SUM(cnt) OVER (PARTITION BY step, user_id ORDER BY k
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY step, user_id) AS n
         |  FROM h)
         |SELECT step, user_id,
         |       round(pow(2.0, k - 1) + (pow(2.0, k) - pow(2.0, k - 1)) *
         |             (CAST(rnk - cum + cnt AS DOUBLE) / CAST(cnt AS DOUBLE)), 12)
         |         AS value
         |FROM (SELECT *, CAST(ceil(round(n * 0.9, 9)) AS BIGINT) AS rnk FROM c)
         |WHERE cum >= rnk AND cum - cnt < rnk""".stripMargin,
    "q_promql_delta" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 21600) * 21600 AS step, user_id, value,
        |         row_number() OVER w_asc  AS rn_a,
        |         row_number() OVER w_desc AS rn_d
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW
        |    w_asc  AS (PARTITION BY user_id, (epoch_us(ts)//1000000) // 21600
        |               ORDER BY ts, event_id),
        |    w_desc AS (PARTITION BY user_id, (epoch_us(ts)//1000000) // 21600
        |               ORDER BY ts DESC, event_id DESC))
        |SELECT step, user_id,
        |       MAX(CASE WHEN rn_d = 1 THEN value END)
        |       - MAX(CASE WHEN rn_a = 1 THEN value END) AS value
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_promql_stddev_ot" ->
      """SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |       sqrt(greatest(0.0,
        |         (CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |                        AS DECIMAL(38,12))) AS DOUBLE)
        |          - CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |            * CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
        |         / COUNT(*))) AS value
        |FROM events WHERE event_type = 'click' GROUP BY 1, 2""".stripMargin,
    "q_promql_deriv" ->
      """WITH g AS (
        |  SELECT ((epoch_us(ts)//1000000) // 3600) * 3600 AS step, user_id,
        |         COUNT(*) AS n,
        |         SUM((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) // 3600) * 3600) AS sx,
        |         SUM(((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) // 3600) * 3600)
        |             * ((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) // 3600) * 3600)) AS sxx,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(CAST((epoch_us(ts)//1000000)
        |                            - ((epoch_us(ts)//1000000) // 3600) * 3600 AS DOUBLE)
        |                       * value AS DECIMAL(30,6))) AS DOUBLE) AS sxy
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step, user_id,
        |       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS value
        |FROM g WHERE n >= 2
        |  AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0""".stripMargin,
    "q_promql_histq" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(COUNT(*) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |x AS (
        |  SELECT step, value,
        |         row_number() OVER (PARTITION BY step ORDER BY value, user_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY step) AS n
        |  FROM per)
        |SELECT step, value FROM x
        |WHERE rn = CAST(ceil(round(n * 0.9, 9)) AS BIGINT)""".stripMargin,
    "q_promql_absent" ->
      """WITH bounds AS (
        |  SELECT CAST(epoch(date_trunc('hour', MIN(ts))) AS BIGINT) AS lo,
        |         CAST(epoch(date_trunc('hour', MAX(ts))) AS BIGINT) AS hi
        |  FROM events),
        |steps AS (SELECT unnest(generate_series(lo, hi, 3600)) AS step FROM bounds),
        |present AS (
        |  SELECT DISTINCT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step
        |  FROM events WHERE event_type = 'error' AND user_id = 1)
        |SELECT s.step, CAST(1.0 AS DOUBLE) AS value
        |FROM steps s
        |WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.step = s.step)""".stripMargin,
    "q_promql_filter" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |HAVING CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) > 500.0""".stripMargin,
    "q_promql_bool" ->
      """SELECT step, user_id,
        |       CASE WHEN value >= 50.0 THEN 1.0 ELSE 0.0 END AS value
        |FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)""".stripMargin,
    "q_promql_and" ->
      """WITH p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.step, p.user_id, p.value FROM p
        |WHERE EXISTS (SELECT 1 FROM c WHERE c.step = p.step AND c.user_id = p.user_id)""".stripMargin,
    "q_promql_unless" ->
      """WITH p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.step, p.user_id, p.value FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.step = p.step AND c.user_id = p.user_id)""".stripMargin,
    // cross-series aggregators over per-series hourly sums: avg =
    // exact decimal sum / count; stddev = population sqrt via exact
    // Σv/Σv² (the determinism contract's kernels); quantile = the
    // discrete stored value at position max(1, ceil(round(n·φ, 9)))
    "q_promql_avg_agg" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT step,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |FROM per GROUP BY 1""".stripMargin,
    "q_promql_stddev_agg" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT step,
        |  sqrt(greatest(0.0,
        |    (CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |                   AS DECIMAL(38,12))) AS DOUBLE)
        |     - CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |       * CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
        |    / COUNT(*))) AS value
        |FROM per GROUP BY 1""".stripMargin,
    "q_promql_count_agg" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step, CAST(COUNT(*) AS DOUBLE) AS value
        |FROM per GROUP BY 1""".stripMargin,
    "q_promql_stdvar_agg" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT step,
        |  greatest(0.0,
        |    (CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
        |                   AS DECIMAL(38,12))) AS DOUBLE)
        |     - CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |       * CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
        |    / COUNT(*)) AS value
        |FROM per GROUP BY 1""".stripMargin,
    "q_promql_quantile_agg" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |x AS (
        |  SELECT step, value,
        |         row_number() OVER (PARTITION BY step ORDER BY value, user_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY step) AS n
        |  FROM per)
        |SELECT step, value FROM x
        |WHERE rn = greatest(1, CAST(ceil(round(n * 0.9, 9)) AS BIGINT))""".stripMargin,
    // or = lhs plus the rhs rows with no lhs match on the vector keys
    "q_promql_or" ->
      """WITH p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step, user_id, value FROM p
        |UNION ALL
        |SELECT c.step, c.user_id, c.value FROM c
        |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.step = c.step AND p.user_id = c.user_id)""".stripMargin,
    "q_promql_bottomk" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT step, user_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY step
        |                               ORDER BY value ASC, user_id) AS rn
        |  FROM per)
        |WHERE rn <= 3""".stripMargin,
    // the Prometheus funcRate edge-extrapolation formula, mirrored
    // op-for-op so every IEEE double step is identical across engines
    "q_promql_rate_extrap" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id, value,
        |         epoch_us(ts) AS us,
        |         lag(value) OVER w AS prev,
        |         row_number() OVER w AS rn
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id, (epoch_us(ts)//1000000) // 86400
        |               ORDER BY ts, event_id)),
        |g AS (
        |  SELECT step, user_id,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0.0
        |                            WHEN value >= prev THEN value - prev
        |                            ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS inc,
        |         MIN(us) AS first_us, MAX(us) AS last_us,
        |         MAX(CASE WHEN rn = 1 THEN value END) AS first_v
        |  FROM x GROUP BY 1, 2
        |  HAVING COUNT(*) >= 2 AND MAX(us) > MIN(us)),
        |f AS (
        |  SELECT step, user_id, n, inc, first_v,
        |         (last_us - first_us) / 1000000.0 AS si,
        |         (last_us - first_us) / 1000000.0 / (n - 1) AS avg_dur,
        |         first_us / 1000000.0 - step AS dstart_raw,
        |         (step + 86400) - last_us / 1000000.0 AS dend_raw
        |  FROM g),
        |z AS (
        |  SELECT step, user_id, inc, si, avg_dur, dend_raw, first_v,
        |         CASE WHEN dstart_raw >= avg_dur * 1.1
        |              THEN avg_dur / 2 ELSE dstart_raw END AS dstart_c
        |  FROM f)
        |SELECT step, user_id,
        |       inc * ((si
        |         + CASE WHEN inc > 0.0 AND first_v >= 0.0
        |                THEN least(dstart_c, si * (first_v / inc))
        |                ELSE dstart_c END
        |         + CASE WHEN dend_raw >= avg_dur * 1.1 THEN avg_dur / 2 ELSE dend_raw END)
        |         / si) AS value
        |FROM z""".stripMargin,
    "q_promql_group_right" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |tot AS (
        |  SELECT step, CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS t
        |  FROM per GROUP BY 1)
        |SELECT per.step, per.user_id, tot.t / per.v AS value
        |FROM per JOIN tot ON per.step = tot.step
        |WHERE per.v <> 0.0""".stripMargin,
    "q_promql_at" ->
      """WITH v AS (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE event_type = 'click'
        |    AND epoch_us(ts) >  1704092800000000
        |    AND epoch_us(ts) <= 1704100000000000),
        |agg AS (
        |  -- HAVING keeps the engine's empty-window semantics: zero rows,
        |  -- not one NULL-valued row replicated across the grid
        |  SELECT CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM v WHERE rn = 1 HAVING COUNT(*) > 0)
        |SELECT st.step, agg.value
        |FROM (SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step) st, agg""".stripMargin,
    "q_promql_subquery" ->
      """WITH isteps AS (
        |  SELECT unnest(generate_series(1704063600, 1704153600, 1800)) AS istep),
        |cov AS (
        |  SELECT i.istep, e.user_id, e.value,
        |         row_number() OVER (PARTITION BY i.istep, e.user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events e JOIN isteps i
        |    ON epoch_us(e.ts) <= i.istep * 1000000
        |   AND epoch_us(e.ts) >  (i.istep - 7200) * 1000000
        |  WHERE e.event_type = 'click'),
        |inner_v AS (
        |  SELECT istep, CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        |  FROM cov WHERE rn = 1 GROUP BY 1),
        |osteps AS (
        |  SELECT unnest(generate_series(1704067200, 1704153600, 3600)) AS step)
        |SELECT o.step, MAX(iv.v) AS value
        |FROM osteps o JOIN inner_v iv
        |  ON iv.istep <= o.step AND iv.istep > o.step - 3600
        |GROUP BY 1""".stripMargin,
    "q_promql_multimetric" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |         user_id, event_type,
        |         CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events
        |  WHERE regexp_full_match(event_type, 'click|view')
        |  GROUP BY 1, 2, 3)
        |SELECT step, event_type,
        |       CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM per GROUP BY 1, 2""".stripMargin,
    "q_promql_topk_by" ->
      """WITH per AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step,
        |         user_id, event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events
        |  WHERE regexp_full_match(event_type, 'click|purchase')
        |  GROUP BY 1, 2, 3)
        |SELECT step, user_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY step, event_type
        |                               ORDER BY value DESC, user_id, event_type) AS rn
        |  FROM per)
        |WHERE rn <= 2""".stripMargin,
    "q_promql_math" ->
      """SELECT step, user_id, CAST(ceil(sqrt(value)) AS DOUBLE) AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)""".stripMargin,
    // precedence: click + purchase * 2 — the * applies to purchase only
    "q_promql_precedence" ->
      """WITH c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.step, c.user_id, c.value + p.value * 2 AS value
        |FROM c JOIN p ON p.step = c.step AND p.user_id = c.user_id""".stripMargin,
    "q_promql_mod" ->
      """SELECT step, user_id, fmod(value, 7) AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    "q_promql_pow" ->
      """SELECT step, user_id, pow(value, 2) AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    "q_promql_unary" ->
      """SELECT step, user_id, 0 - value AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    // atan2/trig: JVM vs libm differ in the last ulp (atan2 maxdiff
    // 2.2e-16; sin 5/1989 values off by 1 ulp at sf0.01), so BOTH
    // engines quantize to 9 decimals before hashing — the measured
    // divergence is ~1e7x below the grid, so the rounded doubles agree
    "q_promql_atan2" ->
      """SELECT step, user_id, round(atan2(value, 1), 9) AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    "q_promql_trig" ->
      """SELECT step, user_id,
        |       round(degrees(atan(sin(value))) * pi(), 9) AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    "q_promql_carry" ->
      """WITH c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.step, c.user_id,
        |       regexp_replace(CAST(c.user_id AS VARCHAR), '^(?:(\d)\d*)$', 't\1') AS tier,
        |       c.value * p.value AS value
        |FROM c JOIN p ON p.step = c.step AND p.user_id = c.user_id""".stripMargin,
    "q_promql_neg_offset" ->
      """SELECT CAST(epoch(date_trunc('hour', ts - INTERVAL 1 HOUR)) AS BIGINT) AS step,
        |       CAST(COUNT(*) AS DOUBLE) AS value
        |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin,
    "q_promql_k_group" ->
      """WITH per AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |         regexp_extract(props, '"k": (\d+)', 1) AS k,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3)
        |SELECT step, k, CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |FROM per GROUP BY 1, 2""".stripMargin,
    "q_promql_k_matcher" ->
      """WITH e AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |         regexp_extract(props, '"k": (\d+)', 1) AS k
        |  FROM events WHERE event_type = 'click')
        |SELECT step, user_id, k, CAST(COUNT(*) AS DOUBLE) AS value
        |FROM e WHERE regexp_full_match(k, '4.*') GROUP BY 1, 2, 3""".stripMargin,
    "q_promql_scalar" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |tot AS (
        |  SELECT step, CAST(SUM(CAST(v AS DECIMAL(30,6))) AS DOUBLE) AS t
        |  FROM per GROUP BY 1)
        |SELECT per.step, per.user_id, per.v / tot.t AS value
        |FROM per JOIN tot ON per.step = tot.step
        |WHERE tot.t <> 0.0""".stripMargin,
    "q_promql_time" ->
      """SELECT step, user_id, value / CAST(step AS DOUBLE) AS value FROM (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    "q_promql_label_replace" ->
      """SELECT step, user_id,
        |       regexp_replace(CAST(user_id AS VARCHAR), '^(?:(\d)\d*)$', 's\1') AS shard,
        |       value
        |FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)""".stripMargin,
    "q_promql_label_join" ->
      """SELECT step, user_id, shard, shard || '-' || CAST(user_id AS VARCHAR) AS sid, value
        |FROM (SELECT step, user_id,
        |        regexp_replace(CAST(user_id AS VARCHAR), '^(?:(\d)\d*)$', 's\1') AS shard,
        |        value
        |      FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |                   CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |            FROM events WHERE event_type = 'click' GROUP BY 1, 2))""".stripMargin,
    "q_promql_irate" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 604800) * 604800 AS step, user_id, value,
        |         epoch_us(ts) AS us,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 604800
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |g AS (
        |  SELECT step, user_id,
        |         MAX(CASE WHEN rn = 1 THEN value END) AS v1,
        |         MAX(CASE WHEN rn = 2 THEN value END) AS v2,
        |         MAX(CASE WHEN rn = 1 THEN us END) AS t1,
        |         MAX(CASE WHEN rn = 2 THEN us END) AS t2
        |  FROM x WHERE rn <= 2 GROUP BY 1, 2)
        |SELECT step, user_id,
        |       (CASE WHEN v1 >= v2 THEN v1 - v2 ELSE v1 END)
        |       / ((t1 - t2) / 1000000.0) AS value
        |FROM g WHERE v2 IS NOT NULL AND t1 <> t2""".stripMargin,
    // idelta: same last-two-samples pivot as irate, but the value is
    // the RAW difference (gauge semantics — no counter-reset clamp, no
    // per-second pacing; zero-elapsed pairs still drop, matching
    // Prometheus instantValue for both verbs)
    "q_promql_idelta" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 604800) * 604800 AS step, user_id, value,
        |         epoch_us(ts) AS us,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 604800
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT step, user_id,
        |         MAX(CASE WHEN rn = 1 THEN value END) AS v1,
        |         MAX(CASE WHEN rn = 2 THEN value END) AS v2,
        |         MAX(CASE WHEN rn = 1 THEN us END) AS t1,
        |         MAX(CASE WHEN rn = 2 THEN us END) AS t2
        |  FROM x WHERE rn <= 2 GROUP BY 1, 2)
        |SELECT step, user_id, v1 - v2 AS value
        |FROM g WHERE v2 IS NOT NULL AND t1 <> t2""".stripMargin,
    // holt_winters: the per-window double-exponential-smoothing fold,
    // unrolled as a recursive CTE that consumes one sample per
    // iteration. Every arithmetic step mirrors the Spark aggregate-HOF
    // fold op-for-op in IEEE doubles (sf=0.5, tf=0.3; the (1.0 - tf)
    // constants are written as the same subtraction both engines fold),
    // so the sequential recurrence — previously declared not
    // SQL-expressible — hashes bit-identically. Chains are
    // window-bounded (samples per series-week), never corpus-sized.
    "q_promql_holt" ->
      """WITH x AS (
        |  SELECT ((epoch_us(ts)//1000000) // 604800) * 604800 AS step, user_id, value,
        |         row_number() OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 604800
        |                            ORDER BY epoch_us(ts), event_id) AS i,
        |         COUNT(*) OVER (PARTITION BY user_id, (epoch_us(ts)//1000000) // 604800) AS n
        |  FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT * FROM x WHERE n >= 2),
        |rec AS (
        |  WITH RECURSIVE r(step, user_id, n, i, s0, s1, b) AS (
        |    SELECT step, user_id, MAX(n), 1,
        |           CAST(0.0 AS DOUBLE),
        |           MAX(CASE WHEN i = 1 THEN value END),
        |           MAX(CASE WHEN i = 2 THEN value END)
        |             - MAX(CASE WHEN i = 1 THEN value END)
        |    FROM s WHERE i <= 2 GROUP BY step, user_id
        |    UNION ALL
        |    SELECT r.step, r.user_id, r.n, r.i + 1,
        |           r.s1,
        |           0.5 * e.value + (1.0 - 0.5) * (r.s1 +
        |             CASE WHEN r.i = 1 THEN r.b
        |                  ELSE 0.3 * (r.s1 - r.s0) + (1.0 - 0.3) * r.b END),
        |           CASE WHEN r.i = 1 THEN r.b
        |                ELSE 0.3 * (r.s1 - r.s0) + (1.0 - 0.3) * r.b END
        |    FROM r JOIN s e ON e.step = r.step AND e.user_id = r.user_id
        |                   AND e.i = r.i + 1)
        |  SELECT * FROM r)
        |SELECT step, user_id, s1 AS value FROM rec WHERE i = n""".stripMargin,
    "q_promql_predict" ->
      """WITH g AS (
        |  SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |         COUNT(*) AS n,
        |         SUM((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) // 86400) * 86400) AS sx,
        |         SUM(((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) // 86400) * 86400)
        |             * ((epoch_us(ts)//1000000) - ((epoch_us(ts)//1000000) // 86400) * 86400)) AS sxx,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(CAST((epoch_us(ts)//1000000)
        |                            - ((epoch_us(ts)//1000000) // 86400) * 86400 AS DOUBLE)
        |                       * value AS DECIMAL(30,6))) AS DOUBLE) AS sxy
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |g2 AS (
        |  SELECT step, user_id, n, sx, sy,
        |         (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS den,
        |         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM g WHERE n >= 2)
        |SELECT step, user_id,
        |       (sy - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |       + slope * 90000.0 AS value
        |FROM g2 WHERE den <> 0.0""".stripMargin,
    "q_promql_timestamp" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |       CAST(MAX(epoch_us(ts)) AS DOUBLE) / 1000000.0 AS value
        |FROM events WHERE event_type = 'purchase' GROUP BY 1, 2""".stripMargin,
    "q_promql_present" ->
      """SELECT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step, user_id,
        |       CAST(1.0 AS DOUBLE) AS value
        |FROM events WHERE event_type = 'purchase' GROUP BY 1, 2""".stripMargin,
    "q_promql_absent_ot" ->
      """WITH bounds AS (
        |  SELECT ((epoch_us(MIN(ts))//1000000) // 86400) * 86400 AS lo,
        |         ((epoch_us(MAX(ts))//1000000) // 86400) * 86400 AS hi
        |  FROM events),
        |steps AS (SELECT unnest(generate_series(lo, hi, 86400)) AS step FROM bounds),
        |present AS (
        |  SELECT DISTINCT ((epoch_us(ts)//1000000) // 86400) * 86400 AS step
        |  FROM events WHERE event_type = 'error' AND user_id = 1)
        |SELECT s.step, CAST(1.0 AS DOUBLE) AS value
        |FROM steps s
        |WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.step = s.step)""".stripMargin,
    "q_promql_clamp" ->
      """SELECT step, user_id, least(greatest(value, 30.0), 60.0) AS value
        |FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)""".stripMargin,
    "q_promql_hour" ->
      """SELECT step, user_id,
        |       CAST((CAST(floor(value) AS BIGINT) % 86400) // 3600 AS DOUBLE) AS value
        |FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |             CAST(MAX(epoch_us(ts)) AS DOUBLE) / 1000000.0 AS value
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)""".stripMargin,
    "q_promql_group" ->
      """SELECT DISTINCT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step,
        |       CAST(1.0 AS DOUBLE) AS value
        |FROM events WHERE event_type = 'click'""".stripMargin,
    // date-component verbs: value = epoch seconds -> the date via pure
    // epoch-day arithmetic (timezone-free, the Spark side's rule);
    // DuckDB dayofweek is already 0=Sunday like PromQL
    "q_promql_date_fns" ->
      """WITH v AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(MAX(epoch_us(ts)) AS DOUBLE) / 1000000.0 AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |d AS (SELECT step, user_id,
        |        DATE '1970-01-01' +
        |          CAST(CAST(floor(value) AS BIGINT) // 86400 AS INT) AS dd
        |      FROM v)
        |SELECT step, user_id,
        |  CAST(dayofweek(dd) + 100 * dayofmonth(last_day(dd))
        |       + 10000 * month(dd) + 1000000 * dayofyear(dd) AS DOUBLE) AS value
        |FROM d""".stripMargin,
    "q_promql_count_values" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(COUNT(*) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step,
        |       CASE WHEN v = floor(v) THEN CAST(CAST(v AS BIGINT) AS VARCHAR)
        |            ELSE CAST(v AS VARCHAR) END AS cnt,
        |       CAST(COUNT(*) AS DOUBLE) AS value
        |FROM per GROUP BY 1, 2""".stripMargin,
    "q_promql_sort" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT step, user_id, value,
        |       CAST(row_number() OVER (PARTITION BY step ORDER BY value ASC, user_id) AS INTEGER) AS rank
        |FROM per""".stripMargin,
    // label-value sort is lexicographic on the label STRING ("10"<"2")
    "q_promql_sort_by_label" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step, user_id, value,
        |       CAST(row_number() OVER (PARTITION BY step
        |         ORDER BY CAST(user_id AS VARCHAR), value) AS INTEGER) AS rank
        |FROM per""".stripMargin,
    "q_promql_sort_desc" ->
      """WITH per AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT step, user_id, value,
        |       CAST(row_number() OVER (PARTITION BY step ORDER BY value DESC, user_id) AS INTEGER) AS rank
        |FROM per""".stripMargin,
    "q_promql_ratio" ->
      """WITH p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v_l
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v_r
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.step, p.user_id, v_l / v_r AS value
        |FROM p JOIN c ON p.step = c.step AND p.user_id = c.user_id
        |WHERE v_r <> 0.0""".stripMargin,
    "q_quantile_over_time" ->
      """WITH x AS (
        |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS step,
        |         user_id, event_type, value, event_id,
        |         row_number() OVER (PARTITION BY date_trunc('day', ts), user_id, event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY date_trunc('day', ts), user_id, event_type) AS n
        |  FROM events)
        |SELECT step, user_id, event_type, value AS p50 FROM x
        |WHERE rn = CAST(ceil(round(n * 0.5, 9)) AS BIGINT)""".stripMargin,
    "q_mad_over_time" ->
      """WITH x AS (
        |  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS step,
        |         user_id, event_type, value, event_id,
        |         row_number() OVER (PARTITION BY date_trunc('day', ts), user_id, event_type
        |                            ORDER BY value, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY date_trunc('day', ts), user_id, event_type) AS n
        |  FROM events),
        |m AS (SELECT step, user_id, event_type, value AS med FROM x
        |      WHERE rn = CAST(ceil(round(n * 0.5, 9)) AS BIGINT)),
        |d AS (SELECT x.step, x.user_id, x.event_type, x.event_id,
        |             abs(x.value - m.med) AS dev
        |      FROM x JOIN m ON x.step = m.step AND x.user_id = m.user_id
        |                   AND x.event_type = m.event_type),
        |r AS (SELECT step, user_id, event_type, dev,
        |             row_number() OVER (PARTITION BY step, user_id, event_type
        |                                ORDER BY dev, event_id) AS rn,
        |             COUNT(*) OVER (PARTITION BY step, user_id, event_type) AS n
        |      FROM d)
        |SELECT step, user_id, event_type, dev AS mad FROM r
        |WHERE rn = CAST(ceil(round(n * 0.5, 9)) AS BIGINT)""".stripMargin,
    "q_vector_ratio" ->
      """WITH p AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS v_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.step, p.user_id, v_purchase / v_click AS ratio
        |FROM p JOIN c ON p.step = c.step AND p.user_id = c.user_id
        |WHERE v_click <> 0.0""".stripMargin,
    "q_absent" ->
      """WITH bounds AS (
        |  SELECT CAST(epoch(date_trunc('hour', MIN(ts))) AS BIGINT) AS lo,
        |         CAST(epoch(date_trunc('hour', MAX(ts))) AS BIGINT) AS hi
        |  FROM events),
        |steps AS (SELECT unnest(generate_series(lo, hi, 3600)) AS step FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |present AS (
        |  SELECT DISTINCT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, event_type
        |  FROM events)
        |SELECT s.step, t.event_type
        |FROM steps s CROSS JOIN types t
        |WHERE NOT EXISTS (SELECT 1 FROM present p
        |                  WHERE p.step = s.step AND p.event_type = t.event_type)""".stripMargin,
  )

  /** Exact-integer PageRank mirror of [[graft.operators.Graph.pagerank]]:
    * the same fixed iteration count UNROLLED as chained CTEs (recursive
    * CTEs forbid aggregation over the recursive term), every step
    * integer arithmetic (`//` floor division on positive values ≡
    * Spark's `div`), so the hash proves all `Iters` iterations
    * bit-for-bit. SUM promotes to HUGEINT in DuckDB — the final CAST
    * lands it back on BIGINT like Spark's 64-bit sum (values stay under
    * 2⁶³ by the mass bound: Σranks ≤ 10¹²).
    */
  private lazy val pagerankSql: String = {
    import graft.operators.Graph.{DampingNum, Iters, Scale}
    val head =
      s"""WITH e0 AS (SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         |od AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),
         |e AS (SELECT e0.src, e0.dst, od.outdeg FROM e0 JOIN od USING (src)),
         |nn AS (SELECT COUNT(*) AS n FROM nation),
         |r0 AS (SELECT n_nationkey AS node,
         |         CAST($Scale // (SELECT n FROM nn) AS BIGINT) AS r
         |       FROM nation)""".stripMargin
    val its = (1 to Iters).map { i =>
      s"""r$i AS (SELECT nat.n_nationkey AS node,
         |  CAST((15 * $Scale) // (100 * (SELECT n FROM nn)) +
         |       ($DampingNum * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
         |  FROM nation nat LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.r // e.outdeg) AS contrib
         |    FROM e JOIN r${i - 1} p ON p.node = e.src GROUP BY e.dst) c
         |  ON c.node = nat.n_nationkey)""".stripMargin
    }
    (head +: its).mkString(",\n") +
      s"""
         |SELECT n.n_name AS nation, r.r AS rank_scaled,
         |       CAST(r.r AS DOUBLE) / 1e12 AS rank
         |FROM r$Iters r JOIN nation n ON n.n_nationkey = r.node""".stripMargin
  }

  /** Degree-ordered-orientation triangle count mirror of
    * [[graft.operators.Graph.triangleCount]]: the same orientation,
    * wedge, and closing joins as SQL; tuple comparisons `(d, id) <
    * (d, id)` are the struct comparisons Spark evaluates. COUNT is
    * BIGINT in DuckDB (only SUM promotes to HUGEINT), so no cast
    * gymnastics are needed.
    */
  private lazy val triangleSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (SELECT DISTINCT a.pk AS x, b.pk AS y
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |deg AS (SELECT node, COUNT(*) AS deg FROM (
      |    SELECT x AS node FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
      |o AS (SELECT
      |    CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.x ELSE e.y END AS u,
      |    CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.y ELSE e.x END AS v,
      |    CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN dy.deg ELSE dx.deg END AS dv
      |  FROM e JOIN deg dx ON dx.node = e.x JOIN deg dy ON dy.node = e.y),
      |wd AS (SELECT l.u, l.v, r.v AS w
      |       FROM o l JOIN o r ON l.u = r.u AND (l.dv, l.v) < (r.dv, r.v)),
      |tri AS (SELECT wd.u, wd.v, wd.w
      |        FROM wd JOIN o c ON c.u = wd.v AND c.v = wd.w)
      |SELECT part_id, COUNT(*) AS n_tri FROM (
      |  SELECT u AS part_id FROM tri
      |  UNION ALL SELECT v FROM tri
      |  UNION ALL SELECT w FROM tri)
      |GROUP BY 1""".stripMargin

  /** Truncated harmonic centrality mirror of
    * [[graft.operators.Graph.harmonic]]: the strong-trade quartile cut
    * via the SAME discrete (w, a, b) rank statistic (total order — the
    * pair key is unique — so rank-keep ≡ Spark's struct-threshold
    * keep), then [[graft.operators.Graph.HarmonicRadius]] min-plus BFS
    * rounds unrolled as chained CTEs, integer `//` harmonic terms.
    */
  private lazy val harmonicSql: String = {
    import graft.operators.Graph.{HarmonicRadius, Scale}
    val head =
      s"""WITH e0 AS (SELECT least(c.c_nationkey, s.s_nationkey) AS a,
         |    greatest(c.c_nationkey, s.s_nationkey) AS b, COUNT(*) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  WHERE c.c_nationkey <> s.s_nationkey
         |  GROUP BY 1, 2),
         |rk AS (SELECT a, b, row_number() OVER (ORDER BY w, a, b) AS r,
         |              COUNT(*) OVER () AS n FROM e0),
         |keep AS (SELECT a, b FROM rk WHERE r > CAST(ceil(0.75 * n) AS BIGINT)),
         |adj AS (SELECT a AS src, b AS t FROM keep
         |        UNION ALL SELECT b, a FROM keep),
         |d0 AS (SELECT n_nationkey AS o, n_nationkey AS nd, 0 AS d FROM nation)""".stripMargin
    val rounds = (1 to HarmonicRadius).map { i =>
      s"""d$i AS (SELECT o, nd, MIN(d) AS d FROM (
         |  SELECT o, nd, d FROM d${i - 1}
         |  UNION ALL
         |  SELECT p.o, adj.t AS nd, p.d + 1 AS d
         |  FROM d${i - 1} p JOIN adj ON p.nd = adj.src) GROUP BY 1, 2)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"""
         |, contrib AS (SELECT nd AS node, CAST(SUM($Scale // d) AS BIGINT) AS h
         |              FROM d$HarmonicRadius WHERE d > 0 GROUP BY 1)
         |SELECT n.n_name AS nation, COALESCE(c.h, 0) AS harmonic_scaled,
         |       CAST(COALESCE(c.h, 0) AS DOUBLE) / 1e12 AS harmonic
         |FROM nation n LEFT JOIN contrib c ON c.node = n.n_nationkey""".stripMargin
  }

  private val relational: Map[String, String] = Map(
    "q_pagerank" -> pagerankSql,
    "q_triangle_count" -> triangleSql,
    // weakly connected components over the support-thresholded
    // co-purchase graph: transitive closure by recursive CTE (the
    // dedup_clusters pattern), min reachable part id as the label
    "q_components" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e AS (SELECT a.pk AS x, b.pk AS y
         |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         |      GROUP BY 1, 2
         |      HAVING COUNT(*) >= ${graft.operators.Graph.ComponentsSupport}),
         |sym AS (SELECT x AS id1, y AS id2 FROM e UNION SELECT y, x FROM e),
         |nodes AS (SELECT DISTINCT id1 AS id FROM sym),
         |r AS (
         |  WITH RECURSIVE reach(id, m) AS (
         |    SELECT id, id FROM nodes
         |    UNION
         |    SELECT s.id1, reach.m FROM sym s JOIN reach ON reach.id = s.id2)
         |  SELECT * FROM reach)
         |SELECT id AS part_id, MIN(m) AS component_id FROM r GROUP BY 1""".stripMargin,
    "q_harmonic" -> harmonicSql,
    // label propagation unrolled per synchronous round (the pagerank
    // pattern): neighbor-label counts + packed-key arg_max per node.
    // MATERIALIZED on the label tables — each feeds the next round.
    "q_labelprop" -> {
      val r = graft.operators.Graph.LabelPropRounds
      val head =
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           |e AS MATERIALIZED (SELECT a.pk AS x, b.pk AS y
           |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           |      GROUP BY 1, 2
           |      HAVING COUNT(*) >= ${graft.operators.Graph.ComponentsSupport}),
           |sym AS MATERIALIZED (SELECT x AS src, y AS dst FROM e
           |      UNION ALL SELECT y, x FROM e),
           |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lab FROM sym)""".stripMargin
      val rounds = (0 until r).map { i =>
        s"""c$i AS (SELECT s.src, l.lab, COUNT(*) AS c FROM sym s
           |  JOIN l$i l ON l.node = s.dst GROUP BY 1, 2),
           |l${i + 1} AS MATERIALIZED (SELECT src AS node,
           |    arg_max(lab, CAST(c AS HUGEINT) * 9223372036854775808 - lab) AS lab
           |  FROM c$i GROUP BY 1)""".stripMargin
      }
      (Seq(head) ++ rounds).mkString(",\n") +
        s"""
           |SELECT node AS part_id, CAST(lab AS BIGINT) AS community_id
           |FROM l$r""".stripMargin
    },
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    // TPC-H Q13 shape: LEFT join keeps zero-order customers; the
    // priority filter must sit in the join condition
    // Q4 shape: EXISTS via semi join (returned-line stand-in for the
    // commit/receipt date pair the synthetic schema lacks)
    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,
    "q12_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |                  OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
        |                 AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q14_promo" ->
      """SELECT 100.0 *
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q19_discount" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1.0 AND 11.0)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10.0 AND 20.0)
        |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,
    "q13_custdist" ->
      """WITH oc AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist FROM oc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // TPC-H Q22 shape: global scalar threshold (cross-multiplied to
    // cents) + anti join on orders
    "q22_idle_rich" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        |st AS (SELECT SUM(bal_c) AS sum_c, COUNT(*) AS n FROM c WHERE bal_c > 0),
        |idle AS (SELECT c.* FROM c WHERE NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT'))
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS totacctbal
        |FROM idle, st WHERE bal_c * n > sum_c
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q18 shape: the HAVING subquery as a pre-join aggregate;
    // top-100 deterministic under the unique orderkey tiebreak
    "q18_big_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT)
        |         AS orderdate,
        |       o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    // TPC-H Q21 shape: the EXISTS/NOT-EXISTS pair as one per-order
    // aggregate; returnflag='R' is the lateness stand-in (no
    // receipt/commit dates in this corpus)
    "q21_waiting_supp" ->
      """WITH ps AS (SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
        |  FROM lineitem GROUP BY 1, 2),
        |po AS (SELECT l_orderkey, COUNT(*) AS ns, SUM(r) AS nr,
        |    MAX(CASE WHEN r = 1 THEN l_suppkey END) AS rs
        |  FROM ps GROUP BY 1)
        |SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM po JOIN supplier ON rs = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE ns >= 2 AND nr = 1 AND n_nationkey % 5 = 3
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_name""".stripMargin,
    // TPC-H Q17 shape, decorrelated: per-part avg as an aggregate
    // join; qty < avg/5 cross-multiplied to the exact integer test
    "q17_small_qty" ->
      """WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'),
        |li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         l_extendedprice
        |       FROM lineitem JOIN p ON p_partkey = l_partkey),
        |st AS (SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS n
        |       FROM li GROUP BY 1)
        |SELECT coalesce(
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0,
        |    0.0) AS avg_yearly
        |FROM li JOIN st USING (l_partkey) WHERE 5 * qty * n < sum_qty""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |       CAST(epoch(date_trunc('second', o_orderdate)) AS BIGINT) AS orderdate,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3""".stripMargin,
    "q_orders_enrich" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
        |       AS DECIMAL(30,6))) AS DOUBLE) AS finished_value,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_salted_join" ->
      """WITH t AS (SELECT event_type,
        |             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS type_avg
        |           FROM events GROUP BY 1)
        |SELECT event_id, e.event_type, value, type_avg, value - type_avg AS value_vs_avg
        |FROM events e JOIN t ON e.event_type = t.event_type""".stripMargin,
    "q_bucketed_join" ->
      """WITH ua AS (
        |  SELECT user_id,
        |         CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS user_avg
        |  FROM events GROUP BY 1)
        |SELECT event_id, e.user_id, value, user_avg, value - user_avg AS dev
        |FROM events e JOIN ua ON e.user_id = ua.user_id""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, 'no_pending' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |UNION ALL
        |SELECT c_custkey, 'big_spender' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)""".stripMargin,
    // as-of semantics spelled as a correlated LATERAL top-1: the latest
    // purchase at-or-before each click, ties broken by event_id — the
    // same deterministic pick the union-tag window makes.
    "q_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
        |       m.purchase_us, m.purchase_value
        |FROM c LEFT JOIN LATERAL (
        |  SELECT epoch_us(p.ts) AS purchase_us, p.value AS purchase_value
        |  FROM p WHERE p.user_id = c.user_id AND p.ts <= c.ts
        |  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) m ON TRUE""".stripMargin,
    // knob values interpolated from Relational's default constants —
    // the oracle pins the default-knob configuration BY CONSTRUCTION
    // (a changed default changes both sides together)
    "q_asof_tolerance" ->
      asofToleranceSql(graft.operators.Relational.DefaultToleranceSec),
    // the same operators at a NON-default knob (15 min), so the oracle
    // exercises the parameter plumbing, not just the default constants
    "q_asof_tolerance_15m" -> asofToleranceSql(900L),
    "q_interval_join" ->
      intervalJoinSql(graft.operators.Relational.DefaultIntervalWidthSec),
    "q_interval_join_15m" -> intervalJoinSql(900L),
    // ordered event-stream analytics: the session/funnel/cohort family.
    // The default-knob session oracle interpolates Behavior's constant;
    // the 30m sibling exercises the gap parameter end to end.
    "q_sessionize" ->
      sessionizeSql(graft.operators.Behavior.DefaultSessionGapSec),
    "q_sessionize_30m" -> sessionizeSql(1800L),
    // native session_window semantics: a successor merges only when
    // diff < gap (strict window overlap) — own oracle, no session_idx
    "q_sessionize_native" -> {
      val gapUs = graft.operators.Behavior.DefaultSessionGapSec * 1000000L
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
         |f AS (SELECT user_id, ts_us, event_id, value,
         |        CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
         |                  OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) >= $gapUs
         |             THEN 1 ELSE 0 END AS is_new
         |      FROM e),
         |g AS (SELECT user_id, ts_us, value,
         |        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |      FROM f)
         |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
         |       COUNT(*) AS n_events,
         |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
         |FROM g GROUP BY user_id, session_idx""".stripMargin
    },
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |           FROM events WHERE event_type IN ('view','click','purchase')),
        |s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END) OVER
        |         (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_view_before
        |       FROM e),
        |s2 AS (SELECT *, CASE WHEN event_type = 'click' AND first_view_before IS NOT NULL
        |                      THEN ts_us END AS qual_click FROM s1),
        |s3 AS (SELECT *, MIN(qual_click) OVER
        |         (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_qual_click_before
        |       FROM s2),
        |s4 AS (SELECT user_id,
        |         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |         MAX(CASE WHEN qual_click IS NOT NULL THEN 1 ELSE 0 END) AS vc,
        |         MAX(CASE WHEN event_type = 'purchase' AND first_qual_click_before IS NOT NULL
        |             THEN 1 ELSE 0 END) AS vcp
        |       FROM s3 GROUP BY user_id)
        |SELECT CAST(SUM(v) AS BIGINT) AS n_view,
        |       CAST(SUM(vc) AS BIGINT) AS n_view_click,
        |       CAST(SUM(vcp) AS BIGINT) AS n_view_click_purchase FROM s4""".stripMargin,
    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, day, MIN(day) OVER (PARTITION BY user_id) AS first_day FROM e)
        |SELECT first_day // 7 AS cohort_week, (day - first_day) // 7 AS week_offset,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM f GROUP BY 1, 2""".stripMargin,
    // grouping sets: GROUPING() arithmetic mirrors Spark's grouping_id
    // bit order (leftmost grouping column = most significant bit)
    "q_rollup" ->
      """SELECT r_name, n_name,
        |       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q_cube" ->
      """WITH e AS (SELECT event_type, user_id % 10 AS decile, value FROM events)
        |SELECT event_type, decile,
        |       CAST(GROUPING(event_type) * 2 + GROUPING(decile) AS BIGINT) AS gid,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM e GROUP BY CUBE (event_type, decile)""".stripMargin,
    "q_grouping_sets" ->
      """WITH e AS (SELECT event_type, user_id % 10 AS decile, value FROM events)
        |SELECT event_type, decile,
        |       CAST(GROUPING(event_type) * 2 + GROUPING(decile) AS BIGINT) AS gid,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM e
        |GROUP BY GROUPING SETS ((event_type, decile), (event_type), (decile))""".stripMargin,
    "q_window_range_frame" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       COUNT(*) OVER w AS n_1h,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_ntile" ->
      """SELECT event_id, event_type,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS "view",
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id""".stripMargin,
  )

  private def sessionizeSql(gapSec: Long): String = {
    val gapUs = gapSec * 1000000L
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events),
       |f AS (SELECT user_id, ts_us, event_id, value,
       |        CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
       |                  OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > $gapUs
       |             THEN 1 ELSE 0 END AS is_new
       |      FROM e),
       |g AS (SELECT user_id, ts_us, value,
       |        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |      FROM f)
       |SELECT user_id, session_idx, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
       |FROM g GROUP BY user_id, session_idx""".stripMargin
  }

  private def asofToleranceSql(tolSec: Long): String =
    s"""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
       |     p AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase')
       |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
       |       m.purchase_us, m.purchase_value
       |FROM c JOIN LATERAL (
       |  SELECT epoch_us(p.ts) AS purchase_us, p.value AS purchase_value
       |  FROM p WHERE p.user_id = c.user_id AND p.ts <= c.ts
       |    AND p.ts >= c.ts - INTERVAL $tolSec SECOND
       |  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) m ON TRUE""".stripMargin

  private def intervalJoinSql(widthSec: Long): String =
    s"""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       |     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
       |SELECT p.event_id AS purchase_id, p.user_id,
       |       COUNT(*) AS n_clicks,
       |       CAST(SUM(CAST(c.value AS DECIMAL(30,6))) AS DOUBLE) AS click_value_sum
       |FROM p JOIN c ON c.user_id = p.user_id
       |             AND c.ts >= p.ts
       |             AND c.ts < p.ts + INTERVAL $widthSec SECOND
       |GROUP BY 1, 2""".stripMargin

  /** The chunk store (reference data model: one row per chunk, sorted by
    * mint/maxt/labels). Oracles recompute the metadata and round-trip
    * straight from the events table.
    */
  private val chunks: Map[String, String] = Map(
    "q_chunk_meta" ->
      """SELECT user_id, event_type,
        |       MIN(epoch_us(ts)) AS mint, MAX(epoch_us(ts)) AS maxt,
        |       CAST(COUNT(*) AS INTEGER) AS n_samples
        |FROM events
        |GROUP BY user_id, event_type, epoch_us(ts) // 3600000000""".stripMargin,
    "q_chunk_roundtrip" ->
      "SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events",
    "q_chunk_range" ->
      """SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events
        |WHERE epoch_us(ts) >= 1704153600000000 AND epoch_us(ts) <= 1704240000000000""".stripMargin,
    // the z-ordered store must round-trip content exactly; the layout
    // (file clustering) is asserted by ZOrderSpec, the oracle checks
    // the 2-D scan's result set
    "q_zorder_scan" ->
      """SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us
        |FROM events
        |WHERE user_id >= 10 AND user_id <= 19
        |  AND epoch_us(ts) >= 1704153600000000
        |  AND epoch_us(ts) <= 1704240000000000""".stripMargin,
    // downsampling rollup: the 5m store row-for-row from raw events.
    // first/last use the packed (µs, event_id) arg-key — HUGEINT here,
    // the Spark side orders by the (us, event_id) STRUCT; the HUGEINT
    // us*2^63 + event_id packing is order-identical for nonnegative
    // BIGINT ids (the pair is unique, so the pick never ties)
    "q_downsample" ->
      """SELECT (epoch_us(ts) // 300000000) * 300 AS bucket,
        |       user_id, event_type,
        |       COUNT(*) AS n_samples,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value,
        |       arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 9223372036854775808 + event_id) AS first_value,
        |       arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 9223372036854775808 + event_id) AS last_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // the 1h chain level STRAIGHT FROM RAW — Spark builds it from the
    // 300s store, so the hash proves every carried partial (sums,
    // order stats, endpoints, counter inc_dec) re-merges exactly
    // through the intermediate level. inc_sum mirrors the evaluator's
    // lag fold: per-pair growth quantized to DECIMAL(30,6), summed,
    // NULL when the hour holds no consecutive pair.
    "q_downsample_1h" ->
      """WITH g AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket,
        |         user_id, event_type, value,
        |         epoch_us(ts) AS us, event_id,
        |         lag(value) OVER (PARTITION BY user_id, event_type,
        |                            epoch_us(ts) // 3600000000
        |                          ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events)
        |SELECT bucket, user_id, event_type,
        |       COUNT(*) AS n_samples,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value,
        |       arg_min(value, CAST(us AS HUGEINT) * 9223372036854775808 + event_id) AS first_value,
        |       arg_max(value, CAST(us AS HUGEINT) * 9223372036854775808 + event_id) AS last_value,
        |       CAST(SUM(CAST(CASE WHEN prev IS NULL THEN NULL
        |                          WHEN value >= prev THEN value - prev
        |                          ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS inc_sum
        |FROM g GROUP BY 1, 2, 3""".stripMargin,
    // the 1d chain level (round 15): the same aggregation straight
    // over raw events with within-DAY lag pairs — the hash proves the
    // twice-folded store (300s -> 1h -> 1d) re-merges every partial
    "q_downsample_1d" ->
      """WITH g AS (
        |  SELECT (epoch_us(ts) // 86400000000) * 86400 AS bucket,
        |         user_id, event_type, value,
        |         epoch_us(ts) AS us, event_id,
        |         lag(value) OVER (PARTITION BY user_id, event_type,
        |                            epoch_us(ts) // 86400000000
        |                          ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events)
        |SELECT bucket, user_id, event_type,
        |       COUNT(*) AS n_samples,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value,
        |       arg_min(value, CAST(us AS HUGEINT) * 9223372036854775808 + event_id) AS first_value,
        |       arg_max(value, CAST(us AS HUGEINT) * 9223372036854775808 + event_id) AS last_value,
        |       CAST(SUM(CAST(CASE WHEN prev IS NULL THEN NULL
        |                          WHEN value >= prev THEN value - prev
        |                          ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS inc_sum
        |FROM g GROUP BY 1, 2, 3""".stripMargin,
    // daily sums from the 1h level vs the same daily sum over raw —
    // the chain's re-aggregation contract at the next grain up
    "q_downsample_sum_1d" ->
      """SELECT (epoch_us(ts) // 86400000000) * 86400 AS step, event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // merge-on-read upsert: the oracle rebuilds the same base ∪ delta
    // union and resolves latest-per-key with the identical arg-max
    "q_upsert_latest" ->
      """WITH u AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |         value, CAST(1 AS BIGINT) AS version
        |  FROM events
        |  UNION ALL
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |         value + 1000.0, CAST(2 AS BIGINT) AS version
        |  FROM events WHERE user_id % 7 = 0)
        |SELECT event_id, MIN(user_id) AS user_id,
        |       MIN(event_type) AS event_type, MIN(us) AS us,
        |       arg_max(value, version) AS value, MAX(version) AS version
        |FROM u GROUP BY event_id""".stripMargin,
    // full merge semantics: update batch at v2, tombstone batch at v3;
    // latest version wins and a winning tombstone drops the key
    "q_upsert_tombstone" ->
      """WITH u AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |         value, CAST(1 AS BIGINT) AS version, false AS deleted
        |  FROM events
        |  UNION ALL
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |         value + 1000.0, CAST(2 AS BIGINT) AS version, false AS deleted
        |  FROM events WHERE user_id % 7 = 0
        |  UNION ALL
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |         value, CAST(3 AS BIGINT) AS version, true AS deleted
        |  FROM events WHERE user_id % 13 = 0)
        |SELECT event_id, user_id, event_type, us, value, version FROM (
        |  SELECT event_id, MIN(user_id) AS user_id,
        |         MIN(event_type) AS event_type, MIN(us) AS us,
        |         arg_max(value, version) AS value,
        |         arg_max(deleted, version) AS del,
        |         MAX(version) AS version
        |  FROM u GROUP BY event_id)
        |WHERE NOT del""".stripMargin,
    // change-data-feed: per-key mutation history with change types
    // derived from version order (first = insert, tombstone = delete,
    // later value = update) — mirrors UpsertStore.changelog
    "q_upsert_changelog" ->
      """WITH u AS (
        |  SELECT event_id, value, CAST(1 AS BIGINT) AS version, false AS deleted
        |  FROM events
        |  UNION ALL
        |  SELECT event_id, value + 1000.0, CAST(2 AS BIGINT), false
        |  FROM events WHERE user_id % 7 = 0
        |  UNION ALL
        |  SELECT event_id, value, CAST(3 AS BIGINT), true
        |  FROM events WHERE user_id % 13 = 0)
        |SELECT event_id, version, value,
        |  CASE WHEN lag(version) OVER (PARTITION BY event_id ORDER BY version) IS NULL
        |         THEN 'insert'
        |       WHEN deleted THEN 'delete'
        |       ELSE 'update' END AS change_type
        |FROM u""".stripMargin,
  )

  def all: Map[String, String] = {
    val base = scanDistinct ++ timeSeries ++ relational ++ chunks ++ Pipelines.oracles
    // the native TopKPerKey variants must produce byte-identical results
    // to their window formulations, so they share the same oracle
    base ++ Map(
      "q_topk_native" -> base("q_topk"),
      // the HyperBall-iteration form must EQUAL the BFS harmonic —
      // exact 64-bit masks make the sketch lossless, so the shared
      // oracle states the equivalence as a hashed contract
      "q_harmonic_ball" -> base("q_harmonic"),
      "q_window_rank_native" -> base("q_window_rank"),
      // the chunk-backed PromQL evaluations must reproduce their
      // row-store siblings exactly (XOR codec is lossless and the
      // within-chunk sample order preserves the event_id tiebreaks)
      "q_promql_chunks_sum" -> base("q_promql_sum"),
      "q_promql_chunks_irate" -> base("q_promql_irate"),
      "q_promql_chunks_stepped" -> base("q_promql_stepped"),
      // the query-frontend results cache must serve the SAME grid the
      // direct evaluation produces — head steps read back from the
      // result store, tail steps evaluated fresh, one hash
      "q_promql_cached" -> base("q_promql_stepped"),
      // the SQL table-function alert surface compiles to the same
      // plan as the API call — one hash
      "q_promql_alert_tvf" -> base("q_promql_alert_keep"),
      // alerting at rollup cost: the 1h-store-served rule must
      // reproduce the raw rule's alert set exactly
      "q_promql_alert_rollup" -> base("q_promql_alert_keep"),
      // the downsampled hourly re-aggregation must reproduce the
      // raw-events hourly sum bit-for-bit (300 s divides 3600 s and the
      // store's partial sums stay DECIMAL) — downsampling's correctness
      // contract, stated as a shared oracle
      "q_downsample_sum" -> base("q_range_sum_by"),
      // Prometheus 3.x renamed holt_winters to
      // double_exponential_smoothing (same fold, same params) — the
      // alias must hash-match the original's recursive-CTE oracle
      "q_promql_double_exp" -> base("q_promql_holt"),
      // rollup-rewrite serving (round-12, VERDICT r11 #3): with
      // spark.graft.rollup.rewrite on, the hourly sum is answered from
      // the downsample store yet must be BIT-EQUAL to the raw-events
      // aggregation — db/writer.go's compaction-serving posture,
      // stated as a shared oracle hash
      "q_rollup_rewrite" -> base("q_range_sum_by"),
      // the widened measure family (count/min/max/sum) served from the
      // rollup must hash-match the raw-events formulation
      "q_rollup_rewrite_stats" -> base("q_range_stats_by"),
      // label-filter replay + grain drop through the rewrite: the
      // filtered hourly sum served from the store equals raw semantics
      "q_rollup_rewrite_filtered" -> base("q_range_sum"),
      // the PromQL front-end served from the rollup: same query text,
      // same oracle hash as the raw-scanning q_promql_sum
      "q_promql_rollup_sum" -> base("q_promql_sum"),
      // the SQL table-function surface compiles to the same plan
      "q_promql_sql_tvf" -> base("q_promql_sum"),
      // the range-query TVF evaluates the same stepped grid
      "q_promql_range_tvf" -> base("q_promql_stepped"),
      // stepped rate served from the rollup's counter partials must
      // reproduce the raw stepped evaluation bit-for-bit
      "q_promql_rollup_rate" -> base("q_promql_stepped_rate"),
      // the same counter contract at the 1h CHAIN level (round 15):
      // inc_dec merged up the chain + hour-boundary endpoint growths
      "q_promql_rollup_rate_1h" -> base("q_promql_stepped_rate_2h"),
      // the RULE path's hour pick: the hourly tumbling rewrite served
      // from downsample_3600s equals the raw-events aggregation
      "q_rollup_rewrite_1h" -> base("q_range_sum_by"),
      // hybrid fresh-tail: rollup-closed steps + raw open tail must
      // together reproduce the full raw stepped evaluation
      "q_promql_stepped_fresh" -> base("q_promql_stepped_long"),
      // the LIVE chain (round 16; VERDICT r15 #2): a day-stepped
      // month-wide query over the STREAM store serves closed days
      // from the folded 1d level, closed hours from the folded 1h
      // level, the open tail raw — one grid, hash-shared with the
      // raw twin
      "q_promql_stepped_fresh_1d" -> base("q_promql_stepped_vwide"),
      // COMPACTION + RETENTION (round 17; VERDICT r16 #1): the same
      // month-wide hour-stepped query over a store whose raw level was
      // compacted AND retention-dropped behind the 1h fold horizon —
      // dropped buckets serve from the fold bands, the open tail raw,
      // hash-shared with the raw twin
      "q_promql_stepped_retained" -> base("q_promql_stepped_long"),
      // OUT-OF-ORDER BACKFILL (round 17; VERDICT r16 #2): the repaired
      // store serves the same month grid bit-equal to the raw twin —
      // late buckets recomputed from source, fold increments refolded
      "q_promql_stepped_backfill" -> base("q_promql_stepped_long"),
      // the 1d chain level's serving twins (round 15): lossless verb
      // and the counter chain through TWO folds
      "q_promql_rollup_stepped_1d" -> base("q_promql_stepped_vwide"),
      "q_promql_rollup_rate_1d" -> base("q_promql_stepped_rate_1w"),
      // the snapshot TVFs are the same manifest reads as the API
      // entries — shared hashes prove the SQL surface serves the
      // identical versioned row sets
      "q_snapshot_at_tvf" -> base("q_time_travel"),
      "q_snapshot_changes_tvf" -> base("q_snapshot_delta"),
      // the endpoint family: last_over_time served as the extreme
      // non-empty bucket's stored last_value
      "q_promql_rollup_last" -> base("q_promql_last_ot"),
      // STEPPED serving (round 13): the same range query evaluated at
      // aligned steps, answered from the rollup — per-step lookback
      // windows are bucket unions, hash shared with the raw evaluation
      "q_promql_rollup_stepped" -> base("q_promql_stepped"),
      // MULTI-RESOLUTION serving (round 14): the hour-aligned day-window
      // query served from the 1h chain level must still reproduce the
      // raw stepped evaluation bit-for-bit
      "q_promql_rollup_stepped_1h" -> base("q_promql_stepped_wide"),
      // native-histogram HEADER verbs from the rollup (round 14): the
      // store's n_samples / sum_dec fields answer histogram_count/sum
      // losslessly — hash-shared with the raw twins
      "q_promql_rollup_hist_count" -> base("q_promql_hist_count"),
      "q_promql_rollup_hist_sum" -> base("q_promql_hist_sum"),
      // user-grain grouping + label filter; the oracle aggregates RAW
      // events, so the hash proves the store-served answer losslessly
      "q_rollup_rewrite_user" ->
        """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS step, user_id,
          |       COUNT(*) AS n, MIN(value) AS min_value,
          |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
          |FROM events WHERE event_type = 'click' GROUP BY 1, 2""".stripMargin)
  }
}
