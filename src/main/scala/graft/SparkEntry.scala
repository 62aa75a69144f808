package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, Scan, TimeSeries}
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.SortedWriter

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TimeSeries.rangeSumBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. scan / projection / pushdown
    "q_scan_eq"      -> (Scan.scanEq _),
    "q_scan_range"   -> (Scan.scanRange _),
    "q_projection"   -> (Scan.projection _),
    "q_scan_in"      -> (Scan.scanIn _),
    "q_scan_regex"   -> (Scan.scanRegex _),
    "q_scan_neg"     -> (Scan.scanNeg _),
    // semi-structured JSON extraction in the scan projection
    "q_props_json"   -> (Scan.propsJson _),
    "q_props_shred"  -> (Scan.propsShred _),
    "q_props_write_shred" -> (Scan.propsWriteShred _),
    // B. distinct / series identity
    "q_distinct_one"    -> (Scan.distinctOne _),
    "q_distinct_series" -> (Scan.distinctSeries _),
    "q_series_select"   -> (Scan.seriesSelect _),
    "q_label_names"     -> (Scan.labelNames _),
    // TSDB head status: per-metric series/sample counts + time range
    "q_tsdb_stats"      -> (Scan.tsdbStats _),
    "q_label_values"    -> ((s, d) => Scan.labelValues(
      s, d, "user_id", Seq(("event_type", "=", "click")))),
    // anchored =~ through the dictionary path (string + numeric) plus !=:
    // "1[0-9]" must match exactly the two-digit user_ids, never 112
    "q_label_values_regex" -> ((s, d) => Scan.labelValues(
      s, d, "user_id", Seq(("event_type", "=~", "cl.*|vi.*"),
        ("user_id", "=~", "1[0-9]"), ("user_id", "!=", "15")))),
    // C. time-series range aggregation
    "q_range_sum"       -> (TimeSeries.rangeSum _),
    "q_range_sum_by"    -> (TimeSeries.rangeSumBy _),
    "q_rate"            -> (TimeSeries.rate _),
    "q_count_over_time" -> (TimeSeries.countOverTime _),
    "q_avg_min_max_over_time" -> (TimeSeries.avgMinMaxOverTime _),
    "q_topk"            -> (TimeSeries.topk _),
    "q_topk_native"     -> (TimeSeries.topkNative _),
    "q_last_over_time"  -> (TimeSeries.lastOverTime _),
    "q_histogram_quantile" -> (TimeSeries.histogramQuantile _),
    "q_increase"        -> (TimeSeries.increase _),
    // scrape-interval inference: per-metric inter-sample gap statistics
    "q_scrape_interval" -> (TimeSeries.scrapeInterval _),
    "q_absent"          -> (TimeSeries.absent _),
    "q_stddev_over_time" -> (TimeSeries.stddevOverTime _),
    "q_delta"           -> (TimeSeries.delta _),
    "q_deriv"           -> (TimeSeries.deriv _),
    "q_changes"         -> (TimeSeries.changes _),
    "q_resets"          -> (TimeSeries.resets _),
    "q_vector_ratio"    -> (TimeSeries.vectorRatio _),
    "q_count_values"    -> (TimeSeries.countValues _),
    "q_quantile_over_time" -> (TimeSeries.quantileOverTime _),
    "q_mad_over_time"   -> (TimeSeries.madOverTime _),
    // native histograms (schema 0): buckets, header fields, quantile
    "q_nhist_build"     -> (TimeSeries.nhistBuild _),
    "q_nhist_stats"     -> (TimeSeries.nhistStats _),
    "q_nhist_quantile"  -> ((s, d) => TimeSeries.nhistQuantile(s, d)),
    "q_nhist_fraction"  -> ((s, d) => TimeSeries.nhistFraction(s, d)),
    "q_nhist_stddev"    -> (TimeSeries.nhistStddev _),
    // generalized schemas (round 15): −2 (coarser, exact 16^k bounds),
    // +2 (finer, fixed double bound table) + quantiles — incl. the
    // upstream-parity exponential-scale interpolation at schema 0
    "q_nhist_schema_neg"   -> ((s, d) => TimeSeries.nhistBuildSchema(s, d, -2)),
    "q_nhist_schema_pos"   -> ((s, d) => TimeSeries.nhistBuildSchema(s, d, 2)),
    "q_nhist_quantile_pos" -> ((s, d) => TimeSeries.nhistQuantileSchema(s, d, 2)),
    "q_nhist_quantile_exp" -> ((s, d) =>
      TimeSeries.nhistQuantileSchema(s, d, 0, 0.9, exponential = true)),
    // WIDE schema 8 (round 16) — upstream's full −4..8 range closed:
    // frexp-style sub-bound table + guess-then-fix index (no
    // when-chain; codegen- and oracle-SQL-bounded at any schema)
    "q_nhist_schema_pos8"   -> ((s, d) => TimeSeries.nhistBuildSchema(s, d, 8)),
    "q_nhist_quantile_pos8" -> ((s, d) => TimeSeries.nhistQuantileSchema(s, d, 8)),
    // PromQL front-end: parsed query strings compiled to the same plans
    "q_promql_sum" -> ((s, d) => graft.operators.Promql.query(
      s, d, """sum(count_over_time(click[1h]))""")),
    // the SAME PromQL text with the MV rewrite opted in: the inner
    // window aggregate is served from the downsample store (the
    // generalized aligned-step matcher covers the front-end's
    // floor-div spelling at any 300s-multiple width) and the hash must
    // match q_promql_sum's oracle — Prometheus-over-rollup, the Thanos
    // downsampled-serving posture, proven in the driver record
    // PromQL through the SQL TABLE FUNCTION surface (round 12): same
    // compiled plan, same oracle hash as q_promql_sum — SQL text users
    // get the whole verb surface via `FROM promql('...', dir)`
    "q_promql_sql_tvf" -> ((s, d) =>
      s.sql(s"SELECT * FROM promql('sum(count_over_time(click[1h]))', '$d')")),
    // the query_range API surface from SQL (round 13): aligned steps +
    // per-step lookback — same evaluation as q_promql_stepped, same hash
    "q_promql_range_tvf" -> ((s, d) => s.sql(
      s"SELECT * FROM promql_range('sum(click)', '$d', 1704067200, 1704153600, 3600, 7200)")),
    "q_promql_rollup_sum" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.query(s2, d, """sum(count_over_time(click[1h]))""")
    }),
    // the ENDPOINT verb family from the rollup: last_over_time's
    // arg-max-by-sample-key is served as the extreme non-empty bucket's
    // stored last_value (the store's per-bucket endpoint uses the same
    // (µs, event_id) total order) — shares the raw entry's oracle hash
    "q_promql_rollup_last" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.query(s2, d, "last_over_time(purchase[1d])")
    }),
    // STEPPED range queries from the rollup (round 13): the Grafana
    // path — per-step lookback windows are unions of 300s buckets, so
    // queryAt plans onto downsample_300s (plans/SteppedRollup.scala);
    // shares q_promql_stepped's oracle hash
    "q_promql_rollup_stepped" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.queryAt(s2, d, "sum(click)",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))
    }),
    // stepped rate: the raw evaluation, and the same query served from
    // the rollup's counter partials (inc_dec + boundary endpoints) —
    // Thanos's counter aggregate, hash-shared
    "q_promql_stepped_rate" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "rate(click[1h])",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))),
    "q_promql_rollup_rate" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.queryAt(s2, d, "rate(click[1h])",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))
    }),
    // MULTI-RESOLUTION serving (round 14; VERDICT r13 #1, the Thanos
    // 5m→1h chain): a day-window stepped query on an hour-aligned grid
    // is served from the 1h level — 12x fewer rollup rows than 300s —
    // and must still hash-match the raw stepped evaluation. The raw
    // twin carries the oracle.
    "q_promql_stepped_wide" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "sum_over_time(click[1d])",
      graft.operators.Promql.EvalSpec(1704067200L, 1704412800L, 7200L, 7200L))),
    "q_promql_rollup_stepped_1h" -> ((s, d) => {
      graft.sources.DownsampleStore.table1h(s, d) // build the chain
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.queryAt(s2, d, "sum_over_time(click[1d])",
        graft.operators.Promql.EvalSpec(1704067200L, 1704412800L, 7200L, 7200L))
    }),
    // the THIRD chain level (round 15): week-window day-grid queries
    // served from the 1 d store — 288x fewer rows than 300 s — still
    // hash-equal to the raw stepped evaluation; raw twins carry the
    // oracles, and the counter twin proves inc_dec survives TWO folds
    "q_promql_stepped_vwide" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "sum_over_time(click[1w])",
      graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 86400L, 7200L))),
    "q_promql_rollup_stepped_1d" -> ((s, d) => {
      graft.sources.DownsampleStore.table1d(s, d) // build the chain
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.queryAt(s2, d, "sum_over_time(click[1w])",
        graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 86400L, 7200L))
    }),
    "q_promql_stepped_rate_1w" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "rate(click[1w])",
      graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 86400L, 7200L))),
    "q_promql_rollup_rate_1d" -> ((s, d) => {
      graft.sources.DownsampleStore.table1d(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.queryAt(s2, d, "rate(click[1w])",
        graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 86400L, 7200L))
    }),
    // HYBRID fresh-tail stepped serving (round 15; VERDICT r14 #3 —
    // the Thanos/M3 read path for a query ending at now): a month-long
    // stepped query over a stream-maintained store serves closed steps
    // from the rollup and re-evaluates the open tail (past the
    // `_watermark` horizon) RAW over only the tail's time range, one
    // grid — hash-shared with the raw twin, which carries the oracle
    "q_promql_stepped_long" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "sum_over_time(click[2h])",
      graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 3600L, 7200L))),
    "q_promql_stepped_fresh" -> ((s, d) => {
      val store = graft.streaming.RollupMaintainStream.demoStore(s, d)
      val s2 = s.newSession()
      s2.conf.set(graft.plans.RollupRewrite.Flag, "true")
      s2.conf.set(graft.plans.RollupRewrite.StreamStoreConf, store)
      s2.conf.set(graft.plans.RollupRewrite.FreshTailConf, "true")
      graft.operators.Promql.queryAt(s2, d, "sum_over_time(click[2h])",
        graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 3600L, 7200L))
    }),
    // the LIVE chain (round 16; VERDICT r15 #2): the stream store's
    // fold levels serve a day-stepped month-wide query — closed days
    // from fold_86400s, closed hours from fold_3600s, the open tail
    // raw; bit-equal to the raw twin (shared oracle hash)
    "q_promql_stepped_fresh_1d" -> ((s, d) => {
      val store = graft.streaming.RollupMaintainStream.demoStore(s, d)
      val s2 = s.newSession()
      s2.conf.set(graft.plans.RollupRewrite.Flag, "true")
      s2.conf.set(graft.plans.RollupRewrite.StreamStoreConf, store)
      s2.conf.set(graft.plans.RollupRewrite.FreshTailConf, "true")
      graft.operators.Promql.queryAt(s2, d, "sum_over_time(click[1w])",
        graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 86400L, 7200L))
    }),
    // COMPACTION + RETENTION on the live chain (round 17; VERDICT r16
    // #1 — the reference's Compact() role, db/writer.go:169-236): the
    // store's raw batch dirs consolidate into one write-once compacted
    // dir, the fold levels merge log-structured, and raw buckets more
    // than 4 days behind the 1h fold horizon are DROPPED — the
    // hour-stepped month query serves them from the fold bands, so the
    // hash stays shared with the raw twin
    "q_promql_stepped_retained" -> ((s, d) => {
      val store = graft.streaming.RollupMaintainStream
        .demoStoreRetained(s, d, 4L * 86400L)
      val s2 = s.newSession()
      s2.conf.set(graft.plans.RollupRewrite.Flag, "true")
      s2.conf.set(graft.plans.RollupRewrite.StreamStoreConf, store)
      s2.conf.set(graft.plans.RollupRewrite.FreshTailConf, "true")
      graft.operators.Promql.queryAt(s2, d, "sum_over_time(click[2h])",
        graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 3600L, 7200L))
    }),
    // OUT-OF-ORDER BACKFILL (round 17; VERDICT r16 #2 — Prometheus's
    // OOO ingest): the store is stream-built WITHOUT a mid-month slice
    // (those buckets close incomplete), then the backfill job repairs
    // them from source — recomputed buckets swap in via the compaction
    // discipline and touched fold increments refold under bumped
    // generations. The month query over the repaired store is
    // hash-shared with the raw twin over the full corpus.
    "q_promql_stepped_backfill" -> ((s, d) => {
      val store = graft.streaming.RollupBackfill.demoStore(s, d)
      val s2 = s.newSession()
      s2.conf.set(graft.plans.RollupRewrite.Flag, "true")
      s2.conf.set(graft.plans.RollupRewrite.StreamStoreConf, store)
      s2.conf.set(graft.plans.RollupRewrite.FreshTailConf, "true")
      graft.operators.Promql.queryAt(s2, d, "sum_over_time(click[2h])",
        graft.operators.Promql.EvalSpec(1704067200L, 1706659200L, 3600L, 7200L))
    }),
    // counter partials carried UP THE CHAIN, driver-recorded (round 15;
    // VERDICT r14 #5): an hour-window rate served from the 1h level's
    // inc_dec + endpoints must reproduce the raw stepped evaluation —
    // the raw twin carries the oracle
    "q_promql_stepped_rate_2h" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "rate(click[2h])",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))),
    "q_promql_rollup_rate_1h" -> ((s, d) => {
      graft.sources.DownsampleStore.table1h(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.queryAt(s2, d, "rate(click[2h])",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))
    }),
    "q_promql_topk" -> ((s, d) => graft.operators.Promql.query(
      s, d, """topk(3, avg_over_time(purchase[1h]))""")),
    // Prometheus 3.x sampling aggregators, made deterministic (the
    // kept subset is a pure function of the series labels)
    "q_promql_limitk" -> ((s, d) => graft.operators.Promql.query(
      s, d, "limitk(10, avg_over_time(click[1h]))")),
    "q_promql_limit_ratio" -> ((s, d) => graft.operators.Promql.query(
      s, d, "limit_ratio(0.3, avg_over_time(click[1h]))")),
    "q_promql_ratio" -> ((s, d) => graft.operators.Promql.query(
      s, d, """sum_over_time(purchase[1h]) / on(user_id) sum_over_time(click[1h])""")),
    // ALERTING-RULE evaluation (round 15): the pending→firing `for:`
    // state machine over a stepped comparison expr — gaps-and-islands
    // per alert label set, no sequential fold; and the
    // `keep_firing_for:` hysteresis variant (firing bridges short
    // condition gaps, extension rows emitted at missed evals)
    // RULE GROUPS — N rules, ONE scan (round 17; VERDICT r16 #3,
    // Prometheus rules/group.go's per-interval group eval): two
    // alerting rules + one recording rule compile into one shared
    // events pass (single pruned scan, multi-measure aggregate,
    // per-rule re-aggregation + state machines); each rule's rows are
    // hash-equal to its standalone evaluation (the oracle re-derives
    // all three independently)
    "q_promql_rule_group" -> ((s, d) => graft.operators.RuleGroup
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("hot_metric", "count_over_time",
            Seq("click", "view", "purchase", "signup", "error"), 7200L,
            Seq("event_type"), Some((">", 6.0)), forSec = 7200L),
          graft.operators.RuleGroup.Rule("hot_metric_keep", "count_over_time",
            Seq("click", "view", "purchase", "signup", "error"), 7200L,
            Seq("event_type"), Some((">", 6.0)), forSec = 7200L,
            keepSec = 3600L),
          graft.operators.RuleGroup.Rule("grp_click_cnt1h",
            "count_over_time", Seq("click"), 3600L, Seq("user_id"))))),
    // COUNTER rules in groups (round 17): the Prometheus-standard rate
    // alert + an increase recording rule, still one scan — counter
    // partials ride ONE shared lag pass over the widest-window explode
    // (a predecessor outside a rule's narrower window is exactly the
    // rule's stored-value baseline)
    "q_promql_rule_group_rate" -> ((s, d) => graft.operators.RuleGroup
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("grp_rate_alert", "rate",
            Seq("click", "view"), 7200L, Seq("event_type"),
            Some((">", 0.002)), forSec = 7200L),
          graft.operators.RuleGroup.Rule("grp_click_inc", "increase",
            Seq("click"), 7200L, Seq("user_id"))))),
    // OUTER-AGG rule group (round 17): the by() vector aggregation
    // generalized past sum — a max-by alert (for:=0 ⇒ every held row
    // fires) plus min-by and avg-by recording rules, still one scan;
    // the avg leg averages integral counts so the decimal exactSum
    // path is bit-stable across engines
    "q_promql_rule_group_stats" -> ((s, d) => graft.operators.RuleGroup
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("grp_max_alert", "max_over_time",
            Seq("click", "view", "purchase"), 7200L, Seq("event_type"),
            Some((">", 150.0)), outerAgg = "max"),
          graft.operators.RuleGroup.Rule("grp_min_val", "min_over_time",
            Seq("click", "view"), 3600L, Seq("user_id"), outerAgg = "min"),
          graft.operators.RuleGroup.Rule("grp_avg_cnt", "count_over_time",
            Seq("click", "view"), 3600L, Seq("user_id"),
            outerAgg = "avg")))),
    // DISTRIBUTION verbs in rule groups (round 17): stddev/stdvar ride
    // the shared pass as exact decimal sum/sumsq/count measures, the
    // discrete quantile as the window's sorted value list (bounded by
    // samples per bucket — the batch evaluator's own value-histogram
    // state bound); the stddev alert outer-aggregates with max (pure
    // comparison — no re-quantization of sqrt outputs)
    "q_promql_rule_group_dist" -> ((s, d) => graft.operators.RuleGroup
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("grp_dev_alert", "stddev_over_time",
            Seq("click", "view", "purchase"), 7200L, Seq("event_type"),
            Some((">", 10.0)), outerAgg = "max"),
          graft.operators.RuleGroup.Rule("grp_var", "stdvar_over_time",
            Seq("purchase"), 7200L, Seq("user_id", "event_type")),
          graft.operators.RuleGroup.Rule("grp_p90", "quantile_over_time",
            Seq("click"), 3600L, Seq("user_id", "event_type"),
            q = 0.9)))),
    // CARDINALITY + DISPERSION outer aggs (round 17): count by() —
    // "how many series are active" — and stddev by() over per-series
    // window counts, completing PromQL's vector-agg family in rule
    // groups (sum/min/max/avg/count/group/stddev/stdvar)
    "q_promql_rule_group_cnt" -> ((s, d) => graft.operators.RuleGroup
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("grp_cnt_series",
            "count_over_time", Seq("click", "view"), 3600L,
            Seq("event_type"), outerAgg = "count"),
          graft.operators.RuleGroup.Rule("grp_dev_series",
            "count_over_time", Seq("click", "view"), 7200L,
            Seq("event_type"), outerAgg = "stddev")))),
    // PAYLOAD-LABEL rule groups (round 17): a rule grouped by the
    // props label `k` refines its series grain, so the compiler gives
    // it its own grain pass (two scans for this mixed group, not N);
    // the k alert fires per payload-label series — Prometheus's
    // labels-are-a-bag model reaching the ruler
    "q_promql_rule_group_k" -> ((s, d) => graft.operators.RuleGroup
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("grp_k_alert", "count_over_time",
            Seq("click", "view"), 7200L, Seq("k"), Some((">", 1.0))),
          graft.operators.RuleGroup.Rule("grp_usr_cnt", "count_over_time",
            Seq("click"), 3600L, Seq("user_id"))))),
    // ROLLUP-SERVED rule group (round 17): the group compiler reading
    // the downsample STORE instead of the raw events scan — with the
    // rewrite opted in, the whole servable pass (count alert with
    // for:/keep:, rate alert, sum + avg recordings) evaluates from
    // rollup partials (plan-asserted in RuleGroupRollupSpec: zero raw
    // scans). The oracle re-derives everything from raw events, so
    // the hash proves store serving bit-exact through both alert
    // machines — a 30-rule group over a year reads rollup bytes
    "q_promql_rule_group_rollup" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.RuleGroup.evaluateUnion(s2, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("ru_hot", "count_over_time",
            Seq("click", "view", "purchase", "signup", "error"), 7200L,
            Seq("event_type"), Some((">", 6.0)), forSec = 7200L,
            keepSec = 3600L),
          graft.operators.RuleGroup.Rule("ru_rate_alert", "rate",
            Seq("click", "view"), 7200L, Seq("event_type"),
            Some((">", 0.002)), forSec = 7200L),
          graft.operators.RuleGroup.Rule("ru_click_sum1h", "sum_over_time",
            Seq("click"), 3600L, Seq("user_id")),
          graft.operators.RuleGroup.Rule("ru_view_avg2h", "avg_over_time",
            Seq("view"), 7200L, Seq("user_id", "event_type"))))
    }),
    // LIVE rule group (round 17): the SAME group shape served from the
    // STREAM-MAINTAINED store — the completeness-gated live ruler
    // (Prometheus evaluates a completeness lag behind now; here the
    // lag is the store's watermark horizon, and the whole grid must be
    // closed because an alert's for:/keep: machine walks every step).
    // The hour-aligned grid reads the folded 1h level (banded serving
    // — spec-asserted); the oracle is the same raw-events
    // re-derivation as the batch-store twin, so the hash proves the
    // live chain's partials reproduce the raw evaluation bit-for-bit
    "q_promql_rule_group_live" -> ((s, d) => {
      val store = graft.streaming.RollupMaintainStream.demoStore(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      s2.conf.set(graft.plans.RollupRewrite.StreamStoreConf, store)
      graft.operators.RuleGroup.evaluateUnion(s2, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        Seq(
          graft.operators.RuleGroup.Rule("rl_hot", "count_over_time",
            Seq("click", "view", "purchase", "signup", "error"), 7200L,
            Seq("event_type"), Some((">", 6.0)), forSec = 7200L,
            keepSec = 3600L),
          graft.operators.RuleGroup.Rule("rl_rate_alert", "rate",
            Seq("click", "view"), 7200L, Seq("event_type"),
            Some((">", 0.002)), forSec = 7200L),
          graft.operators.RuleGroup.Rule("rl_click_sum1h", "sum_over_time",
            Seq("click"), 3600L, Seq("user_id")),
          graft.operators.RuleGroup.Rule("rl_view_avg2h", "avg_over_time",
            Seq("view"), 7200L, Seq("user_id", "event_type"))))
    }),
    // PROMETHEUS RULES-FILE front-end (round 17): the upstream ruler's
    // config surface — a rulefmt YAML parses, group-compilable exprs
    // evaluate as ONE shared pass through the group compiler, and an
    // irreducible expr (binary arithmetic) falls back to the generic
    // alert evaluator. The oracle re-derives all five legs from raw
    // events (the four group legs are the store-group oracle verbatim)
    "q_promql_rules_file" -> ((s, d) => graft.operators.RulesFile
      .evaluateUnion(s, d,
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        """groups:
          |  - name: service_rules
          |    interval: 1h
          |    rules:
          |      - alert: rf_hot
          |        expr: sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6
          |        for: 2h
          |        keep_firing_for: 1h
          |        labels:
          |          severity: page
          |      - alert: rf_rate
          |        expr: sum by (event_type) (rate({event_type=~"click|view"}[2h])) > 0.002
          |        for: 2h
          |      - record: rf_click_sum1h
          |        expr: sum by (user_id) (sum_over_time(click[1h]))
          |      - record: rf_view_avg2h
          |        expr: avg_over_time(view[2h])
          |      - alert: rf_ratio
          |        expr: sum by (event_type) (count_over_time({event_type=~"click|view"}[2h])) / 2 > 3
          |""".stripMargin)),
    "q_promql_alert" -> ((s, d) => graft.operators.Alerts.rule(
      s, d,
      """sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6""",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
      forSec = 7200L)),
    "q_promql_alert_keep" -> ((s, d) => graft.operators.Alerts.rule(
      s, d,
      """sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6""",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
      forSec = 7200L, keepSec = 3600L)),
    // the Thanos-ruler posture: the SAME alert rule evaluated AT
    // ROLLUP COST — with the rewrite opted in, the resolution picker
    // serves the 2h-count windows on the hourly grid entirely from
    // the 1h downsample store (plan-asserted in AlertsSpec: zero raw
    // scans) — and the state machine's output must still hash-match
    // the raw evaluation's oracle
    "q_promql_alert_rollup" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Alerts.rule(s2, d,
        """sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6""",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        forSec = 7200L, keepSec = 3600L)
    }),
    // ALERTS AS SERIES (round 16): a per-user activity alert's state
    // machine persisted as the synthetic ALERTS{alertname, alertstate}
    // = 1 series, then JOINED against the raw metric through the union
    // namespace — alert history aggregated like any metric. The oracle
    // re-derives the whole composition (state machine + hourly counts)
    // from raw events.
    "q_promql_alerts_series" -> ((s, d) => {
      graft.operators.Alerts.recordSeries(s, d, "active_user",
        """sum by (user_id) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 0""",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        forSec = 3600L, keepSec = 3600L)
      graft.operators.Promql.queryAt(s, d,
        """sum by (user_id)(ALERTS{alertname="active_user", alertstate="firing"}) * on(user_id) sum by (user_id)(count_over_time({event_type=~"click|view|purchase|signup|error"}[1h]))""",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 3600L),
        graft.sources.RecordedRules.UnionSource(Seq("ALERTS__active_user")))
    }),
    // ALERTS_FOR_STATE (round 16): the second synthetic series —
    // ActiveAt per active (step, series), the series Prometheus reads
    // back to restore for: clocks; queried through the union namespace
    "q_promql_alerts_for_state" -> ((s, d) => {
      graft.operators.Alerts.recordForState(s, d, "active_user",
        """sum by (user_id) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 0""",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
        forSec = 3600L, keepSec = 3600L)
      graft.operators.Promql.queryAt(s, d,
        """max by (user_id)(ALERTS_FOR_STATE{alertname="active_user"})""",
        graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 3600L),
        graft.sources.RecordedRules.UnionSource(
          Seq("ALERTS_FOR_STATE__active_user")))
    }),
    // the same rule through the SQL table function — shares
    // q_promql_alert_keep's oracle hash
    "q_promql_alert_tvf" -> ((s, d) => s.sql(
      "SELECT * FROM promql_alerts('sum by (event_type) (count_over_time({event_type=~\"click|view|purchase|signup|error\"}[2h])) > 6', " +
        s"'$d', 1704067200, 1704153600, 3600, 7200, 7200, 3600)")),
    // RECORDING RULES (round 15): a PromQL expr persisted as a new
    // named series, then queried back THROUGH THE EVALUATOR via the
    // SampleSource seam — the oracle re-derives the composition from
    // raw events, so the hash proves record + readback + re-aggregate
    "q_promql_recorded" -> ((s, d) => {
      graft.sources.RecordedRules.record(s, d, "rec_purchase_sum1h",
        "sum by (user_id)(sum_over_time(purchase[1h]))")
      graft.operators.Promql.query(s, d, "sum(rec_purchase_sum1h)",
        graft.sources.RecordedRules.RecordedSource("rec_purchase_sum1h"))
    }),
    // ONE NAMESPACE: raw + recorded series through the union source —
    // a single expression divides a precomputed rule by a raw metric
    "q_promql_recorded_mix" -> ((s, d) => {
      graft.sources.RecordedRules.record(s, d, "rec_purchase_sum1h",
        "sum by (user_id)(sum_over_time(purchase[1h]))")
      graft.operators.Promql.query(s, d,
        "sum(rec_purchase_sum1h) / sum(count_over_time(click[1h]))",
        graft.sources.RecordedRules.UnionSource(Seq("rec_purchase_sum1h")))
    }),
    // MULTI-LABEL recording rule (round 16; VERDICT r15 #3): a rule
    // grouped by (event_type, user_id) — the source metric label rides
    // the recorded store's props payload under the documented key
    // `src`, and the query reconstitutes series identity by grouping
    // on it THROUGH THE UNION NAMESPACE; the oracle re-derives the
    // whole composition from raw events
    "q_promql_recorded_multi" -> ((s, d) => {
      graft.sources.RecordedRules.record(s, d, "rec_typed_cnt1h",
        """sum by (event_type, user_id)(count_over_time({event_type=~"click|purchase"}[1h]))""")
      graft.operators.Promql.query(s, d, "sum by (src)(rec_typed_cnt1h)",
        graft.sources.RecordedRules.UnionSource(Seq("rec_typed_cnt1h")))
    }),
    // query-frontend RESULTS CACHE (round 15): prime the head half of
    // the grid, then serve the full range — head from the result
    // store, tail evaluated fresh (scan bounded to the tail), one
    // union sharing q_promql_stepped's oracle hash
    "q_promql_cached" -> ((s, d) => {
      val half = graft.operators.Promql.EvalSpec(1704067200L, 1704110400L, 3600L, 7200L)
      val full = graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L)
      graft.plans.ResultCache.queryCached(s, d, "sum(click)", half).count()
      graft.plans.ResultCache.queryCached(s, d, "sum(click)", full)
    }),
    // true range-query evaluation: aligned steps + per-step lookback
    "q_promql_stepped" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "sum(click)",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))),
    // PromQL over the XOR CHUNK STORE — the reference's actual read
    // path (parquet chunk rows -> decode -> evaluate; schema/chunk.go,
    // prometheus/querier.go). Each shares its row-store sibling's
    // oracle: the chunk encode/decode/evaluate pipeline must reproduce
    // the row-store hashes bit-for-bit (irate additionally pins the
    // within-chunk tiebreak ORDER, not just the value set)
    "q_promql_chunks_sum" -> ((s, d) => graft.operators.Promql.query(
      s, d, """sum(count_over_time(click[1h]))""", graft.operators.ChunkSource)),
    "q_promql_chunks_irate" -> ((s, d) => graft.operators.Promql.query(
      s, d, "irate(click[1w])", graft.operators.ChunkSource)),
    "q_promql_chunks_stepped" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "sum(click)",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
      graft.operators.ChunkSource)),
    // parser-reachable verbs (round 4): each compiles to the same plan
    // shape as its §2.C operator sibling
    "q_promql_changes" -> ((s, d) => graft.operators.Promql.query(
      s, d, "changes(click[1d])")),
    "q_promql_resets" -> ((s, d) => graft.operators.Promql.query(
      s, d, "resets(purchase[1d])")),
    "q_promql_quantile_ot" -> ((s, d) => graft.operators.Promql.query(
      s, d, "quantile_over_time(0.5, click[1d])")),
    "q_promql_last_ot" -> ((s, d) => graft.operators.Promql.query(
      s, d, "last_over_time(purchase[1d])")),
    "q_promql_first_ot" -> ((s, d) => graft.operators.Promql.query(
      s, d, "first_over_time(purchase[6h])")),
    "q_promql_ts_of_last" -> ((s, d) => graft.operators.Promql.query(
      s, d, "ts_of_last_over_time(view[1d])")),
    "q_promql_ts_of_max" -> ((s, d) => graft.operators.Promql.query(
      s, d, "ts_of_max_over_time(purchase[6h])")),
    "q_promql_ts_of_min" -> ((s, d) => graft.operators.Promql.query(
      s, d, "ts_of_min_over_time(click[1d])")),
    "q_promql_hist_count" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_count(view[1d])")),
    "q_promql_hist_sum" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_sum(view[1d])")),
    "q_promql_hist_avg" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_avg(purchase[1d])")),
    // the native-histogram HEADER verbs served from the rollup (round
    // 14; VERDICT r13 #6): histogram_count/sum are plain fused aggs of
    // fields the store already carries (n_samples, sum_dec) — same
    // opt-in, same gates, hash-shared with the raw twins
    "q_promql_rollup_hist_count" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.query(s2, d, "histogram_count(view[1d])")
    }),
    "q_promql_rollup_hist_sum" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.Promql.query(s2, d, "histogram_sum(view[1d])")
    }),
    "q_promql_hist_stddev" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_stddev(click[1d])")),
    "q_promql_hist_fraction" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_fraction(0.3, 3.0, click[1d])")),
    "q_promql_hist_quantile" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_quantile(0.9, click[1d])")),
    "q_promql_mad_ot" -> ((s, d) => graft.operators.Promql.query(
      s, d, "mad_over_time(click[1d])")),
    "q_promql_delta" -> ((s, d) => graft.operators.Promql.query(
      s, d, "delta(purchase[6h])")),
    "q_promql_stddev_ot" -> ((s, d) => graft.operators.Promql.query(
      s, d, "stddev_over_time(click[1d])")),
    "q_promql_deriv" -> ((s, d) => graft.operators.Promql.query(
      s, d, "deriv(click[1h])")),
    "q_promql_histq" -> ((s, d) => graft.operators.Promql.query(
      s, d, "histogram_quantile(0.9, count_over_time(click[1h]))")),
    "q_promql_absent" -> ((s, d) => graft.operators.Promql.query(
      s, d, """absent(error{user_id="1"})""")),
    // comparison / set operators
    "q_promql_filter" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(click[1h]) > 500")),
    "q_promql_bool" -> ((s, d) => graft.operators.Promql.query(
      s, d, "avg_over_time(purchase[1h]) >= bool 50")),
    "q_promql_and" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(purchase[1h]) and on(user_id) sum_over_time(click[1h])")),
    "q_promql_unless" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(purchase[1h]) unless on(user_id) sum_over_time(click[1h])")),
    "q_promql_or" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(purchase[1h]) or on(user_id) sum_over_time(click[1h])")),
    // the remaining aggregator code paths: avg (exactSum/count), stddev
    // (exact Σv/Σv² across series), and the two-phase cross-series
    // quantile — each collapsing the series dimension per step
    "q_promql_avg_agg" -> ((s, d) => graft.operators.Promql.query(
      s, d, "avg(sum_over_time(purchase[1h]))")),
    "q_promql_stddev_agg" -> ((s, d) => graft.operators.Promql.query(
      s, d, "stddev(sum_over_time(purchase[1h]))")),
    "q_promql_quantile_agg" -> ((s, d) => graft.operators.Promql.query(
      s, d, "quantile(0.9, sum_over_time(click[1h]))")),
    "q_promql_count_agg" -> ((s, d) => graft.operators.Promql.query(
      s, d, "count(sum_over_time(click[1h]))")),
    "q_promql_stdvar_agg" -> ((s, d) => graft.operators.Promql.query(
      s, d, "stdvar(sum_over_time(purchase[1h]))")),
    "q_promql_bottomk" -> ((s, d) => graft.operators.Promql.query(
      s, d, "bottomk(3, sum_over_time(view[1h]))")),
    // Prometheus-parity edge extrapolation (opt-in; stored-value rate is
    // the default)
    "q_promql_rate_extrap" -> ((s, d) => graft.operators.Promql.query(
      s, d, "increase_extrapolated(purchase[1d])")),
    "q_promql_group_right" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum(sum_over_time(purchase[1h])) / ignoring(user_id) group_right sum_over_time(purchase[1h])")),
    "q_promql_at" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "sum(click @ 1704100000)",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))),
    "q_promql_subquery" -> ((s, d) => graft.operators.Promql.queryAt(
      s, d, "max_over_time(sum(click)[1h:30m])",
      graft.operators.Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L))),
    // metric-less selectors: event_type stays a series label
    "q_promql_multimetric" -> ((s, d) => graft.operators.Promql.query(
      s, d, """sum by (event_type)(count_over_time({event_type=~"click|view"}[1h]))""")),
    "q_promql_topk_by" -> ((s, d) => graft.operators.Promql.query(
      s, d, """topk by (event_type) (2, sum_over_time({event_type=~"click|purchase"}[1d]))""")),
    "q_promql_math" -> ((s, d) => graft.operators.Promql.query(
      s, d, "ceil(sqrt(sum_over_time(purchase[1h])))")),
    "q_promql_scalar" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(purchase[1h]) / scalar(sum(sum_over_time(purchase[1h])))")),
    "q_promql_time" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(click[1h]) / time()")),
    "q_promql_label_replace" -> ((s, d) => graft.operators.Promql.query(
      s, d, """label_replace(sum_over_time(click[1h]), "shard", "s$1", "user_id", "(\d)\d*")""")),
    // label_join composing with label_replace: produced labels are
    // first-class (the joined label concatenates a produced + a
    // physical label)
    "q_promql_label_join" -> ((s, d) => graft.operators.Promql.query(
      s, d, """label_join(label_replace(sum_over_time(click[1h]), "shard", "s$1", "user_id", "(\d)\d*"), "sid", "-", "shard", "user_id")""")),
    // sort/sort_desc: the presentation order is materialized as `rank`
    // (a DataFrame result has no row order for the oracle hash to see)
    "q_promql_sort" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sort(avg_over_time(purchase[1h]))")),
    "q_promql_sort_desc" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sort_desc(sum_over_time(click[1h]))")),
    // Prometheus 3.x: label-value sort is a STRING sort ("10" < "2")
    "q_promql_sort_by_label" -> ((s, d) => graft.operators.Promql.query(
      s, d, """sort_by_label(sum_over_time(click[1h]), "user_id")""")),
    "q_promql_irate" -> ((s, d) => graft.operators.Promql.query(
      s, d, "irate(click[1w])")),
    // instantaneous delta: raw last-pair difference (gauge semantics —
    // NO counter-reset clamp, value may be negative)
    "q_promql_idelta" -> ((s, d) => graft.operators.Promql.query(
      s, d, "idelta(purchase[1w])")),
    "q_promql_predict" -> ((s, d) => graft.operators.Promql.query(
      s, d, "predict_linear(click[1d], 3600)")),
    "q_promql_timestamp" -> ((s, d) => graft.operators.Promql.query(
      s, d, "timestamp(purchase)")),
    "q_promql_present" -> ((s, d) => graft.operators.Promql.query(
      s, d, "present_over_time(purchase[1d])")),
    "q_promql_absent_ot" -> ((s, d) => graft.operators.Promql.query(
      s, d, """absent_over_time(error{user_id="1"}[1d])""")),
    "q_promql_clamp" -> ((s, d) => graft.operators.Promql.query(
      s, d, "clamp(avg_over_time(purchase[1h]), 30, 60)")),
    "q_promql_hour" -> ((s, d) => graft.operators.Promql.query(
      s, d, "hour(timestamp(purchase))")),
    // the rest of the date-component verb family in one composite
    // (vector arithmetic keeps each leg visible in the packed value)
    "q_promql_date_fns" -> ((s, d) => graft.operators.Promql.query(
      s, d, "day_of_week(timestamp(purchase)) " +
        "+ 100 * days_in_month(timestamp(purchase)) " +
        "+ 10000 * month(timestamp(purchase)) " +
        "+ 1000000 * day_of_year(timestamp(purchase))")),
    "q_promql_group" -> ((s, d) => graft.operators.Promql.query(
      s, d, "group(count_over_time(click[1h]))")),
    "q_promql_count_values" -> ((s, d) => graft.operators.Promql.query(
      s, d, """count_values("cnt", count_over_time(click[1h]))""")),
    // oracle: the smoothing fold unrolled as a recursive CTE (round 9
    // upgraded this from rows-only — see OracleSql q_promql_holt)
    "q_promql_holt" -> ((s, d) => graft.operators.Promql.query(
      s, d, "holt_winters(purchase[1w], 0.5, 0.3)")),
    // Prometheus 3.x spelling of the same verb (round-12, VERDICT r11
    // #4): identical smoothing fold, so it shares holt's oracle SQL
    "q_promql_double_exp" -> ((s, d) => graft.operators.Promql.query(
      s, d, "double_exponential_smoothing(purchase[1w], 0.5, 0.3)")),
    // precedence ladder: * binds tighter than + (the flat parser would
    // have computed (click + purchase) * 2)
    "q_promql_precedence" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(click[1h]) + sum_over_time(purchase[1h]) * 2")),
    "q_promql_mod" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(click[1h]) % 7")),
    "q_promql_pow" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(click[1h]) ^ 2")),
    "q_promql_unary" -> ((s, d) => graft.operators.Promql.query(
      s, d, "-sum_over_time(click[1h])")),
    // JVM Math.atan2 and DuckDB's libm atan2 differ in the last ulp
    // (measured maxdiff 2.2e-16 at sf0.01) — the query surface quantizes
    // to 9 decimals on BOTH engines (same pattern as the decimal
    // determinism contract), which kills the divergence and restores the
    // hash oracle; PromqlSpec still pins the un-quantized semantics
    // against Spark's own atan2
    "q_promql_atan2" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum_over_time(click[1h]) atan2 1")
      .withColumn("value", org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value"), 9))),
    // same last-ulp story for trig (measured: sin 5/1989 values off by
    // 1 ulp at sf0.01) — 9-decimal quantization on both engines
    "q_promql_trig" -> ((s, d) => graft.operators.Promql.query(
      s, d, "deg(atan(sin(sum_over_time(click[1h])))) * pi()")
      .withColumn("value", org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value"), 9))),
    // group_left(l1,...) label carrying and negative offset
    "q_promql_carry" -> ((s, d) => graft.operators.Promql.query(
      s, d, """sum_over_time(click[1h]) * on(user_id) group_left(tier) label_replace(sum_over_time(purchase[1h]), "tier", "t$1", "user_id", "(\d)\d*")""")),
    "q_promql_neg_offset" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum(count_over_time(click[1h] offset -1h))")),
    // derived label k (props JSON): grouped by, and matched on, a label
    // that exists in the payload rather than as a physical column
    "q_promql_k_group" -> ((s, d) => graft.operators.Promql.query(
      s, d, "sum by (k) (sum_over_time(click[1d]))")),
    "q_promql_k_matcher" -> ((s, d) => graft.operators.Promql.query(
      s, d, """count_over_time(click{k=~"4.*"}[1d])""")),
    // D. relational core
    "q1_pricing"     -> (Relational.q1Pricing _),
    // TPC-H Q13/Q17 shapes: left-join distribution; decorrelated
    // correlated-scalar-subquery with the exact integer threshold
    "q13_custdist"   -> (Relational.custDist _),
    // schema-evolution read: two file generations, one mergeSchema
    // scan, NULLs exactly where the pre-widening files are
    "q_schema_evolution" -> ((s, d) => graft.sources.EvoStore.read(s, d)),
    // snapshot time travel: three manifest versions (insert / append /
    // metadata+COW delete) read as-of and unioned under a version tag
    "q_time_travel" -> ((s, d) => {
      import org.apache.spark.sql.functions.lit
      val snap = graft.sources.SnapshotStore
      Seq(1, 2, 3).map(v => snap.readAt(s, d, v)
        .withColumn("version", lit(v.toLong)))
        .reduce(_ unionByName _)
        .select("version", "event_id", "user_id", "event_type", "us",
          "value")
    }),
    // incremental read (CDF): manifest-diff changes between commits —
    // v1→v2 is pure inserts (the append), v2→v3 pure deletes (the
    // predicate); COW-carried rows appear in neither
    "q_snapshot_delta" -> ((s, d) => {
      val snap = graft.sources.SnapshotStore
      snap.changesBetween(s, d, 1, 2)
        .unionByName(snap.changesBetween(s, d, 2, 3))
        .select("change_type", "version", "event_id", "user_id",
          "event_type", "us", "value")
    }),
    // the same two snapshot surfaces through the SQL table functions
    // (GraftExtensions.injectTableFunction): pure SQL text, same rows —
    // each shares its API twin's oracle hash
    "q_snapshot_at_tvf" -> ((s, d) => s.sql(
      s"""SELECT CAST(1 AS BIGINT) AS version, * FROM snapshot_at('$d', 1)
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), * FROM snapshot_at('$d', 2)
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), * FROM snapshot_at('$d', 3)""".stripMargin)),
    "q_snapshot_changes_tvf" -> ((s, d) => s.sql(
      s"""SELECT change_type, version, event_id, user_id, event_type, us, value
         |FROM snapshot_changes('$d', 1, 2)
         |UNION ALL
         |SELECT change_type, version, event_id, user_id, event_type, us, value
         |FROM snapshot_changes('$d', 2, 3)""".stripMargin)),
    "q4_priority"    -> (Relational.q4Priority _),
    "q6_forecast"    -> (Relational.q6Forecast _),
    "q12_priority"   -> (Relational.q12Priority _),
    "q14_promo"      -> (Relational.q14Promo _),
    "q19_discount"   -> (Relational.q19Discount _),
    "q17_small_qty"  -> ((s, d) => Relational.smallQtyRevenue(s, d)),
    // TPC-H Q18/Q21 shapes: HAVING-subquery decorrelated to a
    // pre-join partial agg; double-EXISTS collapsed to one per-order
    // aggregate (returnflag stands in for the lateness test)
    "q18_big_orders" -> ((s, d) => Relational.largeVolumeCustomers(s, d)),
    "q21_waiting_supp" -> (Relational.waitingSuppliers _),
    "q22_idle_rich"  -> (Relational.idleRichCustomers _),
    "q3_shipping"    -> (Relational.q3Shipping _),
    "q5_local"       -> (Relational.q5Local _),
    "q_window_rank"  -> (Relational.windowRank _),
    "q_window_rank_native" -> (Relational.windowRankNative _),
    "q_orders_enrich" -> (Relational.ordersEnrich _),
    "q_semi_anti"    -> (Relational.semiAnti _),
    "q_pagerank"     -> ((s, d) => graft.operators.Graph.pagerank(s, d)),
    "q_triangle_count" -> ((s, d) => graft.operators.Graph.triangleCount(s, d)),
    "q_components"   -> ((s, d) => graft.operators.Graph.components(s, d)),
    "q_kcore"        -> ((s, d) => graft.operators.Graph.kcore(s, d)),
    "q_labelprop"    -> ((s, d) => graft.operators.Graph.labelProp(s, d)),
    "q_harmonic"     -> ((s, d) => graft.operators.Graph.harmonic(s, d)),
    "q_harmonic_ball" -> ((s, d) => graft.operators.Graph.harmonicBall(s, d)),
    "q_salted_join"  -> (Relational.saltedJoin _),
    "q_bucketed_join" -> (graft.sources.BucketedStore.bucketedJoin _),
    "q_asof_join"      -> (Relational.asofJoin _),
    "q_asof_tolerance" -> ((s, d) => Relational.asofTolerance(s, d)),
    "q_asof_tolerance_15m" -> ((s, d) => Relational.asofTolerance(s, d, toleranceSec = 900L)),
    "q_interval_join"  -> ((s, d) => Relational.intervalJoin(s, d)),
    "q_interval_join_15m" -> ((s, d) => Relational.intervalJoin(s, d, widthSec = 900L)),
    // ordered event-stream analytics (sessionization / funnel / cohort)
    "q_sessionize"     -> ((s, d) => graft.operators.Behavior.sessionize(s, d)),
    // the native session_window TVF form (strict-overlap merge rule)
    "q_sessionize_native" -> ((s, d) =>
      graft.operators.Behavior.sessionizeNative(s, d)),
    "q_sessionize_30m" -> ((s, d) => graft.operators.Behavior.sessionize(s, d, gapSec = 1800L)),
    "q_funnel"         -> (graft.operators.Behavior.funnel _),
    "q_retention"      -> (graft.operators.Behavior.retention _),
    // grouping sets + pivot
    "q_rollup" -> (Relational.rollupRevenue _),
    "q_cube"   -> (Relational.cubeEvents _),
    "q_grouping_sets" -> (Relational.groupingSetsEvents _),
    "q_pivot"  -> (Relational.pivotEventCounts _),
    // window frame + distribution-rank families
    "q_window_range_frame" -> (Relational.windowRangeFrame _),
    "q_ntile" -> (Relational.windowNtile _),
    // approximate sketches (declared rows-only; accuracy contracts
    // spec-proven against exact computations in SketchSpec)
    "q_approx_quantile" -> (graft.operators.Sketches.approxQuantiles _),
    "q_approx_distinct" -> (graft.operators.Sketches.approxDistinct _),
    // E. writer / compaction (rows-only: side-effecting, no SQL oracle)
    "q_sorted_write" -> (SortedWriter.sortedWriteQuery _),
    "q_compaction"   -> (SortedWriter.compactionQuery _),
    "q_chunk_meta"      -> (graft.sources.ChunkStore.chunkMeta _),
    "q_chunk_roundtrip" -> (graft.sources.ChunkStore.roundtrip _),
    "q_chunk_range"     -> ((s, d) => graft.sources.ChunkStore.rangeQuery(
      s, d, 1704153600000000L, 1704240000000000L)),
    // z-ordered layout: the 2-D predicate prunes files on BOTH
    // dimensions (ZOrderSpec asserts the footer-stats boxes); content
    // equality vs the source table is the oracle
    "q_zorder_scan"     -> ((s, d) => graft.sources.ZOrderStore.scan(
      s, d, 10L, 19L, 1704153600000000L, 1704240000000000L)),
    // downsampling store (5m rollup; the hourly re-aggregation shares
    // q_range_sum_by's oracle — rollup answers == raw answers)
    "q_downsample"     -> (graft.sources.DownsampleStore.downsample _),
    "q_downsample_sum" -> (graft.sources.DownsampleStore.downsampleSum _),
    // the 1h CHAIN level (round 14): re-aggregated FROM the 300s store
    // — sums/order-stats/endpoints/counter partials all carried up —
    // yet the oracle aggregates RAW events, so the hash proves every
    // partial re-merges exactly through the intermediate level
    "q_downsample_1h"  -> (graft.sources.DownsampleStore.downsample1h _),
    // daily sums served from the 1h level (the year-dashboard shape:
    // 24 rows/series/day instead of 288)
    "q_downsample_sum_1d" -> (graft.sources.DownsampleStore.downsampleSum1d _),
    // the 1 d chain level itself (round 15): the oracle aggregates RAW
    // events with within-day lag pairs, so the hash proves every
    // partial re-merges bit-exactly through TWO chain folds
    "q_downsample_1d"  -> (graft.sources.DownsampleStore.downsample1d _),
    // MV rewrite in the oracle gate (round-12, VERDICT r11 #3): the
    // RAW-events hourly sum with plans/RollupRewrite.scala opted in —
    // the optimizer must serve it from the downsample store (a cloned
    // session isolates the flag) and the bits must hash-match
    // q_range_sum_by's oracle, proving the rewrite is lossless end to
    // end, not just in ScalaTest
    "q_rollup_rewrite" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d) // materialize the MV
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.TimeSeries.rangeSumBy(s2, d)
    }),
    // the RULE path's multi-resolution pick, driver-recorded (round 15;
    // VERDICT r14 #5): with the 1h chain level present, the hourly
    // tumbling rewrite serves from downsample_3600s (12x fewer rows
    // than the 300s level) and must still hash-match the raw oracle
    "q_rollup_rewrite_1h" -> ((s, d) => {
      graft.sources.DownsampleStore.table1h(s, d) // build the chain
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.TimeSeries.rangeSumBy(s2, d)
    }),
    // the widened lossless-measure family (count/min/max/sum) through
    // the same rewrite; raw twin q_range_stats_by carries the oracle
    "q_range_stats_by" -> (graft.operators.TimeSeries.rangeStatsBy _),
    "q_rollup_rewrite_stats" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.TimeSeries.rangeStatsBy(s2, d)
    }),
    // label FILTERS replay on the store (whole-group selection) and the
    // grouping may drop store labels (finer grain re-aggregates): the
    // flagship filtered hourly sum served from the rollup, sharing
    // q_range_sum's oracle
    "q_rollup_rewrite_filtered" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      graft.operators.TimeSeries.rangeSum(s2, d)
    }),
    // user-grain grouping + label filter through the rewrite; the
    // DuckDB oracle aggregates RAW events, so the hash proves the
    // store-served answer equals raw semantics
    "q_rollup_rewrite_user" -> ((s, d) => {
      graft.sources.DownsampleStore.table(s, d)
      val s2 = s.newSession()
      s2.conf.set("spark.graft.rollup.rewrite", "true")
      import org.apache.spark.sql.functions._
      graft.Tables.events(s2, d)
        .filter(col("event_type") === "click")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
          col("user_id"))
        .agg(count(lit(1)).as("n"),
          min("value").as("min_value"),
          graft.functions.ExactNum.exactSum(col("value")).as("sum_value"))
    }),
    // merge-on-read upsert: base@v1 ∪ delta@v2 → latest per key;
    // the tombstone form adds v3 deletes (update-then-delete chains)
    "q_upsert_latest"    -> (graft.sources.UpsertStore.upsertLatest _),
    "q_upsert_tombstone" -> (graft.sources.UpsertStore.upsertTombstone _),
    // change-data-feed over the versioned store (round 10): per-key
    // mutation history as typed insert/update/delete rows
    "q_upsert_changelog" -> (graft.sources.UpsertStore.changelog _),
    // F. dedup
    "dedup_exact"         -> (Dedup.exact _),
    "dedup_incremental"   -> ((s, d) => Dedup.incremental(s, d)),
    // near-dup admission, batch twin of streaming/NearDupStream.scala
    "dedup_admission"     -> ((s, d) => Dedup.nearDupAdmission(s, d)),
    // the persistent content-index lifecycle behind dedup_incremental:
    // v1 corpus index + O(delta) v2 append, both write-once
    "dedup_index_maintain" -> ((s, d) => Dedup.indexMaintain(s, d)),
    // embedding-cosine admission: the vector sibling of dedup_admission.
    // The served DEFAULT is the hamming-sketch radius gate (round 15;
    // VERDICT r14 #1) — the plane-LSH probe measured 0.045 recall on
    // the raw corpus, not an adequate default for a duplicate gate
    "emb_admission"       -> ((s, d) => Dedup.embAdmission(s, d)),
    // the plane-LSH family stays explicit: the multi-probe recall knob
    // (round 13) — smallest-margin sign flips widen the bucket set
    "emb_admission_probe2" -> ((s, d) => Dedup.embAdmissionPlanes(s, d, nprobe = 2)),
    // the picker's SUBLINEAR side (round 16; VERDICT r15 #1): on the
    // clustered corpus at the semantic threshold, embAdmission serves
    // the TRAINED IVF-cell-pruned hamming gate — the oracle re-derives
    // everything including the k-means training, so the hash proves
    // the quantizer, the probe set, the radius cut AND the verdicts
    "emb_admission_ivf" -> ((s, d) => Dedup.embAdmission(
      s, d + graft.Tables.ClusteredTag, threshold = Dedup.SemThreshold)),
    // measured recall of the admission gates vs brute-force truth —
    // simhash pigeonhole proven complete (recall ≡ 1), the LSH probe
    // graded at widths 1/2/4 (monotone, spec-asserted), the hamming
    // gate graded as the served default (≥ 0.8, spec-asserted)
    "admission_recall"    -> ((s, d) => Dedup.admissionRecall(s, d)),
    // the same embedding-leg measurement on the CLUSTERED corpus — the
    // realistic regime, where recall is a retrieval-quality signal
    "admission_recall_clustered" ->
      ((s, d) => Dedup.admissionRecallClustered(s, d)),
    "dedup_minhash_lsh"   -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    // asymmetric containment: the near-dup class resemblance misses
    "dedup_containment" -> ((s, d) => Dedup.containment(s, d)),
    "dedup_simhash"       -> (Dedup.simhash _),
    "dedup_simhash_near"  -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "dedup_simhash_near_hash" -> ((s, d) => Dedup.simhashNearHashes(s, d)),
    "dedup_near_contents" -> (Dedup.nearDupContents _),
    "dedup_embedding"     -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "dedup_embedding_auto" -> ((s, d) => Dedup.embeddingNearDupAuto(s, d)),
    "dedup_clusters"      -> (Dedup.clusters _),
    "dedup_keep_best"     -> (Dedup.exactKeepBest _),
    "dedup_lines"         -> ((s, d) => Dedup.lineDedup(s, d)),
    // SemDeDup runs on the clustered derived corpus — semantic
    // duplicates only exist where cosine structure does
    "dedup_semantic"      -> ((s, d) => Dedup.semantic(s, d + Tables.ClusteredTag)),
    // rows-only: sample-trained k-means cells, k ~ sqrt(N) — SemDeDup's
    // deployment shape (training is not SQL-expressible)
    "dedup_semantic_trained" ->
      ((s, d) => Dedup.semanticTrained(s, d + Tables.ClusteredTag)),
    // G. similarity search
    "ann_bruteforce" -> (Similarity.bruteForce _),
    // binary sign-sketch: Hamming-radius prefilter + exact rerank
    "ann_hamming" -> ((s, d) => Similarity.hammingAnn(s, d)),
    // radius (range) search: everything within cosine >= tau of a
    // query — zero-shuffle broadcast-filter scan (round 10)
    "ann_range" -> ((s, d) => Similarity.rangeSearch(s, d)),
    // indexed radius search: probe the query's LSH bucket, same tau cut
    "ann_range_lsh" -> ((s, d) => Similarity.rangeSearchLsh(s, d)),
    "ann_lsh"        -> ((s, d) => Similarity.lsh(s, d)),
    "ann_ivf"        -> ((s, d) => Similarity.ivf(s, d)),
    "ann_ivf_nprobe2" -> ((s, d) => Similarity.ivfProbe2(s, d)),
    "ann_ivf_nprobe4" -> ((s, d) => Similarity.ivfProbe2(s, d, nprobe = 4)),
    "ann_ivfpq_nores4" -> ((s, d) => Similarity.ivfPqProbeNoRes(s, d)),
    // rows-only: k-means training is not SQL-expressible in the oracle
    "ann_ivf_trained" -> ((s, d) => Similarity.ivfTrained(s, d)),
    "ann_pq"          -> ((s, d) => Similarity.pq(s, d)),
    // scalar quantization (SQ8): 16x-compressed codes, asymmetric
    // search against midpoint-dequantized vectors (round 10)
    "ann_sq8"         -> ((s, d) => Similarity.sq8(s, d)),
    "ann_ivf_sq8"     -> ((s, d) => Similarity.ivfSq8(s, d)),
    "ann_ivfpq"       -> ((s, d) => Similarity.ivfPq(s, d)),
    "ann_ivfpq_res"   -> ((s, d) => Similarity.ivfPqResidual(s, d)),
    "ann_ivfpq_probe2" -> ((s, d) => Similarity.ivfPqProbe(s, d)),
    // rows-only: per-subspace k-means is not SQL-expressible
    "ann_pq_trained"  -> ((s, d) => Similarity.pqTrained(s, d)),
    // rows-only: the FAISS-default config (residual codes + books
    // TRAINED on residuals, multi-probe); spec asserts the clustered
    // recall recovery vs the formula-book residual entries
    "ann_ivfpq_res_trained" ->
      ((s, d) => Similarity.ivfPqResidualTrained(s, d)),
    "ann_recall"      -> ((s, d) => Similarity.recallAtK(s, d)),
    // k-NN graph over the LSH buckets (SemDeDup / clustering input)
    "emb_knn_graph"   -> ((s, d) => Similarity.knnGraph(s, d)),
    "emb_knn_graph_auto" -> ((s, d) => Similarity.knnGraphAuto(s, d)),
    "emb_cov"         -> ((s, d) => graft.pipeline.Pca.covariance(s, d)),
    "emb_pca"         -> ((s, d) => graft.pipeline.Pca.pca(s, d)),
    "emb_pca_project" -> ((s, d) => graft.pipeline.Pca.project(s, d)),
    // the same measurement where recall is a real quality signal: the
    // clustered derived corpus (Tables.ClusteredTag routes every leg)
    "ann_recall_clustered" ->
      ((s, d) => Similarity.recallAtK(s, d + Tables.ClusteredTag)),
    // rows-only: recall of the trained index family on the clustered
    // corpus (training is not SQL-expressible); targets spec-asserted
    "ann_recall_trained" ->
      ((s, d) => Similarity.recallTrained(s, d + Tables.ClusteredTag)),
    // H. text analysis
    "text_tokens"      -> (TextAnalysis.tokens _),
    "text_bigrams"     -> ((s, d) => TextAnalysis.bigrams(s, d)),
    // PMI collocation mining (round 10): phrase detection over corpus
    // bigram/unigram counts, quantized-ln exact
    "text_collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
    "text_quality"     -> (TextAnalysis.quality _),
    "text_langid"      -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_rolling_fp"  -> (TextAnalysis.rollingFingerprint _),
    "text_repetition"  -> (TextAnalysis.repetition _),
    // the remaining Gopher rule family: integer-exact rule verdicts
    "doc_gopher_rules" -> (TextAnalysis.gopherRules _),
    "text_dup_spans"   -> ((s, d) => TextAnalysis.dupSpans(s, d)),
    "text_dup_scrub"   -> ((s, d) => TextAnalysis.dupScrub(s, d)),
    // TRUE ExactSubstr (round 17; VERDICT r16 #4): maximal duplicated
    // spans >= 16 tokens removed via distributed prefix-doubling suffix
    // ranking; the oracle re-derives the removed set with a DIFFERENT
    // method (direct 16-gram windows over DuckDB lists), so the hash
    // proves the suffix discipline computes exactly the paper's set
    "text_dup_scrub_sa" -> ((s, d) => TextAnalysis.dupScrubSa(s, d)),
    // the measuring twin: MAXIMAL duplicated spans >= 16 tokens as
    // per-doc statistics (span count / coverage / longest), the
    // gaps-and-islands projection of the same suffix-ranked coverage
    "text_dup_spans_sa" -> ((s, d) => TextAnalysis.dupSpansSa(s, d)),
    "text_entropy"     -> (TextAnalysis.entropy _),
    "text_novelty"     -> (TextAnalysis.novelty _),
    "doc_pii_scrub"    -> (TextAnalysis.piiScrub _),
    "doc_sample"       -> ((s, d) => TextAnalysis.sampleSplit(s, d)),
    "doc_contamination" -> ((s, d) => graft.pipeline.Curation.contamination(s, d)),
    // the hot-shingle frequency cap, oracle-proven: shingles in > 3
    // distinct contents are dropped before the join on BOTH engines
    "doc_contamination_capped" -> ((s, d) =>
      graft.pipeline.Curation.contamination(s, d, maxShingleFreq = 3L)),
    "doc_pack"          -> ((s, d) => graft.pipeline.Curation.packTokens(s, d)),
    "doc_lm_score"      -> (graft.pipeline.Curation.lmScore _),
    "doc_stratified"    -> ((s, d) => graft.pipeline.Curation.stratifiedSample(s, d)),
    "doc_source_cap"    -> ((s, d) => graft.pipeline.Curation.sourceCap(s, d)),
    "doc_chunks"        -> ((s, d) => TextAnalysis.chunks(s, d)),
    "doc_filter"        -> ((s, d) => graft.pipeline.Curation.filterVerdict(s, d)),
    "doc_bm25"          -> ((s, d) => graft.pipeline.Retrieval.bm25(s, d)),
    "doc_tfidf"         -> ((s, d) => graft.pipeline.Retrieval.tfidf(s, d)),
    "text_heavy_hitters" -> ((s, d) => graft.functions.HeavyHitters.textHeavyHitters(s, d)),
    "doc_weighted_sample" -> ((s, d) => graft.pipeline.Curation.weightedSample(s, d)),
    "doc_bm25_batch"    -> ((s, d) => graft.pipeline.Retrieval.bm25Batch(s, d)),
    // inverted-index store: vocabulary head + conjunctive term search
    "doc_inverted"      -> ((s, d) => graft.pipeline.Retrieval.invertedVocab(s, d)),
    "doc_term_search"   -> ((s, d) => graft.pipeline.Retrieval.termSearch(s, d)),
    // positional phrase search through the with-positions posting store
    "doc_phrase_search" -> ((s, d) => graft.pipeline.Retrieval.phraseSearch(s, d)),
    // MMR diversity re-ranking of the bm25 page (exact-integer greedy)
    "doc_mmr" -> ((s, d) => graft.pipeline.Retrieval.mmr(s, d)),
    // NEAR/W proximity search through the positional store
    "doc_near_search" -> ((s, d) => graft.pipeline.Retrieval.nearSearch(s, d)),
    // hashed-feature linear classifier (fastText-shaped serving path)
    "doc_quality_clf"   -> ((s, d) => graft.pipeline.Curation.qualityClf(s, d)),
    // in-engine classifier TRAINING: batch perceptron distilling the
    // fixed-weight teacher, epochs oracle-unrolled (pagerank pattern)
    "doc_clf_train"     -> ((s, d) => graft.pipeline.Curation.clfTrain(s, d)),
    "doc_mixture"       -> ((s, d) => graft.pipeline.Curation.mixtureSolve(s, d)),
    "doc_hybrid_search" -> ((s, d) => graft.pipeline.Retrieval.hybridSearch(s, d)),
    "doc_lm_bigram"     -> ((s, d) => graft.pipeline.Curation.lmBigram(s, d)),
    "doc_lm_kn"         -> ((s, d) => graft.pipeline.Curation.lmKneserNey(s, d)),
    "doc_curation_stream" -> ((s, d) =>
      graft.streaming.CurationStream.keptStore(s, d)),
    // CCNet-style perplexity-band gate over the bigram LM (rank-statistic
    // terciles, head+middle kept)
    "doc_ppl_filter"    -> ((s, d) => graft.pipeline.Curation.pplFilter(s, d)),
    "doc_dsir"          -> ((s, d) => graft.pipeline.Curation.dsirWeights(s, d)),
    "doc_dsir_sample"   -> ((s, d) => graft.pipeline.Curation.dsirSample(s, d)),
    // winnowing fingerprints (MOSS): shuffle-free per-doc sketch +
    // fingerprint-keyed match pairs
    "text_winnow"       -> ((s, d) => TextAnalysis.winnow(s, d)),
    "text_winnow_pairs" -> ((s, d) => TextAnalysis.winnowPairs(s, d)),
    // hot-key capped: fingerprints on more than WinnowMaxPostings
    // distinct contents dropped before the pair self-join
    "text_winnow_pairs_capped" -> ((s, d) =>
      TextAnalysis.winnowPairs(s, d,
        maxPostings = TextAnalysis.WinnowMaxPostings)),
    // sparse doc-to-doc cosine KNN: inverted-index self-join with
    // salient-term (prefix-filter) candidate blocking
    "doc_tfidf_knn" -> ((s, d) => graft.pipeline.Retrieval.tfidfKnn(s, d)),
    // hot-key capped: blocks holding more than KnnMaxBlock docs
    // dropped before candidate generation
    "doc_tfidf_knn_capped" -> ((s, d) =>
      graft.pipeline.Retrieval.tfidfKnn(s, d,
        maxBlock = graft.pipeline.Retrieval.KnnMaxBlock)),
    // in-engine BPE tokenizer TRAINING: merge rounds oracle-unrolled
    // (pagerank pattern); prefix-delimited replace = canonical greedy BPE
    "bpe_train"  -> ((s, d) => graft.pipeline.Bpe.train(s, d)),
    "bpe_tokens" -> ((s, d) => graft.pipeline.Bpe.tokenCounts(s, d)),
    "bpe_vocab"  -> ((s, d) => graft.pipeline.Bpe.vocabTop(s, d)),
    // WordPiece (BERT-family) trainer: BPE's merge loop ranked by the
    // likelihood score c12/(c1*c2), exact via the quantized-rational
    // integer rank key; rounds oracle-unrolled like bpe_train
    "wordpiece_train"  -> ((s, d) => graft.pipeline.Wordpiece.train(s, d)),
    "wordpiece_tokens" -> ((s, d) => graft.pipeline.Wordpiece.tokenCounts(s, d)),
    // rows-only: SentencePiece-style unigram-LM tokenizer (Viterbi-EM
    // over the once-reduced vocabulary, exact-BigInt argmax — no SQL
    // lattice exists for the oracle; UnigramSpec carries the contract)
    "unigram_train"  -> ((s, d) => graft.pipeline.Unigram.train(s, d)),
    "unigram_tokens" -> ((s, d) => graft.pipeline.Unigram.tokenCounts(s, d)),
    // I. multimodal: REAL javax.imageio decode of executor-synthesized
    // PNG filmstrips. The *_dims / *_idx projections are oracle-hashed
    // (filmstrip geometry is arithmetic in doc_id — DuckDB recomputes
    // it, so a hash match proves the decode); the full surfaces stay
    // rows-only because pixel hashes aren't SQL-expressible.
    "mm_decode"      -> ((s, d) => Multimodal.decode(s, d)),
    "mm_decode_dims" -> (Multimodal.decodeDims _),
    "mm_features"    -> (Multimodal.featuresDigest _),
    "mm_frames"      -> ((s, d) => Multimodal.sampleFrames(s, d)),
    "mm_frames_idx"  -> (Multimodal.frameIndex _),
    // rows-only: cosine over decoded-pixel histograms (not SQL-expressible)
    "mm_ann"         -> ((s, d) => Multimodal.annByFeatures(s, d)),
    // IMAGE NEAR-DUP ADMISSION (round 17; VERDICT r16 #7): the decoded
    // 64-bit phash through the width-generic block-LSH admission gate —
    // dedup-at-ingest for the multimodal column. Rows-only (pixel
    // provenance); MmAdmissionSpec pins it ≡ brute force and the
    // streaming leg ≡ batch.
    "mm_admission"   -> ((s, d) => Multimodal.admission(s, d)),
    "mm_audio_meta"  -> (Multimodal.audioMeta _),
    "mm_audio_features" -> (Multimodal.audioFeatures _),
  )

  /** DuckDB-dialect oracle SQL per query (same result, same column names).
    * Convention (SURVEY.md §5): double sums go through DECIMAL (exact,
    * order-independent), time buckets are epoch-second BIGINTs, ties are
    * broken deterministically.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
