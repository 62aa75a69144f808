package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core over the star schema — the general scan/join/agg
  * capabilities that back everything else. The reference is a single-table
  * engine (one sorted parquet file per block); joins here are the Spark
  * superset, kept shuffle-disciplined: dimension tables are broadcast,
  * fact-fact joins shuffle on the join key once, aggregates are
  * partial-agg friendly.
  *
  * All double sums go through DECIMAL (order-independent) and are emitted
  * as DOUBLE; division happens in double after the exact sum.
  */
object Relational {

  /** Default knobs for the parametric joins. The DuckDB oracle SQL
    * (OracleSql) interpolates THESE constants, so the oracle pins
    * exactly the default-knob configuration and cannot silently drift
    * from it; non-default invocations are covered by AsofJoinSpec's
    * brute-force equality instead.
    */
  val DefaultToleranceSec = 3600L
  val DefaultIntervalWidthSec = 3600L

  private def exactSum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  /** TPC-H Q1 — grouped multi-aggregate pricing summary on lineitem. Pure
    * map-side-combinable aggregation: shuffle carries 4-ish rows/partition.
    */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        (exactSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (exactSum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 — shipping priority: selective filters on both fact sides,
    * dimension (customer) broadcast, grouped revenue, deterministic top-10.
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1997-03-15 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1997-03-15 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_timestamp(col("o_orderdate")).as("orderdate"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-ish — 6-table join; every dimension chain collapses to a
    * broadcast; only lineitem⋈orders shuffles (on orderkey).
    */
  def q5Local(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.customer(s, dir)
      .join(Tables.nation(s, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** Window functions: top-3 orders per customer by price. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
  }

  /** windowRank via the custom TopKPerKey operator — identical result,
    * map-side-pruned shuffle instead of full shuffle + per-key sort.
    */
  def windowRankNative(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perKey(
      Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)

  /** Broadcast fact enrichment + conditional aggregation per nation. */
  def ordersEnrich(s: SparkSession, dir: String): DataFrame = {
    val custNation = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    Tables.orders(s, dir)
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        exactSum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0))).as("finished_value"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("n_urgent"))
  }

  /** Salted skew join: enrich every event with its type's global mean.
    * event_type has a handful of values, so a plain shuffle join would
    * put each type's entire fact side on one reducer. Salting fans each
    * hot key out over 8 buckets: the fact side gets a deterministic
    * salt, the (tiny) aggregate side is exploded ×8, and the join key
    * becomes (event_type, salt) — 8× the reduce parallelism, same rows.
    * (With a truly tiny dim you'd broadcast instead — see ordersEnrich;
    * salting is for when BOTH sides are too big to broadcast. AQE's
    * skew-join split is the automatic fallback; this is the explicit,
    * deterministic form.)
    */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val ev = Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    val perType = Tables.events(s, dir)
      .groupBy("event_type")
      .agg((exactSum(col("value")) / count(lit(1))).as("type_avg"))
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    // hint forces the shuffled join the pattern exists for — Catalyst
    // would otherwise broadcast this (test-sized) aggregate side
    ev.join(perType.hint("shuffle_hash"), Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("type_avg"), (col("value") - col("type_avg")).as("value_vs_avg"))
  }

  /** As-of join — for each left row, the single latest right row
    * at-or-before its timestamp within the same key. Spark has no ASOF
    * verb; the scalable formulation is union-tag + running `last` with
    * ignoreNulls: ONE shuffle on the key, one partition-local sort, no
    * pair blowup (a right row is carried forward, never joined N×M).
    * At 100 TB this is the sort-merge as-of — the window frame
    * (unboundedPreceding, currentRow) with `last` is evaluated as a
    * running value, O(n) per partition, so the plan survives any
    * timeline length per key.
    *
    * Ties are deterministic: at equal ts the right side sorts before
    * the left (at-or-before is inclusive), and among equal right ts
    * the larger event_id wins.
    */
  private def asofMatch(left: DataFrame, right: DataFrame): DataFrame = {
    // left: (event_id, user_id, ts) • right: (user_id, ts, event_id, value)
    val taggedRight = right
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"),
        struct(col("ts").as("p_ts"), col("event_id").as("p_id"),
          col("value").as("p_value")).as("p"))
    // the left leg's null payload takes its type from the right leg's
    // actual schema, so a generator-side type change surfaces at the
    // source, not as a union analysis error
    val payloadType = taggedRight.schema("p").dataType
    val tagged = taggedRight
      .unionAll(left.select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), lit(null).cast(payloadType).as("p")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("m", last("p", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
  }

  /** Each click enriched with the user's latest purchase at-or-before
    * it (left as-of join; unmatched clicks keep nulls).
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    asofMatch(clicks, purchases)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"),
        unix_micros(col("m.p_ts")).as("purchase_us"),
        col("m.p_value").as("purchase_value"))
  }

  /** As-of join with a tolerance (default one hour): only matches
    * within the last `toleranceSec` seconds count, and unmatched clicks
    * drop (inner semantics). The tolerance filters AFTER the running
    * match — the latest purchase is maximal, so "latest within
    * tolerance" ≡ "latest overall, if within tolerance" (an earlier
    * purchase can never be in-window when the latest is not).
    */
  def asofTolerance(s: SparkSession, dir: String,
                    toleranceSec: Long = Relational.DefaultToleranceSec): DataFrame = {
    require(toleranceSec > 0, "tolerance must be positive")
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    asofMatch(clicks, purchases)
      .filter(col("m").isNotNull &&
        col("m.p_ts") >= col("ts") - expr(s"INTERVAL $toleranceSec SECOND"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"),
        unix_micros(col("m.p_ts")).as("purchase_us"),
        col("m.p_value").as("purchase_value"))
  }

  /** Banded interval (range) join: per purchase, the clicks of the same
    * user in [purchase, purchase + `widthSec`) (default one hour). A
    * naive range join is a SortMergeJoin on user_id with the range as a
    * post-filter — per-key quadratic when a user's timeline is long.
    * The banded form bins the time axis at the interval width: every
    * interval spans ≤ 2 bins, so the purchase side explodes ×2 and the
    * join becomes a pure equi-join on (user_id, bin) + exact range
    * filter — candidate pairs are bounded by bin co-residency, not
    * timeline length². Each (purchase, click) pair arises exactly once
    * because a click lives in ONE bin. Bins use true FLOOR division
    * (pmod-adjusted `div`), so bin width == interval width holds for
    * pre-1970 timestamps too — `div` alone truncates toward zero and
    * would make the bin containing epoch 0 double-width.
    */
  def intervalJoin(s: SparkSession, dir: String,
                   widthSec: Long = Relational.DefaultIntervalWidthSec): DataFrame = {
    require(widthSec > 0, "interval width must be positive")
    val binUs = widthSec * 1000000L // bin width == interval width
    def bin(tsCol: String): Column =
      expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), ${binUs}L)) div ${binUs}L")
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withColumn("b0", bin("p_ts"))
      .withColumn("bin", explode(array(col("b0"), col("b0") + 1)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("value"))
      .withColumn("bin", bin("c_ts"))
    purchases.join(clicks, Seq("user_id", "bin"))
      .filter(col("c_ts") >= col("p_ts") &&
        col("c_ts") < col("p_ts") + expr(s"INTERVAL $widthSec SECOND"))
      .groupBy("purchase_id", "user_id")
      .agg(count(lit(1)).as("n_clicks"),
        exactSum(col("value")).as("click_value_sum"))
  }

  /** Semi/anti-join patterns (EXISTS / NOT EXISTS). */
  def semiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name")
    val ord = Tables.orders(s, dir)
    val pending = ord.filter(col("o_orderstatus") === "P").select("o_custkey")
    val noPending = cust
      .join(pending, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_pending").as("tag"))
    val big = ord.filter(col("o_totalprice") > 450000.0).select("o_custkey")
    val bigSpender = cust
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("big_spender").as("tag"))
    noPending.unionAll(bigSpender)
  }

  /** Event-time RANGE frame: per user, the rolling count/sum over the
    * trailing hour — a VALUE-bounded frame (rangeBetween on epoch-µs),
    * not a row-bounded one: all rows within the time bound enter the
    * frame regardless of row position, so equal-timestamp ties cannot
    * change the result and the frame is deterministic without a
    * tie-break column. One shuffle on user_id; Spark evaluates the
    * sliding range frame with a moving window over the sorted
    * partition, O(n) amortized per partition (each row enters and
    * leaves the frame once).
    */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(30,6)")).over(w)
          .cast("double").as("sum_1h"))
  }

  /** Distribution-rank window family: ntile quartiles, percent_rank,
    * cume_dist per event_type, ordered by (value, event_id) — the
    * event_id tie-break makes the total order unique, which is what
    * makes ntile deterministic (ntile splits ties arbitrarily under a
    * non-unique ordering; percent_rank/cume_dist would survive ties,
    * ntile would not). Both engines then compute identical rank
    * arithmetic: single IEEE divisions of exact integers.
    */
  def windowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("value", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .select(col("event_id"), col("event_type"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** ROLLUP over the region → nation dimension path: one shuffle total.
    * Both dimension joins broadcast (nation/region are tiny at every
    * scale — they're bounded enumerations), and Spark evaluates the
    * rollup as a single Expand + hash aggregate with map-side partials,
    * so the 3 grouping levels cost one exchange of pre-aggregated
    * partials, not 3 passes over the fact table. `gid` (grouping_id)
    * disambiguates a real NULL group value from a rolled-up level —
    * emitted as long to match the oracle's GROUPING() arithmetic.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(s, dir).select("r_regionkey", "r_name")
    Tables.orders(s, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      // expr(), not "r_name": string refs carry dataset-id tags that the
      // rollup Expand duplicates, tripping the ambiguous-self-join check
      .rollup(expr("r_name"), expr("n_name"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("revenue"))
  }

  /** CUBE over (event_type, user decile): all 4 grouping sets in the
    * same single Expand + partial-agg shuffle as [[rollupRevenue]] —
    * the decile is derived arithmetic (pmod), so the grouping key
    * never needs a dimension lookup.
    */
  def cubeEvents(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("decile", pmod(col("user_id"), lit(10L)))
      .cube("event_type", "decile")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_events"),
        exactSum(col("value")).as("value_sum"))
  }

  /** GROUPING SETS over (event_type, decile) — the explicit-set form
    * the rollup/cube pair can't express: exactly ((type, decile),
    * (type), (decile)), i.e. the cube minus its grand total (the spec
    * proves that identity against [[cubeEvents]]). Same physical shape
    * as rollup/cube: ONE Expand (3× row replication, each row tagged
    * with its set's grouping_id) feeding one partial-agg shuffle — no
    * per-set re-scan of the input at any scale.
    */
  def groupingSetsEvents(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("decile", pmod(col("user_id"), lit(10L)))
      .groupingSets(
        Seq(Seq(col("event_type"), col("decile")),
          Seq(col("event_type")), Seq(col("decile"))),
        col("event_type"), col("decile"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_events"),
        exactSum(col("value")).as("value_sum"))
  }

  /** PIVOT event counts per user: event_type values are pinned
    * EXPLICITLY (the 5 known types), which is the scale-honest form —
    * an unpinned pivot runs a driver-side distinct over the pivot
    * column first, a full extra job at 100 TB. With pinned values the
    * pivot is a single conditional aggregation: one shuffle on user_id,
    * map-side partials, no distinct pre-pass. Missing cells surface as
    * 0 (na.fill), matching the SQL conditional-count mirror.
    */
  def pivotEventCounts(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
  }

  /** TPC-H Q13 shape (customer order-count distribution): the LEFT
    * join preserves zero-order customers — the filter lives in the
    * JOIN CONDITION, not a WHERE, exactly the decorrelation trap Q13
    * tests. Plan: one co-partitioned shuffle join on custkey + a
    * per-customer partial agg; the second groupBy runs over ≤
    * max-orders-per-customer distinct values (metadata-sized at any
    * SF). Output fully ordered by (custdist, c_count) — unique keys
    * make the sort deterministic.
    */
  def custDist(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q4 shape (order-priority EXISTS count, round 12): orders in
    * one quarter having at least one RETURNED line — `l_returnflag =
    * 'R'` stands in for the original `l_commitdate < l_receiptdate`,
    * which the synthetic schema doesn't carry. The EXISTS compiles to
    * ONE left-semi shuffle join on the order key plus a 5-row
    * partial agg — never a fact-fact inner join that would duplicate
    * orders per matching line and need a distinct.
    */
  def q4Priority(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .select("o_orderkey", "o_orderpriority")
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q6 (forecast revenue): the pure scan-aggregate — every
    * predicate (ship year, discount band, quantity cap) pushes to the
    * parquet scan, the sum is one map-side-combinable decimal agg,
    * zero joins, one 1-row shuffle. The query whose 100 TB cost IS the
    * scan, which is why the pushdown matters.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(exactSum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H Q12 shape (priority-by-class conditional counts): one
    * fact-fact equi join on the order key, then CASE-bucketed counts —
    * `l_returnflag` plays the ship-mode class the synthetic schema
    * lacks. The CASE lives INSIDE the aggregate (map-side combinable),
    * not as a pre-pivot.
    */
  def q12Priority(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
  }

  /** TPC-H Q14 (promo revenue share): month of lineitem ⋈ broadcast
    * part, a conditional and an unconditional decimal sum in the SAME
    * single aggregate pass, divided in double at the one-row edge.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(s, dir).select("p_partkey", "p_type")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        exactSum(when(col("p_type") === "PROMO", disc).otherwise(0.0)) /
        exactSum(disc)).as("promo_revenue"))
  }

  /** TPC-H Q19 (discounted revenue, OR-of-ANDs): three brand/size/
    * quantity bands OR'd together across a lineitem ⋈ broadcast part
    * join. The disjunction mixes both sides' columns, so it cannot
    * push whole — but Catalyst extracts the per-side convertible
    * residues (the brand/size disjunction to the part scan, the
    * quantity disjunction to lineitem) via PushExtraPredicateThroughJoin,
    * which is the behavior worth pinning at 100 TB: the scan prunes
    * even when the full predicate can't move.
    */
  def q19Discount(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    val bands =
      (col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1.0, 11.0)) ||
      (col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 10) && col("l_quantity").between(10.0, 20.0)) ||
      (col("p_brand") === "Brand#5" &&
        col("p_size").between(1, 15) && col("l_quantity").between(20.0, 30.0))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(bands)
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** TPC-H Q17 shape (small-quantity revenue): the correlated scalar
    * subquery `l_quantity < 0.2 * (SELECT AVG(l_quantity) ... WHERE
    * l_partkey = p_partkey)` DECORRELATED into a per-part aggregate
    * joined back co-partitioned on partkey — the rewrite Catalyst
    * would have to find, done declaratively. Exactness: quantities
    * are integral, so `qty < avg/5` is the cross-multiplied integer
    * test `5·qty·n < sum` (no float threshold anywhere); revenue sums
    * through decimal(30,6). Plan: brand filter broadcast-semi-joins
    * the fact table FIRST (the selective dimension cut), then one
    * partkey-keyed partial agg + one co-partitioned join — the
    * brand's lineitems never leave their partitions between the agg
    * and the filter join.
    */
  /** TPC-H Q22 shape (promising idle customers): a GLOBAL scalar
    * subquery (corpus average balance) + an anti join (customers with
    * no URGENT orders — the synthetic corpus gives every customer
    * SOME order, so the unfiltered Q22 anti join would be empty; the
    * priority filter keeps the shape non-degenerate: 5 / 75 / 937
    * kept at sf0.001/0.01/0.1). The scalar aggregate is one broadcast
    * row crossed into the scan — never a shuffle; the anti join
    * shuffles on custkey co-partitioned with the filtered-orders
    * side. Exactness: balances are cents — ×100 to BIGINT — and
    * `bal > avg` is the cross-multiplied integer test bal_c·n > sum_c
    * (the q17 discipline: no float thresholds); the reported total
    * re-divides the exact cent sum once.
    */
  def idleRichCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"),
      col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val st = c.filter(col("bal_c") > 0L)
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("n"))
    val idle = c.join(
      Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
      col("c_custkey") === col("o_custkey"), "left_anti")
    idle.crossJoin(broadcast(st))
      .filter(col("bal_c") * col("n") > col("sum_c"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        (sum("bal_c").cast("double") / lit(100.0)).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q18 shape (large-volume customers): the HAVING subquery
    * `o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1
    * HAVING SUM(l_quantity) > T)` decorrelated into a per-order
    * partial agg (map-side-combinable on the fine-grained orderkey —
    * no hot reducers possible) whose HAVING filter drops ~98% of
    * orders BEFORE any join. The surviving orders join orders
    * co-partitioned on orderkey (AQE may broadcast the shrunken agg
    * side at runtime — either plan is right); customer is a broadcast
    * dim. Quantities are integral doubles cast to long so the
    * threshold is exact integer arithmetic. Top-100 by
    * (o_totalprice desc, o_orderkey) — the unique key makes the limit
    * deterministic; TopK pushes through the sort (TakeOrderedAndProject,
    * never a global sort materialization).
    */
  def largeVolumeCustomers(s: SparkSession, dir: String,
                           minQty: Long = 250L): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_orderkey")
      .agg(sum("qty").as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("orderdate"),
        col("o_totalprice"))
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    * double-correlated EXISTS / NOT EXISTS — "another supplier exists
    * on the order AND no OTHER supplier failed" — decorrelated into
    * ONE per-order aggregate instead of two correlated self-joins:
    * after collapsing lineitem to (order, supplier, failed?) rows
    * (failed = any returned line, `l_returnflag='R'` standing in for
    * the receipt>commit lateness test — this corpus carries no
    * receipt/commit dates), a per-order agg computes (#suppliers,
    * #failed-suppliers, the failed supplier when unique). The Q21
    * predicate is then a plain filter — ns≥2 ∧ nr=1 — and the waiting
    * supplier is already IN the row (nr=1 makes max-when exact), so
    * the EXISTS pair costs two orderkey-prefix shuffles total, no
    * self-join ever materializes order×supplier×supplier pairs. The
    * supplier⋈nation dimension chain (fifth-of-nations cut) collapses
    * to one broadcast. 100 TB: both shuffles are fine-grained
    * (orderkey / (orderkey,suppkey)); the final count is a partial agg
    * over ≤|suppliers| keys.
    */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_returnflag") === "R").cast("long").as("r"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("r").as("r"))
    val perOrder = perSupp
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("ns"), sum("r").as("nr"),
        max(when(col("r") === 1L, col("l_suppkey"))).as("rs"))
      .filter(col("ns") >= 2L && col("nr") === 1L)
    val dims = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir).filter(col("n_nationkey") % 5 === 3),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    perOrder.join(broadcast(dims), col("rs") === col("s_suppkey"))
      .groupBy("s_name", "n_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  def smallQtyRevenue(s: SparkSession, dir: String,
                      brand: String = "Brand#3"): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") === brand).select("p_partkey")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
    val stats = li.groupBy("l_partkey")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n"))
    li.join(stats, Seq("l_partkey"))
      .filter(lit(5L) * col("qty") * col("n") < col("sum_qty"))
      .agg(coalesce(
        (sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double")
          / lit(7.0)), lit(0.0)).as("avg_yearly"))
  }
}
