package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries
import SparkFixture.{sf, spark}

class TimeSeriesSpec extends AnyFunSuite {

  test("rangeSum total equals the exact ungrouped sum") {
    val stepTotal = TimeSeries.rangeSum(spark, sf)
      .agg(sum(col("sum_value").cast("decimal(30,6)"))).collect()(0).getDecimal(0)
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(30,6)"))).collect()(0).getDecimal(0)
    assert(stepTotal.compareTo(direct) === 0)
  }

  test("rangeSumBy partitions the rangeSum: purchase rows agree") {
    val by = TimeSeries.rangeSumBy(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("step", "sum_value")
    val base = TimeSeries.rangeSum(spark, sf)
    assert(by.exceptAll(base).count() === 0)
    assert(base.exceptAll(by).count() === 0)
  }

  test("rate is finite and defined only from each series' second sample on") {
    val df = TimeSeries.rate(spark, sf)
    val nSeriesWith2 = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").count().filter(col("count") >= 2)
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(df.count() === nSeriesWith2)
    assert(df.filter(col("rate").isNull || isnan(col("rate"))).count() === 0)
  }

  test("countOverTime sums back to the table row count") {
    val total = TimeSeries.countOverTime(spark, sf)
      .agg(sum("n_samples")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("avgMinMaxOverTime: min <= avg <= max per group") {
    val bad = TimeSeries.avgMinMaxOverTime(spark, sf)
      .filter(col("avg_value") < col("min_value") || col("avg_value") > col("max_value"))
    assert(bad.count() === 0)
  }

  test("topk emits at most 3 rows per step, ranked 1..k by sum desc") {
    val df = TimeSeries.topk(spark, sf)
    assert(df.groupBy("step").count().filter(col("count") > 3).count() === 0)
    val orderViolations = df.as("a").join(df.as("b"),
        col("a.step") === col("b.step") && (col("a.rnk") < col("b.rnk")) &&
          col("a.sum_value") < col("b.sum_value"))
    assert(orderViolations.count() === 0)
  }

  test("lastOverTime yields exactly one row per series, the newest") {
    val df = TimeSeries.lastOverTime(spark, sf)
    val nSeries = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(df.count() === nSeries)
  }

  test("histogramQuantile p95 sits at the 95th percentile position") {
    val rows = TimeSeries.histogramQuantile(spark, sf).collect()
    assert(rows.length === 5) // one per event_type
    rows.foreach { r =>
      val et = r.getString(0); val p95 = r.getDouble(1)
      val below = Tables.events(spark, sf)
        .filter(col("event_type") === et && col("value") <= p95).count()
      val n = Tables.events(spark, sf).filter(col("event_type") === et).count()
      assert(below >= (n * 0.95).floor.toLong, s"$et: $below of $n <= p95")
    }
  }

  test("histogramQuantile windows the histogram, not the raw samples") {
    // the per-event_type window (~5 keys) must sit above the
    // groupBy(event_type, value) aggregate — never over the full scan,
    // which would funnel the whole table into 5 reducers at scale
    val plan = SparkFixture.planOf(TimeSeries.histogramQuantile(spark, sf))
    val win = plan.indexOf("Window")
    val agg = plan.indexOf("HashAggregate")
    assert(win >= 0 && agg >= 0)
    // formatted explain prints root-first: the Window must CONSUME the
    // histogram HashAggregate, i.e. appear above it in the printout
    assert(win < agg,
      s"expected histogram aggregate below the window in the plan:\n$plan")
  }

  test("increase is non-negative (max - min)") {
    assert(TimeSeries.increase(spark, sf).filter(col("increase") < 0).count() === 0)
  }

  test("stddevOverTime matches a direct two-pass computation on a sample") {
    val rows = TimeSeries.stddevOverTime(spark, sf)
      .orderBy("step", "user_id", "event_type").limit(10).collect()
    rows.foreach { r =>
      val (step, uid, et) = (r.getLong(0), r.getLong(1), r.getString(2))
      val vals = Tables.events(spark, sf)
        .filter(unix_timestamp(date_trunc("day", col("ts"))) === step &&
          col("user_id") === uid && col("event_type") === et)
        .select("value").collect().map(_.getDouble(0))
      val mean = vals.sum / vals.length
      val expect = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / vals.length)
      // decimal(30,6) quantization of v and v² puts a ~1e-6 floor under
      // the variance; 1e-4 absolute is well inside sanity-check range
      assert(math.abs(r.getDouble(3) - expect) < 1e-4,
        s"($step,$uid,$et): got ${r.getDouble(3)}, want ~$expect")
      assert(r.getLong(4) === vals.length.toLong)
    }
  }

  test("delta equals last-minus-first per series window") {
    val d = TimeSeries.delta(spark, sf)
    // spot check: singleton groups have delta 0
    val singles = TimeSeries.countOverTime(spark, sf).filter(col("n_samples") === 1)
    val joined = d.join(singles, Seq("step", "user_id", "event_type"))
    assert(joined.filter(col("delta") =!= 0.0).count() === 0)
    assert(d.count() === TimeSeries.countOverTime(spark, sf).count())
  }

  test("deriv is defined exactly for groups with n>=2 and time spread") {
    val df = TimeSeries.deriv(spark, sf)
    assert(df.filter(col("deriv").isNull || isnan(col("deriv"))).count() === 0)
    // a constant-value series over distinct times must have slope ~0:
    // synthesize by checking deriv of groups whose max=min value
    val flat = Tables.events(spark, sf)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("user_id"), col("event_type"))
      .agg(max("value").as("mx"), min("value").as("mn"), count(lit(1)).as("n"))
      .filter(col("mx") === col("mn") && col("n") >= 2)
    val j = df.join(flat, Seq("step", "user_id", "event_type"))
    assert(j.filter(abs(col("deriv")) > 1e-9).count() === 0)
  }

  test("changes bounds resets; both cover all series-days") {
    val ch = TimeSeries.changes(spark, sf)
    val rs = TimeSeries.resets(spark, sf)
    assert(ch.count() === rs.count())
    val j = ch.join(rs, Seq("step", "user_id", "event_type"))
    // a reset (decrease) is always a change
    assert(j.filter(col("n_resets") > col("n_changes")).count() === 0)
    assert(ch.agg(sum("n_changes")).collect()(0).getLong(0) > 0)
  }

  test("quantileOverTime p50 is a stored value with half the group at or below") {
    val rows = TimeSeries.quantileOverTime(spark, sf)
      .orderBy("step", "user_id", "event_type").limit(15).collect()
    rows.foreach { r =>
      val (step, uid, et, p50) = (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))
      val grp = Tables.events(spark, sf)
        .filter(unix_timestamp(date_trunc("day", col("ts"))) === step &&
          col("user_id") === uid && col("event_type") === et)
      val n = grp.count()
      val below = grp.filter(col("value") <= p50).count()
      assert(below >= (n + 1) / 2, s"($step,$uid,$et): $below of $n <= p50")
      assert(grp.filter(col("value") === p50).count() > 0, "p50 must be a stored value")
    }
  }

  test("vectorRatio only emits (step, user) present on BOTH sides") {
    val df = TimeSeries.vectorRatio(spark, sf)
    def side(t: String) = Tables.events(spark, sf)
      .filter(col("event_type") === t)
      .select(unix_timestamp(date_trunc("hour", col("ts"))).as("step"), col("user_id"))
      .distinct()
    val both = side("purchase").join(side("click"), Seq("step", "user_id"))
    assert(df.count() === both.count())
    assert(df.filter(col("ratio").isNull || isnan(col("ratio"))).count() === 0)
  }

  test("absent is disjoint from present (step, event_type) pairs") {
    val ab = TimeSeries.absent(spark, sf)
    val present = Tables.events(spark, sf).select(
      unix_timestamp(date_trunc("hour", col("ts"))).as("step"), col("event_type"))
      .distinct()
    assert(ab.join(present, Seq("step", "event_type"), "inner").count() === 0)
  }

  test("native histograms: buckets partition, quantile lands in the right bucket") {
    def kOf(v: Double): Int =
      (TimeSeries.NhKLo to TimeSeries.NhKHi)
        .find(k => v <= math.pow(2.0, k)).getOrElse(TimeSeries.NhKHi + 1)
    val raw = Tables.events(spark, sf).select(
      unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
      col("event_type"), col("value")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getDouble(2)))
    val hist = TimeSeries.nhistBuild(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getInt(2)) -> r.getLong(3))
      .toMap
    // the buckets partition every histogram: counts replay exactly
    val want = raw.groupBy { case (key, v) => (key, kOf(v)) }
      .view.mapValues(_.length.toLong).toMap
    assert(hist === want)
    // header count matches, avg = sum/count
    val stats = TimeSeries.nhistStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    raw.groupBy(_._1).foreach { case (key, vs) =>
      val (n, hsum, havg) = stats(key)
      assert(n === vs.length.toLong, key)
      assert(math.abs(hsum - vs.map(_._2).sum) < 1e-6, key)
      assert(math.abs(havg - hsum / n) < 1e-9, key)
    }
    // the interpolated quantile lies strictly inside the bucket holding
    // the exact rank statistic (same ceil(round(.9 n, 9)) position rule)
    val qv = TimeSeries.nhistQuantile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    raw.groupBy(_._1).foreach { case (key, vs) =>
      val sorted = vs.map(_._2).sorted
      val rank = math.ceil(
        BigDecimal(sorted.length * 0.9)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      val kStar = kOf(sorted((rank - 1).toInt))
      val q = qv(key)
      assert(q > math.pow(2.0, kStar - 1) && q <= math.pow(2.0, kStar),
        s"$key: q=$q outside bucket $kStar")
    }
  }

  test("nhistFraction replays driver-side, is bounded, and widens monotonically") {
    def kOf(v: Double): Int =
      (TimeSeries.NhKLo to TimeSeries.NhKHi)
        .find(k => v <= math.pow(2.0, k)).getOrElse(TimeSeries.NhKHi + 1)
    def refFraction(vs: Seq[Double], lo: Double, hi: Double): Double = {
      val byK = vs.groupBy(kOf).view.mapValues(_.length.toLong)
      val t = byK.map { case (k, cnt) =>
        val (lower, upper) = (math.pow(2.0, k - 1), math.pow(2.0, k))
        val ov = math.max(0.0, math.min(hi, upper) - math.max(lo, lower))
        val w = math.min(1.0, ov / (upper - lower))
        BigDecimal(cnt.toDouble * w)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (t / BigDecimal(vs.length)).toDouble
    }
    val raw = Tables.events(spark, sf).select(
      unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
      col("event_type"), col("value")).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = TimeSeries.nhistFraction(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === raw.keySet)
    got.foreach { case (key, f) =>
      assert(f >= 0.0 && f <= 1.0, s"$key: fraction $f out of [0,1]")
      assert(math.abs(f - refFraction(raw(key), TimeSeries.NhFracLo,
        TimeSeries.NhFracHi)) < 1e-9, key)
    }
    // widening the interval only grows the fraction; the full bucket
    // span is exactly 1 (every bucket fully covered, no clamping loss)
    val wide = TimeSeries.nhistFraction(spark, sf, lo = 0.1, hi = 10.0)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    got.foreach { case (key, f) => assert(wide(key) >= f - 1e-12, key) }
    val full = TimeSeries.nhistFraction(spark, sf,
        lo = math.pow(2.0, TimeSeries.NhKLo - 1),
        hi = math.pow(2.0, TimeSeries.NhKHi + 1)).collect()
    full.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-9))
  }

  test("scrapeInterval equals a driver-side gap-statistics reference") {
    def kth(sorted: Seq[Long], n: Long, q: Double): Long = {
      val k = math.max(1L, math.ceil(
        BigDecimal(n * q).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong)
      sorted((k - 1).toInt)
    }
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((_, et), rows) =>
      val ts = rows.sortBy(e => (e._4, e._3)).map(_._4)
      ts.zip(ts.tail).map { case (a, b) => et -> (b - a) }
    }
    val want = gaps.groupBy(_._1).map { case (et, g) =>
      val vs = g.map(_._2)
      val sorted = vs.sorted
      val n = vs.length.toLong
      (et, n, vs.min, kth(sorted, n, 0.5), kth(sorted, n, 0.95), vs.max)
    }.toSet
    val got = TimeSeries.scrapeInterval(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === want)
  }

  test("scrapeInterval plans no unpartitioned window; rank picks run on the gap histogram") {
    // per-series lag partitions on (user_id, event_type); the rank
    // pick's cumulative window partitions on event_type but runs over
    // DISTINCT gap values (reducer state = |distinct gaps|, never
    // |samples| — the round-9 skew bomb this shape replaced)
    val plan = TimeSeries.scrapeInterval(spark, sf).queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned window: ${w.simpleStringWithNodeId()}"))
    // the cumulative pick consumes an aggregate (the histogram), so a
    // HashAggregate must sit below the event_type-partitioned window
    val cumW = windows.find(w => w.partitionSpec.length == 1 &&
      w.partitionSpec.head.sql.contains("event_type"))
    assert(cumW.isDefined, "missing the histogram cumulative window")
    val hasAggBelow = cumW.get.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.nonEmpty
    assert(hasAggBelow, "rank pick must run on the gap-value histogram, not raw gaps")
  }

  test("madOverTime equals a driver-side double-median reference") {
    // discrete median (stored value at ceil(0.5·n) in (v, event_id)
    // order), then the same pick over |v − med| — recomputed from the
    // raw events in plain Scala
    val evs = Tables.events(spark, sf)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("step"),
        col("user_id"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    def medOf(vs: Seq[(Double, Long)]): Double = {
      val sorted = vs.sortBy(identity)
      val k = math.ceil(BigDecimal(sorted.length * 0.5)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      sorted((k - 1).toInt)._1
    }
    val want = evs.groupBy(e => (e._1, e._2, e._3)).map { case (key, rows) =>
      val med = medOf(rows.toSeq.map(e => (e._5, e._4)))
      val mad = medOf(rows.toSeq.map(e => (math.abs(e._5 - med), e._4)))
      (key._1, key._2, key._3, mad)
    }.toSet
    val got = TimeSeries.madOverTime(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.length === want.size, "one mad row per series-day")
    assert(got.toSet === want)
  }

  test("nhistStddev equals a driver-side bucket-midpoint recomputation") {
    def r12(x: Double): Double = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables.events(spark, sf).select(
        unix_timestamp(date_trunc("hour", col("ts"))).as("step"),
        col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def kOf(v: Double): Int =
      (-6 to 9).find(k => v <= math.pow(2.0, k)).getOrElse(10)
    val want = evs.groupBy(e => (e._1, e._2)).map { case ((step, et), rows) =>
      val n = rows.length
      // the decimal(30,6) sum → double → /n → round-12 chain of
      // nhistStats, replayed exactly
      val sum = rows.map(e => BigDecimal(e._3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val avg = r12(sum.toDouble / n)
      val terms = rows.groupBy(e => kOf(e._3)).map { case (k, rs) =>
        val dev = BigDecimal(3.0 * math.pow(2.0, k - 2.0))
          .setScale(12) - BigDecimal(avg).setScale(12)
        (dev * dev).setScale(12, BigDecimal.RoundingMode.HALF_UP) * rs.length
      }
      val stdvar = terms.sum
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble / n
      (step, et, stdvar, math.sqrt(stdvar))
    }.toSet
    val got = TimeSeries.nhistStddev(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got === want)
  }

  test("madOverTime windows are all series-partitioned (no global sort)") {
    val plan = TimeSeries.madOverTime(spark, sf).queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.length === 3,
      s"window must partition on (step, user_id, event_type): ${w.simpleStringWithNodeId()}"))
  }
}
