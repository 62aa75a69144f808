package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** STREAMING RULE GROUPS — N rules, ONE stream (round 17, the
  * streaming twin of operators.RuleGroup). The Prometheus ruler
  * evaluates a whole rule group per interval over one TSDB
  * (rules/group.go's Eval loop); graft's online ruler ran each rule as
  * its own streaming query — N rules over the ingest stream paid N
  * source scans, N watermarks, N state stores. This operator runs the
  * group as ONE stateful pass:
  *
  *  - one file-stream source, filtered to the UNION of the group's
  *    selectors (plus the watermark-pinning disjunct — every ingested
  *    event drives the shared event clock);
  *  - one keyed state fold per series holding open-bucket partials at
  *    the group's GCD resolution `g` — each partial is the same
  *    (n, exact-decimal Σ, min, max) quadruple AlertStream keeps, so
  *    every fused-verb rule aggregates by merging `W_r / g` base
  *    partials (counts/sums merge associatively — the decimal string
  *    sum stays exact — and order stats compose); COUNTER rules
  *    (rate/increase) additionally keep open-bucket samples, shared
  *    across all counter rules in the group, and evaluate the exact
  *    order-dependent growth chain at close (see AlertStream.Verbs);
  *  - per matching rule: its own grid machine (cursor, pending→firing
  *    `for:` clock, `keep_firing_for:` hysteresis) stepping at its own
  *    window — the EXACT AlertStream machine, N-ified. Emissions are
  *    row-for-row AND value-exactly what N independent AlertStream
  *    runs produce (AlertGroupStreamSpec), hence transitively equal to
  *    the batch state machine (AlertStreamSpec's bridge).
  *
  * Rules without a threshold are RECORDING rules: each closed
  * data-bearing bucket emits its value (alertstate `none`) — the
  * group's recording half, same machine minus the comparison.
  *
  * State per series is O(open base buckets × 1) + O(matching rules):
  * partials are SHARED across rules (a 30-rule group over one selector
  * family holds one partial map, not 30), and a base bucket is GC'd
  * once every matching rule's cursor has passed it. Nothing is
  * sample- or history-sized.
  */
object AlertGroupStream {

  /** One group rule. `threshold` None = recording rule (no state
    * machine, every closed data-bearing bucket emits). Alert condition
    * is `verb(bucket) > threshold` — AlertStream's comparison.
    */
  case class SRule(name: String, metricRe: String, verb: String,
                   wSec: Long, threshold: Option[Double],
                   forSec: Long = 0L, keepSec: Long = 0L,
                   q: Double = 0.5) {
    require(AlertStream.Verbs.contains(verb),
      s"verb must be one of ${AlertStream.Verbs}, got $verb")
    require(wSec > 0 && forSec >= 0 && keepSec >= 0, "bad rule params")
  }

  /** Per-rule machine: AlertStream's (cursor, mode, activeAt,
    * lastHeld, lastValue) — cursor is the next W_r-aligned grid step.
    */
  case class GMach(cursor: Long, mode: Int, activeAt: Long,
                   lastHeld: Long, lastValue: Double)

  /** Per-series state: shared open base-bucket partials (AlertStream's
    * quadruple — the decimal sum as a plain string, exact over the
    * full decimal(30,6) range) + one machine per MATCHING rule, keyed
    * by rule index, created on the series' first admitted arrival.
    * When the group carries a COUNTER rule (rate/increase), open base
    * buckets also keep their samples (`samp`, shared across all
    * counter rules) — sample order decides the reset-corrected
    * growth, so counter buckets evaluate from samples at close
    * (AlertStream.counterBucketValue, the batch evaluator's exact
    * chain); base-bucket sample lists merge per rule window by
    * concatenation (the sort happens once, at evaluation).
    */
  case class GState(open: Map[Long, (Long, String, Double, Double)],
                    mach: Map[Int, GMach],
                    samp: Map[Long, Seq[(Long, Long, Long, Double)]] =
                      Map.empty)

  case class GroupOut(rule: String, step: Long, event_type: String,
                      alertstate: String, value: Double)

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  private def q6(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  /** One MAINTENANCE pass of the group with the ruler's write-back
    * half (the Prometheus group loop: recording rules' outputs land in
    * the TSDB as they evaluate — rules/group.go's Eval appends to the
    * appender): drain the inbox once, route each RECORDING rule's
    * closed buckets into its own recorded store (`baseDir/<rule>` —
    * RecordedRules.toSamples, the SAME mapping the batch recorder and
    * RecordingRuleStream use, so rows below the horizon are
    * byte-identical to a batch record() of the rule), append alert
    * emissions to `baseDir/alerts`, and advance each store's
    * `_watermark` completeness horizon. Restart-safe: foreachBatch is
    * at-least-once, so every batch OVERWRITES its own `batch=<id>`
    * dirs (the NearDupStream discipline — fresh-checkpoint-over-
    * existing-store refused), and the group's cursor state makes
    * emissions themselves append-exact. Serve a rule's store back
    * through RecordingRuleStream.MaintainedSource.
    */
  def runOnce(s: SparkSession, inDir: String, baseDir: String,
              checkpoint: String, rules: Seq[SRule],
              delay: String = "1 hour"): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val recRules = rules.filter(_.threshold.isEmpty)
    rules.foreach(r => require(r.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad rule name ${r.name}"))
    val stores = recRules.map(r => r.name -> s"$baseDir/${r.name}").toMap
    (stores.values.toSeq :+ s"$baseDir/alerts").foreach { d =>
      NearDupStream.guardFreshCheckpoint(s"$d/parts", checkpoint)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    }
    val q = run(s, inDir, rules, delay).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          for (r <- recRules) {
            val rows = b.filter(col("rule") === r.name)
              .select(col("step"), col("event_type"), col("value"))
            // empty batches skipped — a schema-only part must not make
            // the store look populated (the RollupMaintainStream lesson)
            if (!rows.isEmpty)
              graft.sources.RecordedRules.toSamples(rows, r.name)
                .write.mode("overwrite")
                .parquet(s"${stores(r.name)}/parts/batch=$batchId")
          }
          val alerts = b.filter(col("alertstate") =!= "none")
          if (!alerts.isEmpty)
            alerts.write.mode("overwrite")
              .parquet(s"$baseDir/alerts/parts/batch=$batchId")
        } finally { b.unpersist(); () }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wm = Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(ts => java.time.Instant.parse(ts).getEpochSecond)
    wm.foreach { h =>
      stores.values.foreach { d =>
        val prev = RollupMaintainStream.readMarker(d, "_watermark")
          .getOrElse(Long.MinValue)
        if (h > prev) RollupMaintainStream.writeMarker(d, "_watermark", h)
      }
    }
  }

  /** Run the group over the parquet file stream at `inDir`. Caller
    * owns the sink (Append). Emissions: (rule, step, event_type,
    * alertstate, value) — alert rules emit pending/firing rows,
    * recording rules emit `none` rows for every closed data-bearing
    * bucket.
    */
  def run(s: SparkSession, inDir: String, rules: Seq[SRule],
          delay: String = "1 hour"): DataFrame = {
    import s.implicits._
    require(rules.nonEmpty && rules.map(_.name).distinct.size == rules.size,
      "rules must be non-empty with distinct names")
    val g = rules.map(_.wSec).reduce(gcd)
    // keep_firing_for ceiled to each rule's OWN grid (operators.Alerts'
    // KeepFiringSince anchoring, per rule)
    val keepG: Map[Int, Long] = rules.zipWithIndex.map { case (r, i) =>
      i -> (if (r.keepSec <= 0L) 0L
            else ((r.keepSec + r.wSec - 1L) / r.wSec) * r.wSec)
    }.toMap
    val unionRe = rules.map(r => s"(?:${r.metricRe})").mkString("|")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Ingest.eventsStream(s, inDir)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", delay)
      // the selector disjunct pins this filter ABOVE the watermark
      // node: every ingested event drives the shared clock (the
      // AlertStream / PromqlStream watermark-pinning lesson)
      .filter(col("event_type").rlike(s"^(?:$unionRe)$$") || col("ts").isNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("value").cast("double").as("value"),
        col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("ts"))
      .as[(String, Long, Double, Long, Long, java.sql.Timestamp)]
    val counterVerb = Set("rate", "increase")
    val sampleVerb = AlertStream.SampleVerbs

    src.groupByKey(_._1)
      .flatMapGroupsWithState[GState, GroupOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          // rules this series participates in — membership is a pure
          // function of the key, decided identically every invocation
          val mine = rules.zipWithIndex
            .filter { case (r, _) => key.matches(s"^(?:${r.metricRe})$$") }
          def baseOf(us: Long): Long =
            Math.floorDiv(Math.floorDiv(us, 1000000L), g) * g
          def ruleBucket(w: Long, b: Long): Long = Math.floorDiv(b, w) * w
          var st = state.getOption.getOrElse(GState(Map.empty, Map.empty))

          // fold arrivals into shared base-bucket partials. Cursor
          // init per rule follows AlertStream: floor(min(first
          // arrival, watermark)) onto the rule's OWN grid — a series
          // first seen in a later bucket keeps earlier still-open
          // buckets admissible. The admissibility guard (some matching
          // rule's bucket >= its cursor) only rejects stray late rows
          // that every machine has already finalized.
          val hasSample = mine.exists { case (r, _) => sampleVerb(r.verb) }
          val byBucket = rows.toSeq.groupBy(r => baseOf(r._2))
          if (byBucket.nonEmpty && mine.nonEmpty) {
            val wmBase = Math.floorDiv(
              Math.floorDiv(state.getCurrentWatermarkMs(), 1000L), g) * g
            val floor0 = math.min(byBucket.keys.min, wmBase)
            val mach = mine.foldLeft(st.mach) { case (m, (r, i)) =>
              if (m.contains(i)) m
              else m.updated(i, GMach(ruleBucket(r.wSec, floor0),
                0, 0L, 0L, 0.0))
            }
            val admissible = byBucket.filter { case (b, _) =>
              mine.exists { case (r, i) =>
                ruleBucket(r.wSec, b) >= mach(i).cursor }
            }
            val open = admissible.view.mapValues { rs =>
              val vs = rs.map(_._3)
              (rs.size.toLong,
                vs.map(q6).reduce(_ add _).toPlainString, vs.min, vs.max)
            }.foldLeft(st.open) {
              case (m, (b, (n, s6, mn, mx))) =>
                val prev = m.getOrElse(b,
                  (0L, "0", Double.MaxValue, Double.MinValue))
                m.updated(b, (prev._1 + n,
                  new java.math.BigDecimal(prev._2)
                    .add(new java.math.BigDecimal(s6)).toPlainString,
                  math.min(prev._3, mn), math.max(prev._4, mx)))
            }
            // samples admit on SAMPLE-rule liveness only (counter OR
            // distribution verbs — round 17's shared channel): a
            // bucket a fused rule still needs but every sample rule
            // has passed keeps its quadruple, not its samples — sample
            // state is bounded by the sample-rule windows, not the
            // group's widest
            val samp =
              if (!hasSample) st.samp
              else admissible.filter { case (b, _) =>
                mine.exists { case (r, i) => sampleVerb(r.verb) &&
                  ruleBucket(r.wSec, b) >= mach(i).cursor }
              }.foldLeft(st.samp) { case (m, (b, rs)) =>
                m.updated(b, m.getOrElse(b, Seq.empty) ++
                  rs.map(r => (r._4, r._2, r._5, r._3)))
              }
            st = GState(open, mach, samp)
          }

          val wmSec = Math.floorDiv(state.getCurrentWatermarkMs(), 1000L)
          val out = scala.collection.mutable.ArrayBuffer.empty[GroupOut]
          val machNext = scala.collection.mutable.Map.empty[Int, GMach]
          for ((r, i) <- mine; m0 <- st.mach.get(i)) {
            val W = r.wSec
            var m = m0
            // the rule's bucket aggregate: merge the base partials in
            // [cursor, cursor + W) — None when no data bucket overlaps
            // (the batch expr emits no row for a data-less bucket)
            def aggAt(step: Long): Option[(Long, java.math.BigDecimal,
                Double, Double)] = {
              val parts = st.open.collect {
                case (b, p) if b >= step && b < step + W => p }
              if (parts.isEmpty) None
              else Some(parts.foldLeft((0L,
                  java.math.BigDecimal.ZERO, Double.MaxValue,
                  Double.MinValue)) { case ((n, s6, mn, mx), p) =>
                (n + p._1, s6.add(new java.math.BigDecimal(p._2)),
                  math.min(mn, p._3), math.max(mx, p._4))
              })
            }
            // sample rules (counter + distribution): concat the
            // window's base sample lists and evaluate the exact chain
            // (sorts happen inside)
            def sampleAt(step: Long): Option[Double] = {
              val ss = st.samp.collect {
                case (b, rs) if b >= step && b < step + W => rs }.flatten
              if (ss.isEmpty) None
              else if (counterVerb(r.verb))
                Some(AlertStream.counterBucketValue(r.verb, W, ss.toSeq))
              else Some(AlertStream.distBucketValue(r.verb, r.q, ss.toSeq))
            }
            var done = false
            while (!done && m.cursor + W <= wmSec) {
              if (m.mode == 0) {
                // inactive: empty buckets emit nothing — jump the
                // cursor to the next rule bucket that has data
                val future = st.open.keys
                  .filter(b => ruleBucket(W, b) >= m.cursor)
                if (future.isEmpty) done = true
                else m = m.copy(cursor =
                  math.max(m.cursor, ruleBucket(W, future.min)))
              }
              if (!done && m.cursor + W <= wmSec) {
                val step = m.cursor
                val value =
                  if (sampleVerb(r.verb)) sampleAt(step)
                  else aggAt(step).map { case (n, s6, mn, mx) =>
                    r.verb match {
                      case "count" => n.toDouble
                      case "sum"   => s6.doubleValue
                      case "min"   => mn
                      case "max"   => mx
                    }
                  }
                r.threshold match {
                  case None =>
                    // recording rule: every data-bearing bucket emits
                    value.foreach { v =>
                      out += GroupOut(r.name, step, key, "none", v) }
                  case Some(thr) =>
                    val held = value.exists(_ > thr)
                    if (held) {
                      val v = value.get
                      if (m.mode == 0) m = m.copy(mode = 1, activeAt = step)
                      if (m.mode == 1 && step - m.activeAt >= r.forSec)
                        m = m.copy(mode = 2)
                      m = m.copy(lastHeld = step, lastValue = v)
                      out += GroupOut(r.name, step, key,
                        if (m.mode == 2) "firing" else "pending", v)
                    } else m.mode match {
                      case 1 => m = m.copy(mode = 0)
                      case 2 =>
                        if (keepG(i) > 0 && step - m.lastHeld <= keepG(i))
                          out += GroupOut(r.name, step, key, "firing",
                            m.lastValue)
                        else m = m.copy(mode = 0)
                      case _ => ()
                    }
                }
                m = m.copy(cursor = step + W)
              }
            }
            machNext(i) = m
          }
          st = st.copy(mach = st.mach ++ machNext)
          // GC: a base bucket is dead once EVERY matching rule's
          // cursor has passed its rule bucket
          if (st.mach.nonEmpty) {
            def liveFor(b: Long, sampleOnly: Boolean): Boolean =
              mine.exists { case (r, i) =>
                (!sampleOnly || sampleVerb(r.verb)) &&
                  st.mach.get(i).forall(m =>
                    ruleBucket(r.wSec, b) >= m.cursor) }
            st = st.copy(
              open = st.open.filter(kv => liveFor(kv._1, sampleOnly = false)),
              samp = st.samp.filter(kv => liveFor(kv._1, sampleOnly = true)))
          }

          val anyActive = mine.exists { case (_, i) =>
            st.mach.get(i).exists(_.mode != 0) }
          if (!anyActive && st.open.isEmpty) state.remove()
          else {
            state.update(st)
            // next evaluation: the min over rules of the earliest
            // bucket close each is waiting for — cursor's own end
            // while its machine is active (missed evals matter), else
            // the earliest data bucket's end on that rule's grid
            val nexts = mine.flatMap { case (r, i) =>
              st.mach.get(i).flatMap { m =>
                if (m.mode != 0) Some(m.cursor + r.wSec)
                else st.open.keys
                  .filter(b => ruleBucket(r.wSec, b) >= m.cursor)
                  .map(b => ruleBucket(r.wSec, b) + r.wSec)
                  .reduceOption(_ min _)
              }
            }
            if (nexts.nonEmpty)
              state.setTimeoutTimestamp(math.max(nexts.min * 1000L - 1L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }
}
