package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Alerts, Promql}
import SparkFixture.spark

/** The alerting-rule state machine on crafted held-condition timelines:
  * every upstream transition pinned — pending→firing at exactly `for`,
  * pending dropped at a missed eval, firing hysteresis bridging gaps ≤
  * keep_firing_for (with extension rows carrying the last held value),
  * resolve after the keep window, and pending's inability to seed
  * hysteresis.
  */
class AlertsSpec extends AnyFunSuite {
  import spark.implicits._

  private val H = 3600L
  private val spec = Promql.EvalSpec(0L, 20 * H, H)

  private def run(held: Seq[(Long, String, Double)], forSec: Long,
                  keepSec: Long): Map[(Long, String), (String, Double)] =
    Alerts.alertStates(spark,
        held.toDF("step", "series", "value"), spec, forSec, keepSec)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getDouble(3)))
      .toMap

  // series a: short pending-only island / long island that ignites /
  // a re-hold within keep / a far-away restart
  private val heldA = Seq(
    (0L, "a", 1.0), (H, "a", 2.0),
    (3 * H, "a", 3.0), (4 * H, "a", 4.0), (5 * H, "a", 5.0),
    (7 * H, "a", 7.0),
    (10 * H, "a", 10.0))

  test("ActiveAt (ALERTS_FOR_STATE): pending episodes restart, firing episodes hold across bridged gaps") {
    def runAll(held: Seq[(Long, String, Double)], forSec: Long,
               keepSec: Long): Map[(Long, String), (String, Long)] =
      Alerts.alertStatesAll(spark,
          held.toDF("step", "series", "value"), spec, forSec, keepSec)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getString(2), r.getLong(4)))
        .toMap
    // series a: ignites at 2H (for=2H from island start 0), misses 3H
    // (keep=H extension), re-holds 4H inside the bridge — ActiveAt must
    // stay the ORIGINAL episode's start (upstream never resets ActiveAt
    // while the alert stays firing)
    val held = Seq(
      (0L, "a", 1.0), (H, "a", 2.0), (2 * H, "a", 3.0), (4 * H, "a", 4.0),
      // series b: pending episode at 0, dropped at the missed eval,
      // NEW pending episode at 2H — ActiveAt restarts
      (0L, "b", 1.0), (2 * H, "b", 2.0), (3 * H, "b", 3.0))
    val m = runAll(held, forSec = 2 * H, keepSec = H)
    assert(m((0L, "a")) === ("pending", 0L))
    assert(m((H, "a")) === ("pending", 0L))
    assert(m((2 * H, "a")) === ("firing", 0L))
    assert(m((3 * H, "a")) === ("firing", 0L), "extension row keeps ActiveAt")
    assert(m((4 * H, "a")) === ("firing", 0L), "bridged re-hold keeps ActiveAt")
    assert(m((0L, "b")) === ("pending", 0L))
    assert(!m.contains((H, "b")), "pending drops at the missed eval")
    assert(m((2 * H, "b")) === ("pending", 2 * H), "new episode restarts ActiveAt")
    assert(m((3 * H, "b")) === ("pending", 2 * H))
  }

  test("for clock: pending until held for >= forSec, firing after") {
    val m = run(heldA, forSec = 2 * H, keepSec = 0L)
    assert(m((0L, "a"))._1 === "pending")
    assert(m((H, "a"))._1 === "pending")
    // island {3H,4H,5H}: active_at 3H, fires at 3H+2H = 5H
    assert(m((3 * H, "a"))._1 === "pending")
    assert(m((4 * H, "a"))._1 === "pending")
    assert(m((5 * H, "a"))._1 === "firing")
    // keep=0: every re-hold restarts pending; no extension rows
    assert(m((7 * H, "a"))._1 === "pending")
    assert(m((10 * H, "a"))._1 === "pending")
    assert(m.size === 7, "keep=0 must emit exactly the held rows")
  }

  test("hysteresis: firing bridges a gap <= keep, extension rows carry the last held value") {
    val m = run(heldA, forSec = 2 * H, keepSec = H)
    // unchanged up to ignition
    assert(m((4 * H, "a"))._1 === "pending")
    assert(m((5 * H, "a"))._1 === "firing")
    // missed eval at 6H: within keep of 5H -> extension row, firing,
    // value = the last held value (5.0)
    assert(m((6 * H, "a")) === ("firing", 5.0))
    // re-hold at 7H: CONTINUES firing (no new pending phase)
    assert(m((7 * H, "a")) === ("firing", 7.0))
    // 8H: extension (8H - 7H = keep); 9H: 2H past last held > keep -> resolved
    assert(m((8 * H, "a")) === ("firing", 7.0))
    assert(!m.contains((9 * H, "a")))
    // 10H: far restart -> fresh pending
    assert(m((10 * H, "a"))._1 === "pending")
  }

  test("pending is dropped at a missed eval and cannot seed hysteresis") {
    val m = run(heldA, forSec = 2 * H, keepSec = H)
    // island {0,1H} never fires (span 1H < for 2H): no extension at 2H
    assert(m((0L, "a"))._1 === "pending")
    assert(m((H, "a"))._1 === "pending")
    assert(!m.contains((2 * H, "a")))
  }

  test("pre-ignition islands chain but stay pending until one holds long enough on its own") {
    // gaps of exactly keep+step connect every island into one chain,
    // but ignition needs span >= for; singles never ignite
    val heldB = Seq(
      (0L, "b", 1.0), (2 * H, "b", 2.0),
      (4 * H, "b", 3.0), (5 * H, "b", 4.0), (6 * H, "b", 5.0))
    val m = run(heldB, forSec = 2 * H, keepSec = H)
    assert(m((0L, "b"))._1 === "pending")
    assert(m((2 * H, "b"))._1 === "pending")
    // NO extension rows at 1H/3H: prior state was pending, not firing
    assert(!m.contains((H, "b")) && !m.contains((3 * H, "b")))
    assert(m((4 * H, "b"))._1 === "pending")
    assert(m((5 * H, "b"))._1 === "pending")
    assert(m((6 * H, "b"))._1 === "firing")
  }

  test("forSec = 0 fires immediately; independent series do not interact") {
    val held = Seq((0L, "a", 1.0), (0L, "b", 2.0), (H, "a", 3.0))
    val m = run(held, forSec = 0L, keepSec = 0L)
    assert(m((0L, "a"))._1 === "firing")
    assert(m((0L, "b"))._1 === "firing")
    assert(m((H, "a"))._1 === "firing")
    assert(m.size === 3)
  }

  test("with the rewrite opted in, the alert rule evaluates entirely from the rollup store") {
    val d = SparkFixture.sf
    graft.sources.DownsampleStore.table(spark, d)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.rollup.rewrite", "true")
    val df = Alerts.rule(s2, d,
      """sum by (event_type) (count_over_time({event_type=~"click|view|purchase|signup|error"}[2h])) > 6""",
      Promql.EvalSpec(1704067200L, 1704153600L, 3600L, 7200L),
      forSec = 7200L, keepSec = 3600L)
    df.collect()
    val locs = "Location.*?\\[(.*?)\\]".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1)).toSet
    assert(locs.nonEmpty)
    assert(locs.forall(_.contains("downsample_")),
      s"alert rule must scan only the rollup store, scanned: $locs")
  }

  test("extension rows never extend past the grid end or before a series' first hold") {
    val held = Seq((19 * H, "c", 1.0), (20 * H, "c", 2.0))
    val m = run(held, forSec = 0L, keepSec = 5 * H)
    // fires at 19H and 20H; grid ends at 20H so no rows beyond
    assert(m.keys.map(_._1).max === 20 * H)
    assert(m.keys.map(_._1).min === 19 * H)
    assert(m.size === 2)
  }
}
