package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Alerts, Promql}
import SparkFixture.spark

/** Property-style sweep for the alert state machine: the factored
  * window formulation (islands → hysteresis chains → running ignition
  * min + dense-grid extension) must equal a PLAIN SEQUENTIAL fold of
  * the upstream rule semantics on randomized held timelines — the
  * definitional check the crafted-transition fixtures cannot sweep.
  */
class AlertsPropSpec extends AnyFunSuite {
  import spark.implicits._

  private val H = 3600L
  private val Steps = 40

  /** The upstream ruler loop, written in rules/alerting.go's LITERAL
    * form: KeepFiringSince anchors at the first MISSED eval, the alert
    * keeps firing while (now − since) < keepFiringFor, and a held eval
    * clears the anchor. No grid rounding here — the engine's
    * ceil-to-step restatement (Alerts.alertStates keepG) must equal
    * THIS machine for every keep, step-aligned or not.
    */
  private def referee(held: Map[Long, Double], grid: Seq[Long],
                      forSec: Long, keepSec: Long): Map[Long, (String, Double)] = {
    var mode = 0; var activeAt = 0L; var lastVal = 0.0
    var since = Long.MinValue // KeepFiringSince; MinValue = unset
    val out = scala.collection.mutable.Map.empty[Long, (String, Double)]
    for (t <- grid) held.get(t) match {
      case Some(v) =>
        if (mode == 0) { mode = 1; activeAt = t }
        if (mode == 1 && t - activeAt >= forSec) mode = 2
        since = Long.MinValue // held again: anchor clears
        lastVal = v
        out(t) = (if (mode == 2) "firing" else "pending", v)
      case None => mode match {
        case 1 => mode = 0
        case 2 =>
          if (keepSec > 0) {
            if (since == Long.MinValue) since = t // first missed eval
            if (t - since < keepSec) out(t) = ("firing", lastVal)
            else { mode = 0; since = Long.MinValue }
          } else mode = 0
        case _ => ()
      }
    }
    out.toMap
  }

  test("factored machine equals the sequential referee on 60 randomized timelines") {
    val grid = (0 until Steps).map(_ * H)
    val spec = Promql.EvalSpec(0L, (Steps - 1) * H, H)
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(seed)
      // 3 series with ~45% held density (dense enough for chains,
      // sparse enough for gaps), values distinct per (series, step)
      val held = for {
        s <- Seq("a", "b", "c")
        t <- grid if rnd.nextDouble() < 0.45
      } yield (t, s, (t / H * 10 + s.hashCode.abs % 7).toDouble)
      if (held.nonEmpty) {
        val forSec = rnd.nextInt(4) * H
        // HALF-step keeps included (ADVICE r15): the ceil-to-grid
        // restatement must match the KeepFiringSince referee off-grid
        val keepSec = rnd.nextInt(8) * H / 2
        val got = Alerts.alertStates(spark,
            held.toDF("step", "series", "value"), spec, forSec, keepSec)
          .collect()
          .map(r => (r.getLong(0), r.getString(1)) ->
            (r.getString(2), r.getDouble(3))).toMap
        val want = (for (s <- Seq("a", "b", "c")) yield {
          val mine = held.filter(_._2 == s).map(r => r._1 -> r._3).toMap
          referee(mine, grid, forSec, keepSec)
            .map { case (t, sv) => (t, s) -> sv }
        }).flatten.toMap
        assert(got === want,
          s"seed=$seed for=$forSec keep=$keepSec: " +
            s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet} " +
            s"diff=${got.collect { case (k, v) if want.get(k).exists(_ != v) => (k, v, want(k)) }}")
      }
    }
  }
}
