package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query, wall-clock per query,
  * one JSON line. Queries materialize through the `noop` sink —
  * `count()` would let Catalyst prune exactly the expensive projected
  * columns (cosines, hashes) and flatter the numbers.
  *
  * Trustworthiness (the round-2 lesson: n=1 swung 17% on untouched
  * code):
  *  - each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3) and
  *    reports the MEDIAN, after one untimed global warmup;
  *  - a throwing query emits value -1.0 and lands in the `failed` list
  *    instead of a tiny wall-clock that reads like a speedup;
  *  - if BASELINE.md carries locked per-query numbers (a
  *    `{"baseline_queries":...}` JSON line), the output includes
  *    per-query `vs_baseline` ratios (median / baseline).
  */
object Bench {

  /** Minimal extractor for the baseline JSON line in BASELINE.md:
    * {"baseline_queries":{"name":sec,...},"baseline_total":sec}
    */
  private def readBaseline(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.isFile) return Map.empty
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val line = try src.getLines().find(_.startsWith("{\"baseline_queries\":"))
    finally src.close()
    line match {
      case None => Map.empty
      case Some(l) =>
        // value pattern must cover Double.toString's scientific notation
        // (9.0E-4) — a plain [0-9.]+ would silently truncate at 'E'
        val entry = """"([A-Za-z0-9_]+)":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)""".r
        val inner = l.substring(l.indexOf('{', 1), l.indexOf('}') + 1)
        entry.findAllMatchIn(inner).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "/root/repo/BASELINE.md")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/file-index startup otherwise lands on
    // whichever query happens to run first.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val failed = scala.collection.mutable.Buffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      if (times.length < reps && !failed.contains(name)) failed += name
      name -> (if (times.isEmpty) -1.0 else median(times))
    }
    val ok = results.filter(_._2 >= 0.0)
    val total = ok.values.sum
    val baseline = readBaseline(baselinePath)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val vsBaseline =
      if (baseline.isEmpty) ""
      else {
        val deltas = ok.flatMap { case (k, v) =>
          baseline.get(k).map(b => "\"" + k + "\":" + (if (b > 0) v / b else -1.0))
        }.mkString("{", ",", "}")
        s""","vs_baseline":$deltas,"baseline_total":${baseline.values.sum}"""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$reps,"failed":$failedJson,"queries":$qs$vsBaseline,"sf":"$sfDir"}""")
    spark.stop()
  }
}
