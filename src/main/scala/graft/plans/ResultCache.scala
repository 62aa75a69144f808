package graft.plans

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Promql
import graft.sources.ChunkStore

/** QUERY-FRONTEND RESULTS CACHE — step-aligned partial reuse for range
  * queries (the Cortex/Thanos query-frontend semantic): a stepped
  * PromQL result is a grid of (step, labels, value); a repeat of the
  * same query over a moved window should re-evaluate ONLY the steps not
  * evaluated before, and serve the rest from the cached grid.
  *
  * This is the read-side optimization a dashboard actually exercises
  * at 100 TB: the same panel refreshes every interval with the window
  * advanced one step — the frontend re-evaluates one step's worth of
  * raw data (the scan-pushdown machinery bounds the fresh evaluation's
  * parquet read to the uncovered tail alone) and reads everything else
  * back from a result store that is orders of magnitude smaller than
  * the raw table.
  *
  * Correctness contract: queryCached(expr, spec) returns ROW-FOR-ROW
  * what Promql.queryAt(expr, spec) returns (grid union is exact; a
  * step that evaluated to an empty vector is cached-as-empty through
  * the covered-interval metadata, not by absence of data). Determinism
  * survives the parquet round-trip (doubles are stored bit-exact).
  *
  * Cache key: (expr text, stepSec, lookbackSec, grid phase
  * startSec mod stepSec, dataset dir, source fingerprint) — the phase
  * is part of the key because two grids with different alignment share
  * no steps; the fingerprint (file size + mtime, the CurationStream
  * lesson) invalidates the cache when the source is regenerated
  * in-place.
  *
  * Store layout (write-once, idempotent):
  *   root/result_cache_<tag>/<key>/iv_<a>_<b>/   parquet, one dir per
  *     evaluated interval (OVERWRITE on re-evaluation, so a crash
  *     between data write and meta update re-runs idempotently);
  *   root/result_cache_<tag>/<key>/meta          covered intervals,
  *     one "a,b" line each, rewritten atomically via temp+rename.
  */
object ResultCache {

  private def keyOf(dir: String, expr: String, spec: Promql.EvalSpec): String = {
    val src = Paths.get(dir, "events.parquet")
    val fp = ChunkStore.sourceFingerprint(src, "events.parquet")
    val phase = Math.floorMod(spec.startSec, spec.stepSec)
    val raw = s"$expr|${spec.stepSec}|${spec.lookbackSec}|$phase|$dir|$fp"
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(raw).toLong & 0xffffffffL)
  }

  private def cacheDir(s: SparkSession, dir: String, expr: String,
                       spec: Promql.EvalSpec): Path =
    Paths.get(s"${ChunkStore.storeRoot(s)}/result_cache_" +
      s"${ChunkStore.pathTag(dir)}/${keyOf(dir, expr, spec)}")

  /** Covered intervals (inclusive epoch-sec step bounds), disjoint and
    * sorted, from the meta file.
    */
  private def readMeta(root: Path): Seq[(Long, Long)] = {
    val meta = root.resolve("meta")
    if (!Files.isRegularFile(meta)) return Seq.empty
    scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(meta)).asScala.toSeq
      .filter(_.nonEmpty)
      .map { l => val p = l.split(","); (p(0).toLong, p(1).toLong) }
      .sortBy(_._1)
  }

  private def writeMeta(root: Path, ivs: Seq[(Long, Long)]): Unit = {
    val tmp = root.resolve("meta.tmp")
    Files.createDirectories(root)
    Files.writeString(tmp,
      ivs.sortBy(_._1).map { case (a, b) => s"$a,$b" }.mkString("\n"))
    Files.move(tmp, root.resolve("meta"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Maximal grid-aligned sub-intervals of [reqStart, reqEnd] not
    * covered — pure interval subtraction, never per-step. Exposed
    * private[graft] so the spec can pin the arithmetic.
    */
  private[graft] def uncovered(reqStart: Long, reqEnd: Long, stepSec: Long,
                               covered: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    var cursor = reqStart
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((a, b) <- covered.sortBy(_._1) if b >= cursor && a <= reqEnd) {
      if (a > cursor) out += ((cursor, math.min(a - stepSec, reqEnd)))
      cursor = math.max(cursor, b + stepSec)
    }
    if (cursor <= reqEnd) out += ((cursor, reqEnd))
    out.toSeq.filter { case (x, y) => x <= y }
  }

  /** Evaluate `expr` on `spec`'s grid through the cache: covered steps
    * read back from the result store, uncovered sub-ranges evaluated
    * fresh (their parquet scan bounded to the sub-range by the
    * evaluator's pushdown), written once, and the whole requested grid
    * served from the store.
    */
  def queryCached(s: SparkSession, dir: String, expr: String,
                  spec: Promql.EvalSpec): DataFrame = {
    val root = cacheDir(s, dir, expr, spec)
    val covered0 = readMeta(root)
    val fresh = uncovered(spec.startSec, spec.endSec, spec.stepSec, covered0)
    for ((a, b) <- fresh) {
      val sub = Promql.EvalSpec(a, b, spec.stepSec, spec.lookbackSec)
      Promql.queryAt(s, dir, expr, sub)
        .write.mode("overwrite")
        .parquet(root.resolve(s"iv_${a}_$b").toString)
    }
    if (fresh.nonEmpty) writeMeta(root, covered0 ++ fresh)
    // serve the requested grid purely from the store: every interval
    // overlapping the request, step-filtered — a repeat query never
    // touches the raw table at all
    val serving = (covered0 ++ fresh)
      .filter { case (a, b) => b >= spec.startSec && a <= spec.endSec }
      .map { case (a, b) => root.resolve(s"iv_${a}_$b").toString }
    require(serving.nonEmpty, "empty evaluation grid")
    s.read.parquet(serving: _*)
      .filter(col("step") >= spec.startSec && col("step") <= spec.endSec)
  }
}
