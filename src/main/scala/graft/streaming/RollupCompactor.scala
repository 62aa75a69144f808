package graft.streaming

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import RollupMaintainStream.{readMarker, writeMarker, dataBearing, parseInc}

/** COMPACTION + RETENTION for the live rollup store chain (round 17;
  * VERDICT r16 #1 — the reference's Compact() role, db/writer.go:169-236,
  * applied to the stream-maintained store): every maintenance pass
  * appends a `parts/batch=<id>` dir and, when an hour/day closes, an
  * `inc_<a>_<b>` dir per fold level — a year-long live store at a 30 s
  * trigger is ~1M part dirs at the 300 s level, and serving lists and
  * footer-reads all of them. This job bounds the file count without
  * touching a byte of served data:
  *
  *  - **Raw parts** consolidate into ONE write-once dir
  *    `compact/upto_<m>_f<F>_g<g>` covering all batches with id <= m,
  *    behind a single atomic `_compact` marker (`m F g`). Serving
  *    resolves the marker first: the compacted dir plus live batch
  *    dirs with id > m — a crash between the dir write and the marker
  *    leaves the OLD view serving (batches still on disk), and a crash
  *    between the marker and the cleanup leaves superseded dirs that
  *    the id > m filter already excludes. Batch contents are final and
  *    deterministic (append mode + replay-stable recompute), so the
  *    rewrite is a pure function of the marker state — a crashed
  *    compaction re-runs into the same name as an overwrite.
  *
  *  - **Retention** (the per-resolution drop): the rewrite excludes
  *    raw buckets below a floor F = fold_3600s horizon − `retainRawFor`
  *    — only buckets the 1 h fold level has provably absorbed are ever
  *    dropped, so hour/day-aligned queries keep serving them from the
  *    fold bands and everything else falls back to the raw events scan
  *    (the floor gates in SteppedRollup.serve / RollupRewrite refuse,
  *    never under-count). F rides the `_compact` marker; it only ever
  *    advances. Retention requires a boundary-clean store (`_edge_count`
  *    == 0) so the recomputed edge marker cannot flip a dirty store
  *    servable by dropping its dirty rows.
  *
  *  - **Fold levels** consolidate LOG-STRUCTURED (the LSM posture —
  *    closed epochs are write-once, never rewritten): chain dirs in
  *    [`_cons`, q) merge into one `inc_<cons>_<q>` dir where q is the
  *    largest chunk-aligned chain-dir end (1 day chunks at the 1 h
  *    level, 1 week at 1 d), then `_cons` advances — the next epoch
  *    starts above q, so each consolidated dir is final forever and
  *    rewrite cost is O(new increments), not O(level). The
  *    marker-consistent greedy chain (RollupMaintainStream.foldedLevel)
  *    makes every crash window safe: an orphan consolidated dir is
  *    ADOPTED by the chain (widest range wins on equal ends) and its
  *    merged sources rejected, so serving stays exact before the
  *    cleanup lands.
  *
  * Single-writer posture: like the maintenance loop itself, compaction
  * assumes one writer per store (the in-JVM serialization the stream
  * checkpoint already enforces); a reader that planned a deleted dir
  * mid-swap re-plans — the same documented caveat as ResultCache.
  */
object RollupCompactor {

  /** The committed compaction view: batches <= upTo live in the
    * compacted dir, raw buckets below `floor` are dropped (retention),
    * `gen` bumps when a rewrite changes CONTENT for the same coverage
    * (the backfill repair path).
    */
  case class CompactState(upTo: Long, floor: Long, gen: Long) {
    def dirName: String = s"upto_${upTo}_f${floor}_g$gen"
  }

  /** No-retention sentinel (buckets are epoch seconds, far above it). */
  val NoFloor: Long = Long.MinValue

  def state(storeDir: String): Option[CompactState] = {
    val f = new File(storeDir, "_compact")
    if (!f.isFile) None
    else {
      val t = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.split(' ')
      Some(CompactState(t(0).toLong, t(1).toLong, t(2).toLong))
    }
  }

  /** The raw level's retention floor: buckets below it may have been
    * dropped from the 300 s store and must be served from the fold
    * bands or refused (the serving gates read this).
    */
  def retainFloor(storeDir: String): Long =
    state(storeDir).map(_.floor).getOrElse(NoFloor)

  private def compactRoot(storeDir: String) = new File(storeDir, "compact")

  private[streaming] def compactDir(storeDir: String, c: CompactState): File =
    new File(compactRoot(storeDir), c.dirName)

  private def batchDirs(storeDir: String): Seq[(Long, File)] =
    Option(new File(storeDir, "parts").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .flatMap(f => scala.util.Try(
        f.getName.stripPrefix("batch=").toLong -> f).toOption).toSeq

  /** One compaction pass over the raw parts + both fold levels.
    * Idempotent: an up-to-date store pays a directory listing. Call it
    * maintenance-pass-adjacent (demoStore does) or on any cadence —
    * correctness never depends on it running.
    *
    * @param retainRawFor keep raw 300 s buckets for at least this many
    *   seconds behind the 1 h fold horizon; older fold-covered buckets
    *   are dropped from the raw level (None = keep everything).
    */
  def compact(s: SparkSession, storeDir: String,
              retainRawFor: Option[Long] = None): Unit = {
    compactParts(s, storeDir, retainRawFor)
    consolidateLevel(s, storeDir, 3600L, chunkSec = 86400L)
    consolidateLevel(s, storeDir, 86400L, chunkSec = 7L * 86400L)
  }

  private def compactParts(s: SparkSession, storeDir: String,
                           retainRawFor: Option[Long]): Unit = {
    val prev = state(storeDir)
    val batches = batchDirs(storeDir)
    val prevUpTo = prev.map(_.upTo).getOrElse(Long.MinValue)
    // the marker may only cover COMMITTED batches (review r17): a
    // crashed mid-write dir (no _SUCCESS) will be REPLAYED by the
    // stream — covering it would exclude the replayed rows from
    // serving and the cleanup would delete them; left uncovered, the
    // replay overwrites the torn dir and the next pass absorbs it
    val m = (batches.collect { case (id, f) if dataBearing(f) => id } ++
      prev.map(_.upTo)).maxOption.getOrElse(return)
    val floor = retainRawFor match {
      case None => prev.map(_.floor).getOrElse(NoFloor)
      case Some(w) =>
        require(w >= 0, s"retention window must be nonnegative, got $w")
        // only fold-covered buckets are droppable, and only from a
        // boundary-clean store (see the scaladoc) — a store with no 1h
        // fold yet retains everything
        val fold1h = readMarker(s"$storeDir/fold_3600s", "_horizon")
        require(RollupMaintainStream.edgeCount(storeDir).contains(0L),
          s"$storeDir is not boundary-clean; retention refused")
        math.max(prev.map(_.floor).getOrElse(NoFloor),
          fold1h.map(_ - w).getOrElse(NoFloor))
    }
    val target = CompactState(m, floor, prev.map(_.gen).getOrElse(0L))
    if (!prev.contains(target)) {
      val inputs =
        prev.map(c => compactDir(storeDir, c)).filter(dataBearing).toSeq ++
          batches.collect { case (id, f)
            if id > prevUpTo && id <= m && dataBearing(f) => f }
      if (inputs.nonEmpty) {
        val rows = s.read.parquet(inputs.map(_.getPath): _*)
        val kept =
          if (floor == NoFloor) rows else rows.filter(col("bucket") >= floor)
        // bucket-range layout: serving range-prunes on bucket, and the
        // fold increments read [prev, closed) slices
        kept.repartitionByRange(
            math.max(1, s.sparkContext.defaultParallelism / 8), col("bucket"))
          .sortWithinPartitions("bucket", "event_type", "user_id")
          .write.mode("overwrite")
          .parquet(compactDir(storeDir, target).getPath)
      }
      writeMarker(storeDir, "_compact",
        s"${target.upTo} ${target.floor} ${target.gen}")
    }
    // cleanup (idempotent, after the marker): superseded batch dirs and
    // any compact dir not named by the committed marker
    val cur = state(storeDir).get
    batches.collect { case (id, f) if id <= cur.upTo => f }
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    Option(compactRoot(storeDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName != cur.dirName)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }

  /** Merge the fold level's chain dirs in [_cons, q) into one
    * write-once dir, where q is the largest chunk-aligned chain-dir
    * end above the marker (a day/week boundary some increment closed
    * at). Skips when fewer than `minMerge` dirs would merge — small
    * tails wait for more increments rather than rewriting per pass.
    */
  private def consolidateLevel(s: SparkSession, storeDir: String, r: Long,
                               chunkSec: Long, minMerge: Int = 4): Unit = {
    for ((incs, h) <- RollupMaintainStream.foldedLevel(storeDir, r)) {
      val dir = new File(storeDir, s"fold_${r}s")
      val cons = readMarker(dir.getPath, "_cons").getOrElse(Long.MinValue)
      val chain = incs.flatMap(p => parseInc(new File(p)))
      // superseded garbage: marker-covered dirs the greedy chain
      // rejected (crash leftovers a prior cleanup never reached) — the
      // chain proves them redundant; dirs past the marker are the
      // writer's own in-flight recompute targets, left alone
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("inc_"))
        .flatMap(parseInc)
        .filter(d => d.b <= h && !incs.contains(d.path))
        .foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(
          new File(d.path)))
      val eligible = chain.filter(_.a >= cons)
      // chunk-aligned cut: increments end hour/day-aligned, so a day/
      // week boundary shows up as some dir's end once the horizon
      // crosses it; no aligned end yet → wait (never split a dir)
      val q = eligible.map(_.b).filter(b => b != Long.MinValue &&
        Math.floorMod(b, chunkSec) == 0L).maxOption.getOrElse(return)
      val merged = eligible.filter(_.b <= q)
      if (merged.size < minMerge) return
      val out = new File(dir, s"inc_${cons}_$q")
      // same-range rewrite (possible after a backfill repair bumped a
      // member's generation): bump this dir's generation so the greedy
      // chain serves the newest content
      val existingGen = chain.filter(d => d.a == cons && d.b == q)
        .map(_.g).maxOption
      val target = existingGen.fold(out)(g => new File(dir,
        s"inc_${cons}_${q}_g${g + 1}"))
      s.read.parquet(merged.map(_.path): _*)
        .repartitionByRange(
          math.max(1, s.sparkContext.defaultParallelism / 8), col("bucket"))
        .sortWithinPartitions("bucket", "event_type", "user_id")
        .write.mode("overwrite").parquet(target.getPath)
      writeMarker(dir.getPath, "_cons", q)
      merged.filter(_.path != target.getPath)
        .foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(
          new File(d.path)))
    }
  }
}
