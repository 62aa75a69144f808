package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import SparkFixture.{sf, spark}

import graft.sources.SnapshotStore

/** Snapshot-manifest time travel: every version reconstructs its exact
  * row set; the delete commit is metadata-only where the partition
  * value wholly matches (files survive on disk), copy-on-write only
  * where it partially matches, and by-reference everywhere else.
  */
class SnapshotStoreSpec extends AnyFunSuite {

  private def key(r: org.apache.spark.sql.Row) = r.getLong(0)

  test("as-of reads reconstruct each version exactly") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val del = col("event_type") === "error" ||
      (col("event_type") === "signup" && col("user_id") % 3 === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(key).sorted.toSeq

    assert(SnapshotStore.versions(spark, sf) === Seq(1, 2, 3))
    assert(ids(SnapshotStore.readAt(spark, sf, 1)) ===
      ids(ev.filter(col("event_id") % 2 === 0)))
    assert(ids(SnapshotStore.readAt(spark, sf, 2)) === ids(ev))
    assert(ids(SnapshotStore.readAt(spark, sf, 3)) ===
      ids(ev.filter(!del)))
    // the delete really removed something at v3, and v1/v2 still see it
    val v3 = SnapshotStore.readAt(spark, sf, 3)
    assert(v3.filter(col("event_type") === "error").count() === 0)
    assert(SnapshotStore.readAt(spark, sf, 2)
      .filter(col("event_type") === "error").count() > 0)
  }

  test("delete is metadata-only / COW / by-reference per partition value") {
    val m2 = SnapshotStore.manifest(spark, sf, 2)
    val m3 = SnapshotStore.manifest(spark, sf, 3)
    // error groups: dropped from the manifest, files untouched on disk
    val errGroups = m2.filter(_.endsWith("_error"))
    assert(errGroups.nonEmpty && errGroups.forall(g => !m3.contains(g)))
    // (v1/v2 reads above prove the dropped files still exist and decode)
    // signup groups: rewritten (new COW paths), originals not in m3
    val sgn3 = m3.filter(_.endsWith("_signup"))
    assert(sgn3.nonEmpty && sgn3.forall(_.contains("v3r_")))
    // every other group is carried BY REFERENCE — byte-identical path
    val others2 = m2.filterNot(g =>
      g.endsWith("_error") || g.endsWith("_signup"))
    assert(others2.nonEmpty && others2.forall(m3.contains))
  }

  test("as-of v3 plans only manifest files — dropped groups never read") {
    val files = SnapshotStore.readAt(spark, sf, 3)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(!files.exists(f => f.contains("_error")),
      "a metadata-deleted group was read at v3")
    assert(!files.exists(f => f.contains("/v1_signup") ||
      f.contains("/v2_signup")), "a pre-COW signup file was read at v3")
  }

  test("changesBetween: manifest-diff CDF reads only touched groups") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val del = col("event_type") === "error" ||
      (col("event_type") === "signup" && col("user_id") % 3 === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(key).sorted.toSeq
    // v1→v2: pure inserts — exactly the odd generation
    val c12 = SnapshotStore.changesBetween(spark, sf, 1, 2)
    assert(c12.filter(col("change_type") =!= "insert").count() === 0)
    assert(ids(c12) === ids(ev.filter(col("event_id") % 2 === 1)))
    // v2→v3: pure deletes — exactly the predicate rows; COW-carried
    // signup rows appear in NEITHER change set
    val c23 = SnapshotStore.changesBetween(spark, sf, 2, 3)
    assert(c23.filter(col("change_type") =!= "delete").count() === 0)
    assert(ids(c23) === ids(ev.filter(del)))
    // O(changed files): the manifest diff touches only error/signup
    // groups and their COW rewrites — and the executed plan scans no
    // untouched group (carried click/view/purchase groups absent)
    val m2 = SnapshotStore.manifest(spark, sf, 2).toSet
    val m3 = SnapshotStore.manifest(spark, sf, 3).toSet
    val touched = (m2 diff m3) union (m3 diff m2)
    assert(touched.nonEmpty && touched.forall(g =>
      g.contains("_error") || g.contains("_signup")),
      s"untouched group in the diff: ${touched.mkString(", ")}")
    val plan = c23.queryExecution.executedPlan.toString
    Seq("_click", "_view", "_purchase").foreach(t =>
      assert(!plan.contains(t), s"untouched $t group scanned:\n$plan"))
  }

  test("pushdown and pruning survive the manifest read") {
    val plan = SnapshotStore.readAt(spark, sf, 3)
      .filter(col("user_id") === 7L).select("event_id", "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"pushdown must survive the manifest read:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,user_id:bigint>"),
      s"column pruning must survive the manifest read:\n$plan")
  }
}
