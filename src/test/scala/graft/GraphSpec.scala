package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph
import SparkFixture.{sf, spark}

class GraphSpec extends AnyFunSuite {

  test("pagerank equals a driver-side exact-integer reference loop") {
    val edges = Graph.tradeEdges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(edges.nonEmpty)
    assert(edges.toSet.size === edges.length, "edge set must be distinct")
    val nations = Tables.nation(spark, sf).collect()
      .map(r => (r.getAs[Int]("n_nationkey"), r.getAs[String]("n_name")))
    val nodes = nations.map(_._1)
    val nV = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val base = (15L * Graph.Scale) / (100L * nV)
    var r = nodes.map(_ -> Graph.Scale / nV).toMap
    for (_ <- 1 to Graph.Iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v =>
        v -> (base + (Graph.DampingNum * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    val byName = nations.map { case (k, n) => (n, r(k)) }.toMap
    val got = Graph.pagerank(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(got.length === nV)
    got.foreach { case (name, scaled, rank) =>
      assert(scaled === byName(name), s"nation $name")
      assert(rank === scaled.toDouble / 1.0e12)
    }
  }

  test("pagerank mass bounds: every rank >= teleport base, total <= Scale") {
    val ranks = Graph.pagerank(spark, sf).collect().map(_.getLong(1))
    val nV = ranks.length.toLong
    val base = (15L * Graph.Scale) / (100L * nV)
    assert(ranks.forall(_ >= base), "teleport term is a floor for every node")
    // floor division + dropped dangling mass only LOSE mass
    assert(ranks.sum <= Graph.Scale)
    // and the damping loop keeps a nontrivial fraction of it
    assert(ranks.sum >= Graph.Scale / 2)
  }
}
