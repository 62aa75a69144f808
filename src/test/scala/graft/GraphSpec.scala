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

  test("triangleCount equals a driver-side brute-force recount") {
    val edges = Graph.basketEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    assert(edges.forall { case (x, y) => x < y }, "canonical pair order")
    assert(edges.toSet.size === edges.length, "edge set must be distinct")
    val es = edges.toSet
    val nbr = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    // brute force: for every edge, common neighbors ABOVE the higher
    // endpoint close a triangle exactly once
    val triPerNode = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0L
    for ((x, y) <- edges; z <- nbr(x) intersect nbr(y); if z > y) {
      total += 1
      triPerNode(x) += 1; triPerNode(y) += 1; triPerNode(z) += 1
    }
    val got = Graph.triangleCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.sum === 3 * total, "each triangle touches 3 nodes")
    assert(got === triPerNode.toMap)
    assert(es.nonEmpty && total > 0, "corpus must exercise the operator")
  }

  test("harmonic equals a driver-side BFS reference and keeps the quartile cut") {
    val keep = Graph.strongTradeEdges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(keep.nonEmpty)
    // the cut keeps strictly less than a third of the undirected edges
    // (quartile cut ⇒ n - ceil(0.75 n) ≤ n/4)
    val nAll = {
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      import org.apache.spark.sql.functions._
      li.join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") =!= col("s_nationkey"))
        .select(least(col("c_nationkey"), col("s_nationkey")),
          greatest(col("c_nationkey"), col("s_nationkey")))
        .distinct().count()
    }
    assert(keep.length <= nAll / 4)
    // BFS reference over the kept graph
    val nations = Tables.nation(spark, sf).collect()
      .map(r => (r.getAs[Int]("n_nationkey"), r.getAs[String]("n_name")))
    val adj = (keep ++ keep.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    def bfs(src: Int): Map[Int, Int] = {
      var dist = Map(src -> 0)
      var frontier = List(src)
      for (d <- 1 to Graph.HarmonicRadius) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Array.empty[Int]))
          .filterNot(n => dist.contains(n)).distinct
        dist ++= next.map(_ -> d)
        frontier = next
      }
      dist
    }
    val want = nations.map { case (v, name) =>
      val h = nations.flatMap { case (u, _) =>
        if (u == v) None else bfs(u).get(v)
      }.map(d => Graph.Scale / d).sum
      name -> h
    }.toMap
    val got = Graph.harmonic(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === nations.length)
    got.foreach { case (name, scaled, h) =>
      assert(scaled === want(name), s"nation $name")
      assert(h === scaled.toDouble / 1.0e12)
    }
    // the truncated-radius graph must show distance variety (a complete
    // graph would make every centrality identical — degenerate fixture)
    assert(got.map(_._2).distinct.length > 1)
  }

  test("harmonicBall (HyperBall iteration, exact masks) equals BFS harmonic") {
    val bfs = Graph.harmonic(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val ball = Graph.harmonicBall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(ball === bfs,
      "the incremental ball accrual must reproduce the min-plus BFS sum")
  }

  test("components: labels are component minima; a union-find recount agrees") {
    import org.apache.spark.sql.functions._
    val got = Graph.components(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Graph.supportedEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // driver union-find reference
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.map { n =>
      val root = find(n)
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(got === want)
    // the threshold genuinely sparsifies: strictly fewer edges than raw
    assert(edges.length < Graph.basketEdges(spark, sf).count())
    // pointer jumping converges in logarithmic rounds
    val (_, rounds) = graft.pipeline.Dedup.clustersFromEdges(
      Graph.supportedEdges(spark, sf)
        .select(col("x").as("id1"), col("y").as("id2")))
    assert(rounds <= 8, s"pointer jumping took $rounds rounds")
  }

  test("kcore: fixed point matches a driver-side sequential peel") {
    val got = Graph.kcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the mutual edge set from the knn graph, then peel ONE
    // node at a time (Batagelj-Zaveršnik order) — k-core is confluent,
    // so the synchronous distributed peel must reach the same core
    val dir = graft.pipeline.Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = dir.filter { case (a, b) => a < b && dir.contains((b, a)) }
      .toArray
    var live = edges
    var changed = true
    while (changed) {
      val deg = live.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, o) => n -> o.length }
      val doomed = deg.collectFirst {
        case (n, d) if d < Graph.KcoreK => n
      }
      doomed match {
        case Some(n) => live = live.filter(e => e._1 != n && e._2 != n)
        case None    => changed = false
      }
    }
    val want = live.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, o) => n -> o.length.toLong }
    assert(got === want)
    // non-degenerate at the fixture corpus: the peel removed
    // something and kept something
    assert(got.nonEmpty)
    assert(got.size < edges.flatMap(e => Seq(e._1, e._2)).distinct.length)
    // every survivor honors the core invariant
    assert(got.values.forall(_ >= Graph.KcoreK))
  }

  test("labelProp replays a driver-side synchronous reference exactly") {
    val got = Graph.labelProp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Graph.supportedEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = e ++ e.map(_.swap)
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LabelPropRounds) {
      lab = nbrs.map { case (n, ns) =>
        val counts = ns.map(lab).groupBy(identity).view
          .mapValues(_.length.toLong).toMap
        // (count DESC, label ASC) — the packed-key tie-break
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got === lab)
    // propagation actually coalesced labels: fewer distinct labels
    // than nodes after the rounds
    assert(got.values.toSet.size < got.size)
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
