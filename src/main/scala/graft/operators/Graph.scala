package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph ranking over a relation-derived edge set — the
  * domain/source ranking signal a crawl-curation stack keeps next to its
  * per-document scores (Common Crawl publishes exactly this: a
  * PageRank/harmonic-centrality ranking over the host graph that
  * curation mixes use to weight sources; beyond the reference's own
  * operator surface, like the rest of the pipeline family).
  *
  * The graph here is the nation-level trade graph the TPC-H-ish tables
  * imply: an edge customer-nation → supplier-nation for every distinct
  * trading pair observed in lineitem ⋈ orders ⋈ customer ⋈ supplier.
  *
  * Determinism contract — EXACT INTEGER PageRank: ranks are scaled by
  * 10¹² and every step is integer arithmetic (`div` floor division,
  * 64-bit sums), so a fixed iteration count yields bit-identical ranks
  * in any engine — no float accumulation order to pin. The DuckDB
  * oracle unrolls the same iterations as chained CTEs (recursive CTEs
  * forbid aggregation over the recursive term, and an unrolled chain is
  * deterministic by construction). Dangling mass (nations with no
  * out-edges) is dropped — the standard simplification; documented, and
  * identical in both engines.
  *
  * Scale shape: the edge list is built by the fact-table joins
  * (lineitem⋈orders co-partitioned on orderkey, then the customer /
  * supplier dimension joins) and collapsed to DISTINCT (src, dst) —
  * vertex²-bounded, cached once. Each iteration is one join of the
  * rank frame (|V| rows) into the cached edge frame + one partial-agg
  * shuffle on dst. With |V| ≪ |E| the rank side broadcasts (here the
  * optimizer does it automatically); at web scale the same loop
  * co-partitions edges by src once and shuffles only the |V|-sized
  * rank frame per iteration — never the edge list. Lineage is cut per
  * iteration with a localCheckpoint of the |V|-row rank frame (the
  * dedup_clusters pointer-jumping pattern).
  */
object Graph {

  val Scale = 1000000000000L // 10^12: integer rank scale
  val DampingNum = 85L       // damping 0.85 as the exact fraction 85/100
  val Iters = 10

  /** Distinct customer-nation → supplier-nation trade edges. */
  def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .distinct()
  }

  /** PageRank after `iters` exact-integer iterations:
    * (nation, rank_scaled, rank) — rank = rank_scaled / 10¹².
    */
  def pagerank(s: SparkSession, dir: String, iters: Int = Iters): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val edges = tradeEdges(s, dir)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — reused every iteration, cache once
    val e = edges.join(outdeg, "src").cache()
    val nations = Tables.nation(s, dir).select(col("n_nationkey").as("node"),
      col("n_name"))
    // |V| is dimension-table-bounded (25 nations) — a driver-side count
    // of metadata, not data
    val nV = nations.count()
    val base = (15L * Scale) / (100L * nV)
    var ranks = nations.select(col("node"), lit(Scale / nV).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      ranks = nations
        .join(contrib, nations("node") === contrib("dst"), "left")
        .select(nations("node"),
          (lit(base) +
            expr(s"(${DampingNum}L * coalesce(contrib, 0L)) div 100L")).as("r"))
        .localCheckpoint() // |V| rows: truncate the per-iteration lineage
    }
    ranks.join(nations, "node")
      .select(col("n_name").as("nation"), col("r").as("rank_scaled"),
        (col("r").cast("double") / lit(1.0e12)).as("rank"))
  }
}
