package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BaseOrdering, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.{Column, DataFrame, GraftInterop}

/** Whole-operator top-k-per-key: logical node + strategy + two physical
  * operators (the prompt's preference (c) — a capability the built-in
  * operators can't express efficiently).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(…))
  * <= k`) shuffles EVERY row to its key's reducer and fully sorts each
  * key group — at 100 TB that is a full-data shuffle + sort to keep k
  * rows per key. This operator plans as:
  *
  *   TopKPerKeyPartial (per-partition bounded heaps, ≤ k rows/key emitted)
  *     → hash shuffle on keys (inserted by EnsureRequirements)
  *       → TopKPerKeyFinal (merge heaps, emit rank 1..k)
  *
  * so the shuffle carries at most partitions×keys×k rows — the same
  * partial-aggregation physics that makes groupBy scale, applied to
  * ranking. Semantics are identical to the window formulation when the
  * ordering is total (callers pass a unique tiebreak, as all graft
  * queries do).
  *
  * Memory: the partial stage holds min(keys-in-partition, key budget)
  * × k rows per task — rows for keys beyond
  * `spark.graft.topk.partialKeyBudget` pass through unpruned (still
  * correct, just un-prepruned), so partial memory is bounded at any
  * key cardinality. The final stage holds its shuffle partition's
  * keys × k, sized by spark.sql.shuffle.partitions as usual.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy — injected via GraftExtensions. */
object TopKPerKeyStrategy extends SparkStrategy {
  /** Cap on the partial stage's per-task heap map (distinct keys). The
    * map-side prune is an OPTIMIZATION — rows for keys beyond the
    * budget pass through unpruned and the final exec still ranks them
    * correctly — so this bounds partial-stage memory at
    * budget × k rows per task no matter the key cardinality. Default
    * 2^18 keys ≈ tens of MB at typical row widths; found by the 100x
    * soak, where 32 concurrent tasks × an unbounded doc-keyed map
    * OOMed a shared local heap.
    */
  val KeyBudgetConf = "spark.graft.topk.partialKeyBudget"
  val DefaultKeyBudget: Int = 1 << 18

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      val budget = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(KeyBudgetConf, DefaultKeyBudget.toString).toInt
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, budget, planLater(child))) :: Nil
    case _ => Nil
  }
}

private object TopKHeaps {
  /** Scan a partition into per-key bounded heaps (head = current worst). */
  def build(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      inputSchema: Seq[Attribute])
      : (java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]], BaseOrdering) = {
    val keyProj = UnsafeProjection.create(keys, inputSchema)
    val ord = RowOrdering.create(order, inputSchema)
    val reversed = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var q = heaps.get(key)
      if (q == null) {
        q = new java.util.PriorityQueue[InternalRow](k + 1, reversed)
        heaps.put(key.copy(), q)
      }
      if (q.size < k) q.offer(row.copy())
      else if (ord.compare(row, q.peek) < 0) { q.poll(); q.offer(row.copy()) }
    }
    (heaps, ord)
  }
}

/** Map-side prune: emits each partition's per-key top-k candidates.
  * No distribution requirement — runs before the shuffle.
  */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    keyBudget: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    // capture ONLY what the task needs — closing over `this` would drag
    // the whole physical (and tag-linked logical) plan into the closure
    val (ks, ord0, kk, schema, budget) = (keys, order, k, child.output, keyBudget)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(ks, schema)
      val ord = RowOrdering.create(ord0, schema)
      val reversed = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // rows for keys beyond the budget stream through UNPRUNED — the
      // final exec ranks them the same either way; the budget only
      // trades shuffle volume for bounded task memory
      val passThrough = iter.flatMap { row =>
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null && heaps.size() < budget) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, reversed)
          heaps.put(key.copy(), q)
        }
        if (q == null) Iterator.single(row) // emitted before next() — no copy needed
        else {
          if (q.size < kk) q.offer(row.copy())
          else if (ord.compare(row, q.peek) < 0) { q.poll(); q.offer(row.copy()) }
          Iterator.empty
        }
      }
      // `++` is by-name: the heap flush runs only after the input is
      // fully consumed, so the map is final when it is iterated
      passThrough ++ heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce side: requires clustering on the keys (EnsureRequirements
  * inserts the hash exchange), merges the candidate heaps, emits each
  * key's rows ranked 1..k.
  */
case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, so, kk, schema, out, rank) =
      (keys, order, k, child.output, output, rankAttr)
    child.execute().mapPartitions({ iter =>
      val (heaps, ord) = TopKHeaps.build(iter, ks, so, kk, schema)
      val proj = UnsafeProjection.create(out, schema :+ rank)
      val joined = new JoinedRow()
      val rankRow = new GenericInternalRow(1)
      heaps.values().asScala.iterator.flatMap { q =>
        val rows = q.iterator().asScala.toArray
        java.util.Arrays.sort(rows, ord)
        rows.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          proj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** DataFrame-level API. */
object TopK {
  /** Top `k` rows per `keys` group in `orderBy` order, with a 1-based
    * rank column appended — same result as
    * `row_number().over(Window.partitionBy(keys).orderBy(orderBy)) <= k`
    * but with map-side pruning. Pass a total ordering (unique tiebreak)
    * for deterministic results.
    */
  def perKey(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column], k: Int,
             rankName: String = "rnk"): DataFrame = {
    // fail fast with an actionable message — without the strategy the
    // planner dies later with an opaque INTERNAL_ERROR
    require(GraftInterop.hasStrategy(df.sparkSession, TopKPerKeyStrategy),
      "TopKPerKeyStrategy is not registered in this session; activate it " +
        "with spark.sql.extensions=graft.GraftExtensions")
    // eager conversion: these expressions go into a custom logical node
    // (no Dataset-API builder to unwrap the lazy ColumnNodeExpression)
    val sortOrders = orderBy.map(c => GraftInterop.eagerExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftInterop.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(GraftInterop.eagerExpression), sortOrders, k,
        AttributeReference(rankName, IntegerType, nullable = false)(),
        df.queryExecution.analyzed))
  }
}
