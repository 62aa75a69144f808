package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftInterop
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.Tables

/** Misra–Gries frequent-items sketch (Misra & Gries 1982) as a native
  * Catalyst [[TypedImperativeAggregate]] — k counters of bounded state,
  * mergeable map-side partials (Agarwal et al. 2012, "Mergeable
  * Summaries": the merged sketch keeps the n/(k+1) error bound), so the
  * candidate pass over 100 TB ships k-row summaries, never a
  * per-distinct-value shuffle.
  *
  * Guarantee (what the spec proves): every value with true count
  * > n/(k+1) is among the k candidates, and each surviving counter is a
  * lower bound within n/(k+1) of the true count — under ANY input order
  * and ANY partitioning of the merge tree.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < k =>
          // clone: the UTF8String points into a reused row buffer
          buf.update(key.clone(), 1L)
        case None =>
          // classic decrement-all step: every counter pays one unit for
          // the unmatched arrival; zeros drop (O(k), amortized O(1))
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { kk =>
            val c = buf(kk) - 1L
            if (c == 0L) dead += kk else buf.update(kk, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (kk, c) =>
      buf.update(kk, buf.getOrElse(kk, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0 —
      // the mergeable-summaries reduction back to k counters
      val cut = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { kk =>
        val c = buf(kk) - cut
        if (c <= 0L) dead += kk else buf.update(kk, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (kk, _) => kk }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) =>
      val b = kk.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries"
}

/** Exact heavy hitters at scale: Misra–Gries candidates (one pass,
  * k-bounded state, mergeable partials) + an exact recount of the
  * candidate set only (broadcast IN-filter — the second pass groups at
  * most k distinct keys). The final output is EXACT and independent of
  * every MG internal: the sketch only has to not miss a true heavy
  * hitter, which its n/(k+1) bound guarantees by construction — that is
  * what makes a sketch-fronted plan oracle-checkable against plain
  * GROUP BY/HAVING SQL.
  */
object HeavyHitters {

  /** k = 127 counters ⇒ no value with count > n/128 is ever missed —
    * strictly finer than the emitted n/100 threshold.
    */
  val SketchK = 127
  val ThreshDen = 100L

  def mgSketch(c: Column, k: Int = SketchK): Column =
    GraftInterop.column(
      MisraGries(GraftInterop.expression(c), k).toAggregateExpression())

  /** The Misra–Gries update step on a String-keyed map — the same
    * decrement-all semantics as [[MisraGries.update]] (which runs on
    * UTF8String keys inside the Catalyst aggregate); shared by the
    * streaming maintainer so the two paths cannot drift.
    */
  private[graft] def mgUpdate(buf: mutable.HashMap[String, Long],
                              w: String, k: Int): Unit =
    buf.get(w) match {
      case Some(c) => buf.update(w, c + 1L)
      case None if buf.size < k => buf.update(w, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { kk =>
          val c = buf(kk) - 1L
          if (c == 0L) dead += kk else buf.update(kk, c)
        }
        dead.foreach(buf.remove)
    }

  /** Corpus-level heavy-hitter words: every word with count·100 > total
    * tokens (threshold comparison in exact integers — no division).
    */
  def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
    val sk = toks.agg(mgSketch(col("w")).as("mg"), count(lit(1)).as("n")).head()
    // driver holds k counters and one total — sketch-bounded, never
    // corpus-bounded
    val candidates = sk.getMap[String, Long](0).keys.toSeq
    val n = sk.getAs[Long]("n")
    if (candidates.isEmpty)
      return toks.select(col("w"), lit(0L).as("c")).limit(0)
    toks.filter(col("w").isin(candidates: _*))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") * lit(ThreshDen) > lit(n))
  }
}
