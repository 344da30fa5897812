package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982, "Finding
  * repeated elements"; merge rule from Agarwal et al. 2012, "Mergeable
  * summaries").
  *
  * At most `k` counters. Guarantee after any sequence of adds and
  * merges over a stream of `n` items: for every item,
  * `true_count - n/(k+1) <= estimate <= true_count`, and therefore
  * every item with `true_count > n/(k+1)` is PRESENT in the summary.
  * The estimates themselves depend on arrival/merge order (so they are
  * not portable values), but the membership guarantee is order- and
  * partitioning-independent — that is the invariant the driver oracle
  * gates on (sketch candidates confirmed against exact counts).
  *
  * The 100 TB role: the exact per-key census (`groupBy(key).count`)
  * shuffles every distinct key; this summary is a constant-size
  * partial aggregate — map-side partials merge into one k-entry map,
  * the same upgrade path HLL provides for COUNT(DISTINCT).
  */
final class MisraGriesSummary(val k: Int) extends Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  /** item -> lower-bound estimate; at most k entries between ops. */
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Total weight of decrements applied so far (the error bound
    * actually incurred: estimate >= true - decremented). */
  var decremented: Long = 0L

  def add(item: String, weight: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None =>
        counts.update(item, weight)
        if (counts.size > k) shrink()
    }
  }

  /** Drop the (k+1)-th largest count `d` from every counter and remove
    * the non-positive ones — the mergeable-summaries generalization of
    * the classic decrement-all-by-one step. Each unit removed from a
    * surviving counter is matched by k other counters losing the same
    * unit, so total decrement stays <= n/(k+1).
    */
  private def shrink(): Unit = {
    if (counts.size <= k) return
    val vals = counts.values.toArray
    java.util.Arrays.sort(vals)
    val d = vals(vals.length - (k + 1)) // (k+1)-th largest
    if (d <= 0L) return
    decremented += d
    val dead = mutable.ArrayBuffer.empty[String]
    counts.mapValuesInPlace((_, c) => c - d)
    counts.foreach { case (item, c) => if (c <= 0L) dead += item }
    dead.foreach(counts.remove)
  }

  def mergeWith(other: MisraGriesSummary): MisraGriesSummary = {
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    decremented += other.decremented
    if (counts.size > k) shrink()
    this
  }
}

/** `graft_mg_topk(item, k)` — Misra–Gries heavy-hitters aggregate as a
  * native `TypedImperativeAggregate` (the same machinery Spark's own
  * approx_percentile / hll sketches use): a k-counter map buffer that
  * partial-aggregates map-side and merges between partitions, so the
  * shuffle carries one small binary blob per partition instead of one
  * row per distinct key.
  *
  * Returns `map<string, bigint>` of surviving items and their
  * lower-bound estimates. Estimates are order-dependent; membership of
  * every item with frequency > n/(k+1) is guaranteed regardless of
  * partitioning (MisraGriesSpec pins both properties).
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSummary]
  with UnaryLike[Expression] {

  require(k >= 1, s"graft_mg_topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg_topk expects a string item column, got $other")
  }
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_topk"

  override def createAggregationBuffer(): MisraGriesSummary = new MisraGriesSummary(k)

  override def update(buf: MisraGriesSummary, input: InternalRow): MisraGriesSummary = {
    val v = child.eval(input)
    // Null items are skipped, matching count()/count_distinct() of a
    // null key rather than inventing a sentinel bucket.
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MisraGriesSummary, other: MisraGriesSummary): MisraGriesSummary =
    buf.mergeWith(other)

  override def eval(buf: MisraGriesSummary): Any = {
    // Deterministic key order inside the map value (sorted by item) so
    // a collected result prints stably; consumers explode it anyway.
    val items = buf.counts.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(items.map(p => UTF8String.fromString(p._1)): Array[Any]),
      new GenericArrayData(items.map(p => java.lang.Long.valueOf(p._2)): Array[Any]))
  }

  override def serialize(buf: MisraGriesSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.decremented)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val summary = new MisraGriesSummary(in.readInt())
    summary.decremented = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      summary.counts.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    summary
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

object MisraGriesTopK {
  val info = new ExpressionInfo(classOf[MisraGriesTopK].getName, "graft_mg_topk")

  def builder(exprs: Seq[Expression]): Expression =
    MisraGriesTopK(exprs(0), GraftFunctionBuilders.intLit(exprs(1), "k"))
      .toAggregateExpression()
}
