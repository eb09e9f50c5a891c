package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries (frequent-items) summary: at most `capacity` tracked items.
  * For a stream of n items, any item with true count > n/ (capacity+1) is
  * guaranteed present, and each reported count undercounts the truth by at
  * most the summary's `error` bound. Merging two summaries preserves the
  * combined bound — the standard distributed heavy-hitters sketch.
  */
final class MgSummary(val capacity: Int) {
  val counts: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty
  var error: Long = 0L

  def add(item: String, weight: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None if counts.size < capacity => counts.update(item, weight)
      case None =>
        // decrement all by the min needed to open a slot (batched MG step)
        val dec = math.min(weight, counts.values.min)
        error += dec
        val dead = mutable.ArrayBuffer[String]()
        counts.mapValuesInPlace((_, c) => c - dec)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
        if (weight > dec) add(item, weight - dec)
    }
  }

  def merge(other: MgSummary): Unit = {
    error += other.error
    other.counts.foreach { case (k, c) => add(k, c) }
  }
}

/** `approx_top_items(col, capacity)` — bounded-memory frequent items over a
  * string column, as a Catalyst `TypedImperativeAggregate`: per-partition
  * MG summaries, merged on the driver/reducer side, no shuffle of raw
  * values beyond the fixed-size summary. Output:
  * `map<string, bigint>` of surviving items -> lower-bound counts, ordered
  * by the summary; consumers filter by count threshold.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "approx_top_items"

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: MgSummary): Any = {
    val items = buf.counts.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(items.map(i => UTF8String.fromString(i._1)).toArray[Any]),
      new GenericArrayData(items.map(_._2).toArray[Any]))
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeLong(buf.error)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSummary(in.readInt())
    s.error = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { s.counts.update(in.readUTF(), in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = c.head)
}

object HeavyHittersAgg {
  /** Column API: `approx_top_items(col, capacity)`. */
  def approxTopItems(c: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      HeavyHittersAgg(GraftSqlBridge.expression(c), capacity).toAggregateExpression())

  /** SQL surface: `approx_top_items(col, capacity)` with a literal capacity. */
  private[plans] lazy val sqlEntry: AggRegistration.Entry = AggRegistration.entry("approx_top_items",
    "_FUNC_(col, capacity) - Misra-Gries frequent items: map of item -> " +
      "lower-bound count, at most `capacity` tracked") {
    (child, cap) => HeavyHittersAgg(child, cap)
  }
}
