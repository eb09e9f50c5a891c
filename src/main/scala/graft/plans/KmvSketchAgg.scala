package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-minimum-values set sketch: the k lexicographically smallest
  * DISTINCT values seen. Mergeable (union of two sketches re-truncated to
  * k is the sketch of the union — the KMV property), so partial aggregates
  * combine without raw-value shuffles.
  */
final class KmvBuffer(val k: Int) {
  val items: java.util.TreeSet[String] = new java.util.TreeSet[String]()

  def add(item: String): Unit = {
    if (items.size < k) { items.add(item); () }
    else if (item.compareTo(items.last) < 0 && items.add(item)) {
      items.pollLast(); ()
    }
  }

  def merge(other: KmvBuffer): Unit = other.items.forEach(add(_))
}

/** `kmv_sketch(col, k)` — per-group KMV set sketch as a Catalyst
  * `TypedImperativeAggregate` (same posture as [[HeavyHittersAgg]]):
  * bounded to k strings per buffer at every stage, partials merge by set
  * union + truncate. Feed it a UNIFORM key (md5/sha hex of the raw value)
  * — with uniform keys the sketch supports distinct-count and set-overlap
  * estimation; see [[KmvSketchAgg.jaccardEstimate]].
  *
  * Output: ascending `array<string>` of the k smallest distinct keys.
  * Use case: per-domain/language vocabulary sketches -> pairwise corpus
  * similarity matrices WITHOUT any pairwise raw-data join — each group is
  * reduced to k hashes first (the Bar-Yossef et al. 2002 estimator,
  * corpus-pair form of [[graft.operators.Dedup.corpusOverlapSketch]]).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 0, "kmv_sketch needs k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Any](buf.items.size)
    val it = buf.items.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.items.size)
    buf.items.forEach(out.writeUTF(_))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { b.items.add(in.readUTF()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
}

object KmvSketchAgg {
  /** Column API: `kmv_sketch(col, k)`. */
  def kmvSketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketchAgg(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** SQL surface: `kmv_sketch(col, k)` with a literal k. */
  private[plans] lazy val sqlEntry: AggRegistration.Entry = AggRegistration.entry("kmv_sketch",
    "_FUNC_(col, k) - k-minimum-values set sketch (sorted array of the k " +
      "smallest distinct values); feed a uniform hash for estimation") {
    (child, k) => KmvSketchAgg(child, k)
  }

  /** Jaccard estimate from two KMV sketches built with the same k: take
    * the k smallest of the union, count how many live in BOTH sketches,
    * divide. Pure array HOFs — SQL-mirrorable, no UDF.
    */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val union = slice(array_sort(array_union(a, b)), 1, k)
    val inBoth = array_intersect(union, array_intersect(a, b))
    when(size(union) === 0, lit(0.0))
      .otherwise(round(size(inBoth).cast("double") / size(union), 6))
  }
}
