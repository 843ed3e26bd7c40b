package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Compact top-k buffer: parallel primitive arrays, no per-row boxing
  * beyond the Expression.eval contract. Trims to the k best by
  * (cos desc, dst asc) when full — capacity is sized so the trim
  * amortizes to O(1) comparisons per add. */
final class TopKEdgesBuf(val k: Int) {
  val cap: Int = math.max(4 * k, 256)
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](cap)
  val cs: Array[Double] = new Array[Double](cap)

  def add(id: Long, c: Double): Unit = {
    ids(n) = id; cs(n) = c; n += 1
    if (n == cap) trim()
  }

  /** Keep the k best DISTINCT entries by (cos desc, dst asc), sorted in
    * place. Adjacent entries with identical (cos, dst) bits collapse to
    * one — the reverse harvest's second orientation of a pair arrives
    * bit-identical (IEEE multiply is commutative), so deduping inside
    * the buffer replaces the corpus-wide `distinct()` shuffle the edge
    * builders used to pay purely to drop it (VERDICT r16 #6). A
    * duplicate can never displace the true k-th candidate: dedup runs
    * BEFORE the k cut. */
  def trim(): Unit = if (n > 1) {
    val order = Array.range(0, n).sortBy(i => (-cs(i), ids(i)))
    val tIds = new Array[Long](math.min(k, n))
    val tCs = new Array[Double](tIds.length)
    var out = 0; var i = 0
    while (i < n && out < k) {
      val j = order(i)
      // BIT equality, not ==: a NaN cosine (zero-norm vector) arrives
      // with identical bits in both orientations, and == would keep
      // both copies where the replaced distinct() collapsed them
      if (out == 0 || tIds(out - 1) != ids(j) ||
          java.lang.Double.doubleToRawLongBits(tCs(out - 1)) !=
            java.lang.Double.doubleToRawLongBits(cs(j))) {
        tIds(out) = ids(j); tCs(out) = cs(j); out += 1
      }
      i += 1
    }
    System.arraycopy(tIds, 0, ids, 0, out)
    System.arraycopy(tCs, 0, cs, 0, out)
    n = out
  }
}

/** Bounded top-k-by-(cos desc, dst asc) as a NATIVE Spark aggregate —
  * the map-side partial top-k the kNN edge builders need, expressed
  * where Spark's aggregation machinery can run it: each task's hash
  * aggregate folds its rows into a per-group primitive-array buffer,
  * the PARTIAL buffer serializes only its top-k (nothing outside a
  * partial top-k can enter the global top-k), and the final merge +
  * eval emit exactly the group's k best. Replaces the row_number
  * ranking window that shuffled the FULL candidate volume (VERDICT
  * r15 #2a: full-probe IVF at 2k vectors pushed 4M rows into one
  * window — measured 6.9 s vs the exact builder's 1.87 s), and a
  * typed-Dataset mapPartitions alternative whose per-row encoder
  * round-trip cost ~2 s on the same 4M rows.
  *
  * Exact for any grouping/partitioning: top-k selection under a TOTAL
  * order (cos desc, dst asc — dst distinct within a group) is
  * decomposable. Buffer is O(max(4k, 256)) primitives per group per
  * task; shuffle carries ≤ k entries per (group, task).
  *
  * Bit-identical (cos, dst) duplicates dedup inside the buffer
  * (VERDICT r16 #6): the IVF builders' reverse harvest emits a pair in
  * both orientations with identical bits, and the dedup here replaces
  * the full `distinct()` shuffle of the candidate volume they used to
  * need before ranking. Rows with the same dst but different cos are
  * NOT merged (same as distinct()'s whole-row semantics).
  *
  * Output: array<struct<dst: long, cos_sim: double>> — the group's k
  * best distinct entries, sorted (cos desc, dst asc).
  */
case class TopKEdges(dst: Expression, cos: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKEdgesBuf] {

  override def children: Seq[Expression] = Seq(dst, cos)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dst", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKEdgesBuf = new TopKEdgesBuf(k)

  override def update(b: TopKEdgesBuf, input: InternalRow): TopKEdgesBuf = {
    val d = dst.eval(input)
    val c = cos.eval(input)
    if (d != null && c != null)
      b.add(d.asInstanceOf[Long], c.asInstanceOf[Double])
    b
  }

  override def merge(a: TopKEdgesBuf, b: TopKEdgesBuf): TopKEdgesBuf = {
    var i = 0
    while (i < b.n) { a.add(b.ids(i), b.cs(i)); i += 1 }
    a
  }

  override def eval(b: TopKEdgesBuf): Any = {
    b.trim() // sorts (cos desc, dst asc), dedups, cuts to k — in place
    new GenericArrayData(Array.tabulate[Any](b.n)(i =>
      InternalRow(b.ids(i), b.cs(i))))
  }

  override def serialize(b: TopKEdgesBuf): Array[Byte] = {
    b.trim() // partial top-k suffices for the global top-k
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.cs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKEdgesBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKEdgesBuf(k)
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getDouble); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKEdges =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKEdges =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKEdges =
    copy(dst = newChildren(0), cos = newChildren(1))
}
