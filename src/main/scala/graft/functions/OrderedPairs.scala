package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst [[Generator]] emitting every ordered pair (i < j) of a
  * sorted `array<struct<id long, n long>>` posting list as a flat
  * (id1, n1, id2, n2) row — the Σ df² pair stream of the inverted-index
  * near-dup join (DedupOps.ngramJaccardPairs), lazily.
  *
  * Why not posexplode + slice + explode (the previous formulation): the
  * first projection materializes the FULL posting array into every
  * exploded row (df rows × df-element array ≈ O(df²·df) bytes through the
  * exchange-free pipeline for a document frequency df), and each `slice`
  * then allocates an O(df) copy per element — GC churn that dominated the
  * 10× stress timings of the whole ngram family and produced its ±40%
  * run-to-run variance. This generator decodes the posting list ONCE into
  * two primitive long arrays and yields fixed-width 4-long rows, so the
  * per-shingle allocation is O(df) and per-pair work is four long reads.
  *
  * The reference computes near-dup pairs row-at-a-time in Python
  * (conceptually; its corpus fits one process). At 100 TB the pair stream
  * is the single largest intermediate of the dedup pipeline, which is why
  * it deserves a dedicated kernel rather than composed explodes.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "ordered_pairs"

  override def elementSchema: StructType = StructType(Seq(
    StructField("id1", LongType, nullable = false),
    StructField("n1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false),
    StructField("n2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs requires array<struct<long,long>>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    // decode once: primitive arrays, no per-pair struct access
    val ids = new Array[Long](n)
    val ns = new Array[Long](n)
    var k = 0
    while (k < n) {
      val st = arr.getStruct(k, 2)
      ids(k) = st.getLong(0)
      ns(k) = st.getLong(1)
      k += 1
    }
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](ids(i), ns(i), ids(j), ns(j)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  /** Column-API entry point; yields 4 columns — alias with
    * `.as(Seq("id1","n1","id2","n2"))` at the call site. */
  def ordered_pairs(c: Column): Column =
    ColumnBridge.column(OrderedPairs(ColumnBridge.expression(c)))
}
