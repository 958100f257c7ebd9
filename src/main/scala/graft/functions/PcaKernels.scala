package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact first-moment aggregate: Σ_v sa(v) over scale-6 integer vectors
  * as a dim-cell long array — the companion to [[GramAggregate]]'s
  * second moments (together they assemble the covariance exactly, so
  * the PCA eigensolve starts from integers, not float accumulation
  * order). Same buffer/merge shape: one fixed-size array per task,
  * cell-wise merges, ~0.5 KB per exchange row. */
case class SumVector(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "sum_vector"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if dim <= 0 =>
      TypeCheckResult.TypeCheckFailure(s"dim must be positive, got $dim")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sum_vector requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"sum_vector: vector of length ${a.numElements()}, expected $dim")
      var i = 0
      while (i < dim) {
        require(!a.isNullAt(i), s"sum_vector: null element at index $i — " +
          "filter invalid vectors before aggregating")
        buf(i) += a.getLong(i); i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < dim) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](dim)
    var i = 0
    while (i < dim) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumVector =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumVector =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SumVector =
    copy(child = newChild)
}

object SumVector {
  def sum_vector(sa: Column, dim: Int): Column =
    ColumnBridge.column(
      SumVector(ColumnBridge.expression(sa), dim).toAggregateExpression())
}

/** Centered projection scalar: Σ_i (x_i − μ_i)·v_i over a float vector,
  * with the mean and component vectors bound as reference objects — the
  * PCA projection's per-row kernel (one tight double loop, codegen'd;
  * same family as [[NearestCentroid]]). Dimensions clamp to the
  * shortest of the three vectors. */
case class CenteredDot(child: Expression, mean: Array[Double],
    comp: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "centered_dot"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centered_dot requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    CenteredDot.project(mean, comp, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mean", mean, "double[]")
    val c = ctx.addReferenceObj("comp", comp, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CenteredDot.project($m, $c, $x);")
  }

  override protected def withNewChildInternal(newChild: Expression): CenteredDot =
    copy(child = newChild)
}

object CenteredDot {
  /** Static kernel so generated code calls it directly. Null elements
    * contribute (0 − μ_i)·v_i — the fixture path filters them out; the
    * choice only needs to be deterministic. */
  def project(mean: Array[Double], comp: Array[Double], v: ArrayData): Double = {
    val n = math.min(v.numElements(), math.min(mean.length, comp.length))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
      acc += (x - mean(i)) * comp(i)
      i += 1
    }
    acc
  }

  def centered_dot(v: Column, mean: Array[Double], comp: Array[Double]): Column =
    ColumnBridge.column(CenteredDot(ColumnBridge.expression(v), mean, comp))
}
