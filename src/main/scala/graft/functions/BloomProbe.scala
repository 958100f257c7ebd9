package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]], bound as a reference
  * object — the serving-side half of the delta-vs-base dedup pre-filter
  * (the filter itself is built by `DataFrameStatFunctions.bloomFilter`,
  * Spark's distributed treeAggregate). One virtual call per row against
  * broadcast-class read-only state: the same shape Spark's own runtime
  * bloom-join pruning generates (`BloomFilterMightContain`), but usable
  * against an EXTERNAL filter a pipeline persisted beside its base
  * corpus rather than one injected by the optimizer. */
case class BloomProbe(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe requires bigint, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $b.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  def bloom_probe(c: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomProbe(ColumnBridge.expression(c), bloom))
}
