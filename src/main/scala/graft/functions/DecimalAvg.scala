package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[DecimalAvg]]: exact decimal running sum + count. */
case class DecimalAvgBuf(sum: BigDecimal, n: Long)

/** Decimal-exact average: each double is first fixed to 2 decimal places,
  * summed exactly, and the final division rounds HALF_UP at scale 6.
  *
  * This is the clean re-expression of the reference's client-side average
  * (O9, utils/load.py:33-35: `Decimal(sum(...) / len_data)` — a float
  * division wrapped in Decimal, i.e. decimal-looking but float-precise).
  * Here the arithmetic is exact end to end, and as a typed `Aggregator`
  * it runs as a partial+final aggregate (map-side combine via merge), so
  * it distributes like any built-in agg.
  */
class DecimalAvg extends Aggregator[Double, DecimalAvgBuf, java.math.BigDecimal] {
  override def zero: DecimalAvgBuf = DecimalAvgBuf(BigDecimal(0), 0L)

  override def reduce(b: DecimalAvgBuf, x: Double): DecimalAvgBuf =
    DecimalAvgBuf(
      b.sum + BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP),
      b.n + 1)

  override def merge(a: DecimalAvgBuf, b: DecimalAvgBuf): DecimalAvgBuf =
    DecimalAvgBuf(a.sum + b.sum, a.n + b.n)

  override def finish(r: DecimalAvgBuf): java.math.BigDecimal =
    if (r.n == 0) null
    else (r.sum / BigDecimal(r.n)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal

  override def bufferEncoder: Encoder[DecimalAvgBuf] = Encoders.product[DecimalAvgBuf]
  override def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
}
