package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation surface (the UDAF tier of SURVEY.md §2.3):
  * an `Aggregator[IN, BUF, OUT]` with exact integer-cent arithmetic so
  * its result is oracle-verifiable bit-for-bit (doubles are converted to
  * cents on the way in, divided back out once at the end).
  */
object Aggregators {

  final case class PriceStats(cents: Long, n: Long, maxCents: Long)

  /** Mean and max of a 2-decimal price column, computed in integer cents
    * (order-insensitive, overflow-safe to ~9e16 cents). */
  val priceStats: Aggregator[Double, PriceStats, (Double, Double, Long)] =
    new Aggregator[Double, PriceStats, (Double, Double, Long)] {
      private def toCents(v: Double): Long = math.round(v * 100.0)
      override def zero: PriceStats = PriceStats(0L, 0L, Long.MinValue)
      override def reduce(b: PriceStats, a: Double): PriceStats =
        PriceStats(b.cents + toCents(a), b.n + 1, math.max(b.maxCents, toCents(a)))
      override def merge(x: PriceStats, y: PriceStats): PriceStats =
        PriceStats(x.cents + y.cents, x.n + y.n, math.max(x.maxCents, y.maxCents))
      override def finish(r: PriceStats): (Double, Double, Long) =
        ((r.cents.toDouble / 100.0) / r.n.toDouble, r.maxCents.toDouble / 100.0, r.n)
      override def bufferEncoder: Encoder[PriceStats] = Encoders.product[PriceStats]
      override def outputEncoder: Encoder[(Double, Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)
    }
}
