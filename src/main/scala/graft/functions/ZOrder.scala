package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._

/** 2-D Z-order (Morton) clustering key: interleaves the low `bits` bits
  * of two non-negative integer columns — bit i of x lands at position
  * 2i, bit i of y at 2i+1 — so sorting by the key places rows that are
  * close in BOTH dimensions close on disk.
  *
  * Layout use at 100 TB: `df.repartitionByRange(n, col(zkey))
  * .sortWithinPartitions(zkey)` before a parquet write clusters files
  * and row groups on two filter dimensions at once, so min/max stats
  * prune scans filtered on either or both (the same trick Delta's
  * OPTIMIZE ZORDER BY applies). Plain integer bit arithmetic — exact on
  * every engine, so the key itself is oracle-verifiable.
  */
object ZOrder {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  private def shl(a: Column, n: Column): Column = col(ShiftLeft(ex(a), ex(n)))
  private def shr(a: Column, n: Column): Column = col(ShiftRight(ex(a), ex(n)))

  def zorderKey(x: Column, y: Column, bits: Int): Column =
    zorderKeyN(Seq(x, y), bits)

  /** N-dimensional Morton key: bit i of column j lands at position
    * i·N + j (round-robin interleave), so sorting clusters rows close
    * in EVERY dimension. `dims · bits` must fit a signed long
    * (≤ 63 bits of key). */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && n * bits <= 63,
      s"zorder key needs dims*bits <= 63, got $n*$bits")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a + shl(shr(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
      })
  }
}
