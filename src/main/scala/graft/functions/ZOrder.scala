package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve value over two dimensions, composed entirely
  * from built-in bit ops so the whole computation stays inside
  * whole-stage codegen — no UDF, no custom expression needed.
  *
  * Interleaving the bits of two columns gives a 1-D sort key whose
  * contiguous ranges are 2-D tiles: files written in z-value order carry
  * NARROW min/max footer ranges on BOTH dimensions, so a parquet reader
  * filtering on either column (or both) skips most files — multi-column
  * data skipping where a plain sort only ever prunes its leading column.
  */
object ZOrder {

  /** Spread the low 32 bits of `v` to the even bit positions of a long
    * (the classic mask-shift cascade).
    */
  private def spread(v: Column): Column = {
    val masks = Seq(
      (16, 0x0000ffff0000ffffL),
      (8, 0x00ff00ff00ff00ffL),
      (4, 0x0f0f0f0f0f0f0f0fL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(v.bitwiseAND(lit(0xffffffffL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** The interleaved z-value of two non-negative int-ranged columns
    * (callers quantize/rank wider domains first — a date_key int or a
    * surrogate key fits directly).
    */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))
}
