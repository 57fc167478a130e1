package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity hashing built from md5 (identical in Spark and DuckDB).
  *
  * All dedup/fingerprint operators hash through these so the DuckDB oracle
  * can recompute the exact same integers: Spark `conv(substr(md5(x),1,N),
  * 16,10)` == DuckDB `('0x'||substr(md5(x),1,N))::BIGINT`.
  */
object HashFns {
  /** 60-bit positive hash (15 hex chars of md5). */
  def hash60(c: Column): Column = Md5Prefix.md5PrefixLong(c, 15)

  /** 32-bit positive hash (8 hex chars of md5). */
  def hash32(c: Column): Column = Md5Prefix.md5PrefixLong(c, 8)

  /** MinHash family h_i(x) = (a_i*x + b_i) mod P — constants shared with
    * the oracle-SQL generator. x must be < 2^32 (see [[hash32]]) so the
    * product stays inside a signed 64-bit long.
    */
  val MinhashP: Long = 2147483647L
  val MinhashK: Int = 32
  val MinhashBands: Int = 8
  val MinhashRows: Int = 4 // per band; Bands * Rows == K

  def minhashA(i: Int): Long = {
    val a = (1103515245L * (i + 1) + 12345L) % MinhashP
    if (a == 0L) 1L else a
  }
  def minhashB(i: Int): Long = (69069L * (i + 1) + 1L) % MinhashP
}
