package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns as codegen'd higher-order
  * functions. The fold is a strict left fold in array order so the DuckDB
  * oracle (`list_reduce` over the same products) produces bit-identical
  * IEEE doubles — floats widen to double exactly before multiplying.
  */
object VectorFns {
  /** Left-fold sum of elementwise products, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero norms is the caller's
    * concern (synthetic embeddings are never zero).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
