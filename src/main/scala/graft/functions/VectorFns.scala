package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns as codegen'd higher-order
  * functions. The fold is a strict left fold in array order so the DuckDB
  * oracle (`list_reduce` over the same products) produces bit-identical
  * IEEE doubles — floats widen to double exactly before multiplying.
  */
object VectorFns {
  /** Left-fold sum of elementwise products, in double — backed by the
    * codegen'd [[DotProductExpr]] (identical semantics to the
    * `aggregate(zip_with(...))` composition, ~interpreter-free).
    */
  def dot(a: Column, b: Column): Column = DotProduct.dotF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero norms is the caller's
    * concern (synthetic embeddings are never zero).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
