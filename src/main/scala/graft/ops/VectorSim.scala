package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cosine similarity over `array<float>` embedding columns as pure
  * higher-order-function expressions (no UDFs — stays in codegen).
  *
  * Numeric portability: every element is cast to double BEFORE any
  * arithmetic, products are folded strictly left-to-right
  * (`aggregate(zip_with(...))` starts at 0.0, which is IEEE-identity), and
  * the cosine is `dot / (norm_a * norm_b)` with exactly that
  * parenthesization — mirrored by DuckDB `list_reduce(list_transform(
  * list_zip(...)))`, so results are bit-identical across engines and
  * hash-comparable.
  */
object VectorSim {

  /** array<float> -> array<double> (each element exactly representable). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** The ONE definition of a raw (vec_id, embedding float-array) frame's
    * prepped (vec_id, e: array<double>, nrm) shape — the input contract
    * of every banded/exact kernel. Extracted because the triple was
    * copy-pasted at six call sites across the corpus mains (the r12
    * review's reuse finding): a drift in any copy would silently
    * de-synchronize gate sides that must band identically. */
  def prepped(raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    raw.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))

  /** Left-to-right fold of elementwise products — the portable HOF form;
    * kept as the executable specification of [[dot]]'s semantics. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native codegen'd dot product (graft.expressions.DotProduct): same
    * strict fold order as [[dotHof]], so bit-identical results, but inside
    * whole-stage codegen instead of interpreted lambda evaluation. */
  def dot(a: Column, b: Column): Column = graft.expressions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine from precomputed norms (compute `norm` once per vector, not
    * once per pair — at N^2 pairs that's the difference between 2N and
    * 2N^2 norm folds). */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
