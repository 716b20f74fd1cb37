package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling for near-duplicate detection, as pure column
  * expressions (higher-order functions — no UDFs, stays in codegen).
  */
object Shingles {

  /** Distinct word `n`-gram shingles of a PRE-TOKENIZED array column.
    * Inputs shorter than `n` tokens yield an empty array (without the
    * guard, `sequence(1, size-(n-1))` would DESCEND through zero — Spark
    * steps -1 when start > stop — and `element_at(tokens, 0)` throws).
    *
    * Takes tokens, not text, on purpose: a `split(text)` expression
    * referenced inside the transform lambda is re-evaluated on every lambda
    * invocation (no CSE across lambda calls), turning shingling into
    * O(tokens^2) per document. Materialize the split into a column first
    * and each `element_at` is an O(1) array read.
    */
  def wordNGrams(tokens: Column, n: Int): Column = {
    val grams = array_distinct(
      transform(sequence(lit(1), size(tokens) - (n - 1)), i => {
        val parts = (0 until n).flatMap { k =>
          val e = element_at(tokens, i + k)
          if (k == 0) Seq(e) else Seq(lit(" "), e)
        }
        concat(parts: _*)
      }))
    when(size(tokens) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** One md5 hex digest per shingle — sliced into independent sub-hashes
    * by minHashSlice (8-32x cheaper than hashing once per seed/bit). md5
    * hex strings order identically in every engine, which makes signatures
    * oracle-reproducible (unlike engine-specific 64-bit hashes).
    *
    * Hot-path caveat: referencing this array from N downstream lambdas
    * (e.g. one array_min per seed) re-inlines the md5 transform N times —
    * Spark does no CSE across lambda bodies. For bulk signatures, explode
    * to postings and groupBy-min instead (queries.DedupOps q31). */
  def md5PerShingle(shingles: Column): Column =
    transform(shingles, x => md5(x))

  /** MinHash value for seed `j`: min over shingles of the j-th 4-hex-char
    * (16-bit) slice of the per-shingle md5. Up to 8 seeds per digest. */
  def minHashSlice(md5s: Column, seed: Int): Column =
    array_min(transform(md5s, h => substring(h, 4 * seed + 1, 4)))

  /** Exact Jaccard of two distinct-element shingle arrays. Int/int division
    * after explicit double casts — bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
}
