package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling for near-duplicate detection, as pure column
  * expressions (higher-order functions — no UDFs, stays in codegen).
  */
object Shingles {

  /** Distinct word `n`-gram shingles of a space-separated text column.
    * Caller must ensure the text has at least `n` tokens (filter upstream)
    * — shorter texts would produce null-padded shingles.
    */
  def wordNGrams(text: Column, n: Int): Column = {
    val w = split(text, " ")
    array_distinct(
      transform(sequence(lit(1), size(w) - (n - 1)), i => {
        val parts = (0 until n).flatMap { k =>
          val e = element_at(w, i + k)
          if (k == 0) Seq(e) else Seq(lit(" "), e)
        }
        concat(parts: _*)
      }))
  }

  /** MinHash value for one seed: min over shingles of md5(shingle + tag).
    * md5 hex strings order identically in every engine, which makes the
    * signature oracle-reproducible (unlike engine-specific 64-bit hashes).
    */
  def minHash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, x => md5(concat(x, lit("#" + seed)))))

  /** Exact Jaccard of two distinct-element shingle arrays. Int/int division
    * after explicit double casts — bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
}
