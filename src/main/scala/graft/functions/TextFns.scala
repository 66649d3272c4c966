package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared declarative text-tokenization helpers. */
object TextFns {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Distinct 64-bit token hashes (xxhash64, fixed seed) — the unit
    * the MinHash/SimHash operators work over; at 100 TB you shuffle
    * these 8-byte hashes, never the raw strings. */
  def hashedTokenSet(text: Column): Column =
    transform(tokenSet(text), t => xxhash64(t))

  /** Word n-gram array (space-joined), distinct. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity of two pre-deduplicated arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val u = size(array_union(a, b))
    when(u === 0, 0.0)
      .otherwise(size(array_intersect(a, b)).cast("double") / u.cast("double"))
  }
}
