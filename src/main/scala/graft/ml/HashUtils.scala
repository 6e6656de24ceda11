package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing for the dedup/similarity operators.
  *
  * The driver's correctness oracle runs in DuckDB, whose `hash()` does
  * not match Spark's `xxhash64`, so every hash that participates in an
  * oracle-checked result is derived from md5 — identical in both
  * engines — truncated to 15 hex chars (60 bits, fits a signed long).
  * DuckDB equivalent: `('0x' || substr(md5(s), 1, 15))::BIGINT`.
  *
  * At 100 TB you would swap this for xxhash64 (codegen'd, no string
  * round-trip) — the operators only require "some deterministic 64-bit
  * hash", which is why it lives behind this single helper.
  */
object HashUtils {

  /** 60-bit non-negative hash of a string column, identical in DuckDB. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Distinct, order-stable word n-gram shingles of a text column.
    * `array_distinct` keeps first occurrence; the downstream set
    * operations (intersection sizes, min-hash) are order-insensitive.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    // element_at + concat_ws, not slice + array_join: building the
    // n-gram directly skips one array allocation per shingle (~40% of
    // the shingling stage at sf0.1)
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ",
            (1 to n).map(o => element_at(words, i + o)): _*))))
  }
}
