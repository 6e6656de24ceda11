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

  /** 60-bit non-negative hash of a string column, identical in DuckDB.
    *
    * Delegates to the native `graft_hash60` kernel — arithmetically
    * the same value as `conv(substring(md5(c), 1, 15), 16, 10)`
    * (spec-pinned) without the per-call hex-string allocation and
    * digit re-parse; the hash runs per WORD in the dedup/LM
    * operators, so those round-trips were the hot path's constant.
    * Built expression-direct (ColumnBridge), NOT via call_function:
    * these helpers back every public ml API, which must keep working
    * on sessions that never registered GraftExtensions.
    */
  def hash60(c: Column): Column =
    graft.functions.Hash60(c.cast("binary"))

  /** Distinct, order-stable word n-gram shingles of a text column
    * (first occurrence kept; the downstream set operations —
    * intersection sizes, min-hash — are order-insensitive).
    *
    * Delegates to the native one-pass `graft_shingles` kernel. The
    * previous declarative form (`array_distinct(transform(sequence,
    * i => concat_ws(element_at(split(text), i+o)...)))`) re-evaluated
    * `split(text)` per lambda element — O(L²) character work per doc,
    * invisible at the fixtures' doc lengths and ruinous at real
    * corpus lengths (the ns20 trap, SURVEY §9). The kernel is
    * spec-pinned equal to the HOF form on real documents. Built
    * expression-direct (ColumnBridge, not call_function) so the ml
    * APIs carry no session-registration precondition.
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.Shingles(text, n)
}
