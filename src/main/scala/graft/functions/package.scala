package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Column-level building blocks shared by the query catalog.
  *
  * Two cross-engine determinism rules (every catalog query is verified
  * against DuckDB by value-hash, so Spark and DuckDB must produce
  * bit-identical results):
  *
  *   1. Never `sum` raw doubles — summation order differs per partition
  *      count. Route through an exact decimal: `dsum` casts each input
  *      double to DECIMAL(28,4) (deterministic, ties effectively never
  *      occur on real data) and sums exactly, then converts back to a
  *      correctly-rounded double. Order-independent in both engines.
  *
  *   2. Never rank/compare raw float expressions whose summation order
  *      the engine controls. For embeddings, quantize to 1e-6 integers
  *      (`qvec`): all downstream dot products / norms are integer
  *      arithmetic whose intermediates stay < 2^53, hence exact in both
  *      BIGINT and DOUBLE execution — identical everywhere.
  */
package object functions {

  /** Reference tokenizer semantics: words are maximal runs of Unicode
    * letters (`unicode.IsLetter` separator — digits and apostrophes split
    * words, case preserved). Cited from the reference word-count app
    * (mrapps/wc.go:21-24). Same class works in DuckDB's RE2.
    */
  val TokenSep = "[^\\p{L}]+"

  /** Non-empty Unicode-letter tokens of a text column (codegen'd builtins,
    * no UDF).
    */
  def tokens(c: Column): Column =
    filter(split(c, TokenSep), t => length(t) > lit(0))

  /** Order-independent exact sum of a double expression; result is the
    * correctly-rounded double of the exact decimal sum. DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`.
    *
    * Scale 6 matters: harness money values have ≤2 true decimals, so
    * products like price·(1−disc)·(1+tax) have ≤6 — they then sit exactly
    * ON the decimal grid, where Spark's string-based and DuckDB's
    * binary-based double→decimal rounding always agree. At scale 4 those
    * products land on rounding midpoints and the engines split ties
    * differently (observed on q1 sum_charge).
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Exact average: exact decimal sum divided by count, both converted to
    * double before the (IEEE-identical) division. DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column =
    dsum(c) / count(c)

  /** Quantize a float/double array to 1e-6-scaled BIGINTs. DuckDB twin:
    * `list_transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))`
    * (both engines round ties away from zero; products/sums of the
    * quantized values stay exactly representable).
    */
  def qvec(c: Column): Column =
    transform(c, x => round(x.cast("double") * lit(1000000.0)).cast(LongType))

  /** Exact dot product of two quantized (BIGINT) vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity of two quantized vectors, as a double that is
    * bit-identical across engines: dot and norms are exact integers;
    * sqrt/div are IEEE-deterministic.
    */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      sqrt(qdot(a, a).cast("double")) /
      sqrt(qdot(b, b).cast("double"))

  /** Zero-padded key for lexicographic == numeric ordering of ids when
    * they are folded into strings (inverted index doc lists etc.).
    * DuckDB twin: `lpad(CAST(id AS VARCHAR), 8, '0')`.
    */
  def padKey(c: Column): Column = lpad(c.cast("string"), 8, "0")
}
