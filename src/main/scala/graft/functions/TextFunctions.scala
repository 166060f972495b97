package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators. All composed
  * from built-in (codegen'd) functions — no UDFs in the hot path.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus-safe). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Canonical form for fingerprinting: lowercase, strip non [a-z0-9 ],
    * collapse whitespace, trim.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Document fingerprint = md5 of the canonical form. */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Top 60 bits of md5 as a non-negative BIGINT. Engine-portable: any
    * SQL engine with md5 reproduces it bit-identically (DuckDB:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`), which makes sketches
    * built on it (simhash, minhash) oracle-checkable — unlike xxhash64,
    * which only Spark implements. 15 hex chars = 60 bits < 2^63, so the
    * value is always non-negative and exact in a signed long.
    */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** let-binding for Column expressions: evaluate `value` ONCE per row
    * and reference the result as a lambda variable inside `body`.
    * Catalyst has no let form, and referencing a sub-expression (e.g. a
    * `split`) inside a higher-order-function lambda re-evaluates it per
    * ELEMENT — O(len²) for token arrays. `transform` over a one-element
    * array passes the EVALUATED element to the lambda, giving exactly
    * let semantics: bindArray(tokens(text))(t => ...slice(t, i, w)...).
    */
  def bindArray(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** Word n-gram shingles as strings ("w1 w2 ... wn"), built by
    * zipping n shifted slices of the token array. Every reference to
    * the tokenization sits OUTSIDE the lambdas, so `split` evaluates n
    * times per row — a lambda-body `slice(tokens(text), i, n)` would
    * re-tokenize per POSITION, turning shingling O(len²) per row
    * (measured 4x wall on the 4-gram decontamination pass). zip_with
    * pads the shorter (shifted) side with null and `concat` of null is
    * null, so trailing partial windows drop in the final filter.
    */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 1, "shingle width must be >= 1")
    val t = tokens(text)
    if (n == 1) t
    else {
      val shifted = (1 to n).map {
        case 1 => t
        case k => slice(t, lit(k), greatest(size(t) - (k - 1), lit(0)))
      }
      filter(
        shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y))),
        x => x.isNotNull)
    }
  }

  /** Count of tokens that appear in a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))
}
