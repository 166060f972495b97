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

  /** Word n-gram shingles as strings ("w1 w2 ... wn"). Bigrams get a
    * zip_with fast path (no per-position array slice): `concat` of a
    * null pad yields null, which the filter drops — same output as the
    * general path.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    if (n == 2) {
      filter(
        zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)),
        x => x.isNotNull)
    } else {
      filter(
        transform(t, (_, i) => concat_ws(" ", slice(t, i + lit(1), lit(n)))),
        (_, i) => i <= size(t) - n)
    }
  }

  /** Count of tokens that appear in a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))
}
