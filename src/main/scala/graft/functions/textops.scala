package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic text primitives.
  *
  * Every helper here has an exact DuckDB twin (the `Sql` strings), so
  * operators built from them are oracle-checkable bit-for-bit: both
  * engines lower → strip to [a-z0-9 ] → split on whitespace → the same
  * shingles, and both derive 60-bit integer hashes from the same md5 hex
  * prefix. md5 (not xxhash64) is deliberate: it is the one keyed hash
  * both engines implement identically, which is what makes MinHash /
  * SimHash / fingerprint results verifiable against an independent
  * engine rather than "trust me" rows-only checks.
  */
object textops {

  /** Lowercased alnum tokens. Twin: [[tokensSql]].
    *
    * `regexp_extract_all`, NOT split-then-filter: the result is
    * identical (maximal [a-z0-9] runs of the lowered text), but
    * `RegExpExtractAll` caches its compiled Pattern per expression
    * instance while interpreted `StringSplit` recompiles the regex on
    * EVERY row — inside a higher-order `filter` (interpreted subtree)
    * that recompile dominated the round-2 dedup profile. */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  def tokensSql(c: String): String =
    s"regexp_extract_all(lower($c), '[a-z0-9]+')"

  /** Distinct word k-shingles (k=3) of a token array. Twin: [[shinglesSql]]. */
  def shingles(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - lit(2)),
        i => concat_ws(" ", slice(t, i, lit(3))))))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(t: String): String =
    s"list_distinct([array_to_string($t[i:i+2], ' ') for i in range(1, len($t) - 1)])"

  /** 60-bit non-negative hash from the md5 hex prefix — the cross-engine
    * stand-in for a 64-bit hash function. Twin: [[hash60Sql]]. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(c: String): String =
    s"('0x' || substr(md5($c), 1, 15))::BIGINT"

  /** Driver/executor-side Scala twin of [[hash60]] for code that runs
    * OUTSIDE the expression tree (batched embed stubs, decoders):
    * same md5-hex-prefix derivation, bit-identical results. */
  def hash60Local(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  /** Whitespace-collapsed, punctuation-stripped, lowercased normal form
    * for content fingerprinting. Twin: [[normalizeSql]].
    *
    * Routed through the native one-pass [[NormalizeText]] expression
    * (callers must have [[texthash.register]]ed the session — every
    * text operator does): the former composite
    * `trim(regexp_replace(regexp_replace(lower(c), ...)))` ran the
    * regex engine over the full document twice per row, which at sf1
    * dominated t4/t6/t7. Semantics are identical (spec-pinned against
    * the regex form on adversarial inputs). */
  def normalizeText(c: Column): Column = call_function("normalize_text", c)

  /** The pre-native composite form — kept as the cross-check twin the
    * [[NormalizeText]] property spec compares against. */
  def normalizeTextDeclarative(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  def normalizeSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
}
