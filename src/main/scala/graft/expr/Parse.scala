package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** JS-compatible scalar parsing/validation helpers, expressed as Catalyst
  * column expressions (no UDFs — everything here stays inside whole-stage
  * codegen). Semantics documented against the reference:
  *
  *  - `jsParseFloat`  = JS `parseFloat`  (longest numeric *prefix*, NaN→null)
  *    used by `freetrade.js:139,145,168-169`, `fidelity.js:13-19`.
  *  - `jsNumber`      = JS `Number()`    (whole-string parse, ''→0, NaN→null)
  *    used by `ii.js:66-67,77,84`.
  *  - `parseNumber`   = comma-stripping `parseFloat` (`bullionvault.js:11-13`).
  *  - `failUnless`    = the reference's fail-fast `throw` policy (§2.10 of
  *    SURVEY.md): evaluates to `value` when `ok`, otherwise aborts the job via
  *    `raise_error` — mirroring the reference aborting the whole run on the
  *    first bad row.
  *
  * All helpers are ANSI-mode-safe: casts are guarded by regex prefilters so
  * they never throw under `spark.sql.ansi.enabled=true`.
  */
object Parse {

  /** Regex of strings that JS `Number()` / a guarded cast can parse as double. */
  private val NumRe = "^[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?$"

  /** Prefix regex for JS `parseFloat` (parses the longest valid numeric prefix). */
  private val PrefixRe = "^\\s*[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?"

  /** Safe cast: null unless the trimmed string is fully numeric. */
  private def guardedCast(c: Column): Column = {
    val t = trim(c)
    when(t.rlike(NumRe), t.cast(DoubleType))
  }

  /** JS `parseFloat(s)`: longest numeric prefix; null (≙ NaN) if none. */
  def jsParseFloat(c: Column): Column =
    guardedCast(regexp_extract(c, PrefixRe, 0))

  /** JS `Number(s)`: whole-string parse; '' / whitespace → 0; null ≙ NaN. */
  def jsNumber(c: Column): Column =
    when(trim(c) === "", lit(0.0)).otherwise(guardedCast(c))

  /** BullionVault `parseNumber`: strip thousands commas, then parseFloat
    * (`bullionvault.js:11-13`). */
  def parseNumber(c: Column): Column =
    jsParseFloat(regexp_replace(c, ",", ""))

  /** ii-style `Number` after stripping `£` and `,` (`ii.js:66-67,83`). */
  def poundsNumber(c: Column): Column =
    jsNumber(regexp_replace(c, "[£,]", ""))

  /** JS falsy-string coalesce: first non-empty value, else null
    * (`row['ISIN'] || row['Ticker']` at `freetrade.js:136`; `ii.js:75`). */
  def firstNonEmpty(cs: Column*): Column =
    coalesce(cs.map(c => when(c.isNotNull && c =!= "", c)): _*)

  /** Fail-fast validation: `value` when `ok`, else abort the job with `msg`.
    * Reproduces the reference's throw-on-first-bad-row policy (SURVEY.md §2.10). */
  def failUnless(value: Column, ok: Column, msg: Column): Column =
    when(ok, value).otherwise(raise_error(msg))

  def failUnless(value: Column, ok: Column, msg: String): Column =
    failUnless(value, ok, lit(msg))

  // ---------------------------------------------------------------- dates ---

  /** ISO-8601 timestamp → `dd/MM/yyyy` (Freetrade, `freetrade.js:178-188`).
    * Session timezone is pinned UTC, mirroring the reference's use of local
    * date components on a UTC-configured host. Null when unparsable. */
  def isoToDmy(c: Column): Column =
    date_format(try_to_timestamp(c), "dd/MM/yyyy")

  /** `D/M/YYYY` passthrough with zero-padding (ii, `ii.js:98-109`). The
    * reference only splits/pads — it never validates the numbers — so we do
    * the same (`31/2/2024` passes through as `31/02/2024`). Null when the
    * string does not have exactly three `/`-separated parts. */
  def dmyZeroPad(c: Column): Column = {
    val parts = split(c, "/")
    when(size(parts) === 3,
      concat_ws("/", lpad(parts.getItem(0), 2, "0"), lpad(parts.getItem(1), 2, "0"), parts.getItem(2)))
  }

  /** `16 Jun 2023` → `dd/MM/yyyy` (Fidelity, `fidelity.js:95-106`). */
  def dMmmYyyyToDmy(c: Column): Column =
    date_format(coalesce(
      try_to_timestamp(c, lit("d MMM yyyy")),
      try_to_timestamp(c, lit("d MMMM yyyy"))), "dd/MM/yyyy")

  /** BullionVault deal-time freeform → `dd/MM/yyyy` (`bullionvault.js:100-112`).
    * JS strips ` at ` and leans on `new Date(...)` laxity with a segment-reorder
    * fallback for `21 August 2019 11:23:26 BST`; we replace that with an ordered
    * multi-pattern coalesce over the cleaned string (tz abbreviation dropped —
    * the reference also ignores it: JS Date parses `BST` as invalid and the
    * fallback path drops it, yielding host-local components). */
  def dealTimeToDmy(c: Column): Column = {
    val cleaned = regexp_replace(regexp_replace(c, "(?i)\\s+at\\s+", " "), "\\s+(?!(?:AM|PM)\\b)[A-Z]{2,5}\\s*$", "")
    val pmFixed = trim(cleaned)
    date_format(coalesce(
      try_to_timestamp(pmFixed, lit("MMM d, yyyy h:mm:ss a")),
      try_to_timestamp(pmFixed, lit("MMMM d, yyyy h:mm:ss a")),
      try_to_timestamp(pmFixed, lit("d MMM yyyy H:mm:ss")),
      try_to_timestamp(pmFixed, lit("d MMMM yyyy H:mm:ss")),
      try_to_timestamp(pmFixed, lit("MMM d, yyyy")),
      try_to_timestamp(pmFixed, lit("MMMM d, yyyy")),
      try_to_timestamp(pmFixed, lit("d MMM yyyy")),
      try_to_timestamp(pmFixed, lit("d MMMM yyyy"))), "dd/MM/yyyy")
  }
}
