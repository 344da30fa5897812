package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HHmm-encoded integer time → hour/minute/timestamp derivation.
  *
  * Digit-exact re-expression of the reference's SQL (notebook.py:263–291,
  * `/root/reference/Processing Flight Data with Spark on Databricks.py`):
  *   - '24xx' wraps to hour '00' of the SAME day (no rollover);
  *   - values with fewer than 3 digits get hour '00';
  *   - 3-digit values take the first digit as hour, else first two;
  *   - minutes are `right(cast(t as string), 2)` — UN-padded (so 9 → "9"),
  *     and only padded inside the timestamp concat via lpad.
  * These quirks are load-bearing for oracle hash-equality (SURVEY §7.5).
  */
object TimeDerivation {

  /** Hour-of-day as 2-char string per the reference's CASE chain. */
  def hhmmHour(t: Column): Column = {
    val s = t.cast("string")
    when(substring(s, 1, 2) === "24", "00")
      .when(length(s) < 3, "00")
      .when(length(s) === 3, substring(s, 1, 1))
      .otherwise(substring(s, 1, 2))
  }

  /** Minute-of-hour as the last 2 chars, UN-padded (reference notebook.py:270
    * uses `right(s, 2)`; `substring(s, -2, 2)` is the identical Column form —
    * for a 1-char input both yield the single char).
    */
  def hhmmMin(t: Column): Column =
    substring(t.cast("string"), -2, 2)

  /** Full timestamp from (year, month, day, hhmm) per notebook.py:272–289.
    * BOTH hour and minute are lpadded inside the concat (the reference
    * lpads each piece; a 1-digit hour like "6:30" would fail strict
    * `HH:mm` parsing and silently derive null).
    */
  def hhmmTimestamp(year: Column, month: Column, day: Column, t: Column): Column =
    // try_to_timestamp, not to_timestamp: identical null-on-malformed
    // result under legacy semantics, but under ANSI mode (Spark 4's
    // default) a plain to_timestamp THROWS on e.g. minute "99" — the
    // reference semantics require null (SURVEY §7.5.2).
    try_to_timestamp(
      concat(
        year.cast("string"), lit("-"),
        lpad(month.cast("string"), 2, "0"), lit("-"),
        lpad(day.cast("string"), 2, "0"), lit(" "),
        lpad(hhmmHour(t), 2, "0"), lit(":"),
        lpad(hhmmMin(t), 2, "0")),
      lit("yyyy-MM-dd HH:mm"))
}
