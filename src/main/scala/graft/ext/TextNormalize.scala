package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.nfc_normalize
import graft.sources.Tables

/** Canonical text normalization — the cleaning pass that runs BEFORE any
  * hashing/dedup/tokenization in a web-corpus pipeline: markup stripping,
  * whitespace collapse, and Unicode NFC composition (the same rendered text
  * arrives composed from one crawl and decomposed from another; without NFC
  * they fingerprint as different documents and every downstream dedup
  * silently leaks duplicates).
  *
  * All three steps are row-local, codegen-resident column work (two RE2∩Java
  * regexes + the native [[graft.functions.VectorFunctions.nfc_normalize]]
  * kernel) — a 100 TB normalization pass is pure map-side scan, no shuffle,
  * no UDF boxing. The reference engine has no text surface at all
  * (/root/reference/airflow/dags/weather_etl.py — 8 fixed weather columns).
  */
object TextNormalize {

  /** Markup stripped to spaces, whitespace runs collapsed, ends trimmed,
    * then NFC-composed. The regexes stay inside the RE2 ∩ Java dialect so
    * the DuckDB oracle replays them verbatim. */
  def normalized(text: Column): Column =
    nfc_normalize(trim(regexp_replace(
      regexp_replace(text, "<[^>]+>", " "), "\\s+", " ")))

  // ---- driver queries ----

  /** q_text_normalize — normalization accounting per language. Each doc is
    * suffixed with a fixture fragment containing real markup and a
    * DECOMPOSED accent (`e` + U+0301) so the pass has markup to strip and a
    * composition to perform on every row; the oracle rebuilds the same
    * fragment with chr() and replays strip→collapse→NFC in DuckDB. The
    * min/max md5 of the normalized text make the hash match byte-exact —
    * one stray space or a skipped composition flips them. */
  def qNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val aug = concat(col("text"), lit(" <b>Café</b> fin"))
    Tables.documents(spark, sfDir)
      .select(col("lang"), normalized(aug).as("norm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("norm")).cast("long")).as("sum_chars"),
        min(md5(col("norm"))).as("md5_lo"),
        max(md5(col("norm"))).as("md5_hi"))
      .orderBy(col("lang"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_normalize" -> (qNormalize _))

  val oracles: Map[String, String] = Map(
    // chr(769) = U+0301 combining acute; nfc_normalize composes e+U+0301
    // into U+00E9, exactly what the engine's native kernel must produce
    "q_text_normalize" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(length(norm)) AS BIGINT) AS sum_chars,
        |  MIN(md5(norm)) AS md5_lo,
        |  MAX(md5(norm)) AS md5_hi
        |FROM (
        |  SELECT lang, nfc_normalize(trim(regexp_replace(regexp_replace(
        |      text || ' <b>Cafe' || chr(769) || '</b> fin',
        |      '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g'))) AS norm
        |  FROM documents) t
        |GROUP BY lang
        |ORDER BY lang""".stripMargin)
}
