package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar/projection vocabulary (SURVEY.md §2.2 S1–S16)
  * as named Column functions — each a thin composition of codegen'd
  * built-ins, collected here so every S-row has one canonical,
  * spec-covered implementation with its reference citation.
  */
object ScalarOps {

  /** S1 — URL-encode spaces (`lambda_1.py:26`). */
  def urlEncodeSpaces(c: Column): Column = regexp_replace(c, " ", "+")

  /** S2 — feed-link predicate (`lambda_1.py:62`). */
  def looksLikeFeed(c: Column): Column =
    c.contains("feed") || c.contains("rss")

  /** S3 — last path segment (`lambda_1.py:75`, `lambda_5.py:24-27`). */
  def lastPathSegment(c: Column): Column = element_at(split(c, "/"), -1)

  /** S4 — trailing `_{n}` suffix as a number (`lambda_5.py:38`). */
  def trailingNumber(c: Column): Column =
    element_at(split(c, "_"), -1).cast("long")

  /** S5 — job-name sanitize `_ . /` → `-` (`lambda_4.py:16`). */
  def sanitizeJobName(c: Column): Column = translate(c, "_./", "---")

  /** S6 — suffix rewrite mp3→json (`lambda_4.py:19`). */
  def mp3ToJson(c: Column): Column = regexp_replace(c, "mp3$", "json")

  /** S7 — folder-name normalize (`lambda_3.py:91`). */
  def folderName(c: Column): Column = regexp_replace(lower(c), " ", "_")

  /** S8 — entity lowercase (`ec2_data/app.py:303`). */
  def entityKey(c: Column): Column = lower(c)

  /** S11 — net sentiment (`ec2_data/app.py:286`). */
  def netSentiment(pos: Column, neg: Column): Column = pos - neg

  /** S14 — newline append with load-bearing +1 offset
    * (`lambda_72.py:60`).
    */
  def withNewline(c: Column): Column = concat(c, lit("\n"))

  /** S15 — newline flatten in wordcloud assembly
    * (`ec2_data/app.py:399`).
    */
  def flattenNewlines(c: Column): Column = regexp_replace(c, "\n", " ")

  /** S16 — parameter defaulting (`ec2_data/app.py:86-87` etc.). */
  def paramOrDefault(param: Column, default: Column): Column =
    coalesce(param, default)
}

/** A9 — the count-equality data-quality check the reference prints but
  * never enforces (`lambda_71.py:69`:
  * `print(len(sentences) == len(sentiment_output))`) — here a real
  * assertion: distributed counts, no collect of data rows.
  */
object DataQuality {
  def countsMatch(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.count() == b.count()

  def requireCountsMatch(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      what: String): Unit = {
    val (ca, cb) = (a.count(), b.count())
    require(ca == cb, s"$what: count mismatch $ca != $cb")
  }
}
