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

/** JSON string quoting shared by the wire-format writer (FeedList) and
  * the oracle manifest writer (Verify): backslash, quote, and ALL
  * control chars escaped — one implementation, so an escaping fix can't
  * silently miss a caller.
  */
object JsonText {
  def quote(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
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

  /** Per-group count equality — the form a positional zip actually
    * needs: global counts can match while two groups are mutually
    * misaligned (3+2 vs 2+3), which a global check waves through and
    * the zip join then silently drops. One aggregate per side + a
    * full-outer join over the (small) group keys.
    */
  def requireGroupCountsMatch(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      key: String,
      what: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val ca = a.groupBy(col(key)).agg(count(lit(1)).as("__ca"))
    val cb = b.groupBy(col(key)).agg(count(lit(1)).as("__cb"))
    val bad = ca.join(cb, Seq(key), "full_outer")
      .filter(!(col("__ca") <=> col("__cb"))).count()
    require(bad == 0, s"$what: per-$key count mismatch in $bad group(s)")
  }
}
