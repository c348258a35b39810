package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked slice of the multimodal tier: the testdata has no
  * media table, so document text bytes stand in as the opaque binary
  * column — which exercises exactly the engine-side plumbing that
  * matters (binary type, metadata derivation, deterministic
  * feature math, frame-slice explode). The Dataset[MediaRow] API with
  * the stubbed codec boundary is `graft.multimodal.Media` (spec-tested).
  */
object Multimodal {

  /** Binary column + typed metadata (m1): bytes, length, content hash. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .select(
        col("doc_id"),
        octet_length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("content_hash"))
      .orderBy(col("doc_id"))

  /** Deterministic 4-dim "feature" from content hash slices (m2): the
    * md5-hex → int trick gives both engines identical feature values —
    * the oracle-checkable core of feature extraction (the real codec
    * path is the stubbed Dataset API).
    */
  def contentFeatures(spark: SparkSession, dir: String): DataFrame = {
    def dim(i: Int) =
      (conv(substring(md5(col("bytes")), i * 8 + 1, 7), 16, 10)
        .cast("long").cast("double") / lit(268435455.0)).as(s"f$i")
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
      .select(col("doc_id"), dim(0), dim(1), dim(2), dim(3))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling shape (m3): fixed-width byte slices of the content,
    * one row per "frame" with its own hash — the 1→k generator pattern.
    */
  def frameSlices(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
      .withColumn("frame_index", explode(sequence(lit(0L), lit(3L))))
      .select(
        col("doc_id"),
        col("frame_index"),
        md5(expr(
          "cast(substring(hx, cast(frame_index * 64 + 1 as int), 64) as binary)"))
          .as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_index"))

  /** Frame-level containment dedup (m4) — the video near-dup pattern:
    * two media items sharing ≥ `MinSharedFrames` frame hashes evidence
    * clip reuse even when full-content hashes differ. Inverted-index
    * equi-join on frame_hash (same shape as the d2/d3 shingle joins:
    * candidate work ∝ true hash collisions, never all-pairs).
    */
  val MinSharedFrames = 2

  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    val f = documents(spark, dir)
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
      .withColumn("frame_index", explode(sequence(lit(0), lit(3))))
      .select(
        col("doc_id"),
        md5(expr("cast(substring(hx, frame_index * 64 + 1, 64) as binary)"))
          .as("frame_hash"))
      .distinct()
    val a = f.select(col("doc_id").as("a_id"), col("frame_hash").as("a_fh"))
    val b = f.select(col("doc_id").as("b_id"), col("frame_hash").as("b_fh"))
    a.join(b, col("a_fh") === col("b_fh") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= MinSharedFrames)
      .orderBy(col("a_id"), col("b_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> binaryMeta,
    "m2_content_features" -> contentFeatures,
    "m3_frame_slices" -> frameSlices,
    "m4_frame_dedup" -> frameDedup)

  val oracleSql: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_hash
         FROM documents ORDER BY doc_id""",
    "m2_content_features" -> {
      def dim(i: Int) =
        s"""CAST(CAST(concat('0x', substr(md5(text), ${i * 8 + 1}, 7)) AS BIGINT)
            AS DOUBLE) / 268435455.0 AS f$i"""
      s"""SELECT doc_id, ${(0 to 3).map(dim).mkString(", ")}
          FROM documents ORDER BY doc_id"""
    },
    "m3_frame_slices" ->
      """SELECT doc_id, frame_index,
                md5(substr(hx, frame_index * 64 + 1, 64)) AS frame_hash
         FROM (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents)
         CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS frame_index)
         ORDER BY doc_id, frame_index""",
    "m4_frame_dedup" ->
      s"""WITH frames AS (
            SELECT DISTINCT doc_id,
                   md5(substr(hx, frame_index * 64 + 1, 64)) AS frame_hash
            FROM (SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents)
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS frame_index))
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 COUNT(*) AS shared_frames
          FROM frames a JOIN frames b
            ON a.frame_hash = b.frame_hash AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING COUNT(*) >= $MinSharedFrames
          ORDER BY a_id, b_id""")
}
