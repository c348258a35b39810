package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E11 (first half) — tar.gz archive source, completing the source
  * inventory: the reference downloads each Comprehend result archive and
  * untars it on a Lambda's local disk (`lambda_71.py:16-45`,
  * `lambda_72.py:16-40` — `tarfile.open(..., 'r:gz')`, then reads the
  * member named `output` as JSON lines). Here the archive bytes are a
  * `binaryFile` scan and the gunzip+untar runs inside a typed `flatMap`
  * — per-archive work distributes across executors, no local-disk
  * staging, no driver involvement.
  *
  * Scale note: one task decompresses one archive (gzip is inherently
  * sequential per stream), so parallelism = archive count — matching
  * the reference's one-Lambda-per-archive fan-out. Comprehend archives
  * are MB-scale; `binaryFile` caps at
  * `spark.sql.sources.binaryFile.maxLength` (2 GB default).
  *
  * The tar walk parses ustar headers directly (512-byte blocks, name at
  * [0,100), octal size at [124,136), typeflag at 156, name prefix at
  * [345,500)) — the format is a public POSIX standard and the JDK ships
  * no tar codec.
  */
object TarGz {

  case class TarEntry(archive: String, member: String, content: Array[Byte])

  /** All regular-file members of every `*.tar.gz` under `path`:
    * one row per member — (archive, member, content).
    */
  def readTarGz(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        untar(bytes).map { case (m, c) => TarEntry(p, m, c) }
      }
      .toDF()
  }

  /** Streaming form of `readTarGz` — the reference's actual trigger
    * model (S3 ObjectCreated on `.gz` suffix, `main.tf:612-621`,
    * firing `lambda_71`): archives dropped into the directory are
    * picked up incrementally by the file source and untarred in the
    * micro-batch, exactly once.
    */
  def readTarGzStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          "modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField(
          "length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "content", org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", "*.tar.gz")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        untar(bytes).map { case (m, c) => TarEntry(p, m, c) }
      }
      .toDF()
  }

  /** The reference's consumption shape (`lambda_71.py:36-40`): the
    * member named `member` decoded as text and split to one row per
    * JSON line, with the 0-based line index (the reference zips results
    * to sentences BY POSITION — W4). Output: (archive, line_index,
    * line).
    */
  def readJsonLines(
      spark: SparkSession, path: String, member: String = "output"): DataFrame =
    readTarGz(spark, path)
      .filter(col("member") === member)
      .select(
        col("archive"),
        posexplode(split(decode(col("content"), "UTF-8"), "\n")))
      .filter(col("col") =!= "")
      .select(
        col("archive"),
        col("pos").cast("long").as("line_index"),
        col("col").as("line"))

  /** Comprehend sentiment lines parsed to columns
    * (`lambda_71.py:77-81`): Sentiment + the four SentimentScore
    * fields, keyed by (archive, line_index).
    */
  def sentimentOutput(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromDDL(
      "struct<Sentiment: string, SentimentScore: struct<" +
        "Negative: double, Neutral: double, Positive: double, Mixed: double>>")
    readJsonLines(spark, path)
      .select(col("archive"), col("line_index"),
        from_json(col("line"), schema).as("j"))
      .select(
        col("archive"),
        col("line_index"),
        col("j.Sentiment").as("overall_sentiment"),
        col("j.SentimentScore.Negative").as("negative_score"),
        col("j.SentimentScore.Neutral").as("neutral_score"),
        col("j.SentimentScore.Positive").as("positive_score"),
        col("j.SentimentScore.Mixed").as("mixed_score"))
  }

  /** Comprehend ENTITIES archives (`lambda_72.py:16-41,49-50`): the
    * `output` member is one JSON document `{"Entities": [...]}` (not
    * lines). One row per entity with its archive-order index; offsets
    * feed the interval alignment (`Entities.align`).
    */
  def entitiesOutput(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromDDL(
      "struct<Entities: array<struct<" +
        "Text: string, Type: string, BeginOffset: bigint, EndOffset: bigint>>>")
    readTarGz(spark, path)
      .filter(col("member") === "output")
      .select(
        col("archive"),
        from_json(decode(col("content"), "UTF-8"), schema).as("j"))
      .select(
        col("archive"),
        posexplode(col("j.Entities")).as(Seq("entity_index", "e")))
      .select(
        col("archive"),
        col("entity_index").cast("long").as("entity_index"),
        col("e.Text").as("entity_text"),
        col("e.Type").as("entity_type"),
        col("e.BeginOffset").as("begin_off"),
        col("e.EndOffset").as("end_off"))
  }

  /** Decode one gzipped tar archive to its regular-file members. */
  private[sources] def untar(gz: Array[Byte]): Seq[(String, Array[Byte])] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(gz))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    try {
      var done = false
      while (!done) {
        val header = in.readNBytes(512)
        if (header.length < 512 || header.forall(_ == 0)) done = true
        else {
          val name0 = cstr(header, 0, 100)
          val prefix = cstr(header, 345, 155)
          val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
          val size = octal(header, 124, 12)
          val typeflag = header(156)
          val data = in.readNBytes(size.toInt)
          val pad = ((512 - size % 512) % 512).toInt
          if (pad > 0) in.readNBytes(pad)
          // '0' and NUL are regular files (ustar spec); dirs ('5'),
          // links etc. carry no member content for this source
          if (typeflag == '0'.toByte || typeflag == 0.toByte)
            out += name -> data
        }
      }
    } finally in.close()
    out.toSeq
  }

  /** NUL-terminated string field. */
  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    val end = b.indexWhere(_ == 0, off) match {
      case -1 => off + len
      case e => math.min(e, off + len)
    }
    new String(b, off, end - off, "US-ASCII").trim
  }

  /** Octal numeric field (NUL/space padded); empty → 0 (dir entries). */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    val s = new String(b, off, len, "US-ASCII")
      .filter(c => c >= '0' && c <= '7')
    if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
  }
}
