package org.apache.spark.sql.graftext

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's OWN parquet read machinery for the DataSourceV2
  * connectors ([[graft.sources.dsv2]]): a third-party `Batch` needs a
  * `PartitionedFile => Iterator[InternalRow]` function to run inside
  * its `PartitionReader`s, and `ParquetFileFormat
  * .buildReaderWithPartitionValues` is exactly that function —
  * vectorized decoding, predicate pushdown, partition-value append
  * and the row-index metadata column, identical to what
  * `FileSourceScanExec` ships to executors. Re-implementing a parquet
  * decoder would be slower and wrong; this is the same
  * `private[sql]`-access technique as [[Bridge]].
  */
object ParquetReadBridge {

  /** The temporary column name Spark's parquet readers recognize and
    * populate with each row's IN-FILE row index (correct under
    * row-group skipping and page-level predicate pushdown) — the
    * mechanism behind `_metadata.row_index`, and the mechanism the
    * DSv2 connectors use to apply deletion vectors / position
    * deletes.
    */
  val RowIndexColumn: String =
    ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** A serializable per-file reader function. `requiredSchema` may
    * include [[RowIndexColumn]] (LongType); output rows append
    * `partitionSchema`'s columns after the required data columns,
    * values taken from each [[PartitionedFile]]'s `partitionValues`.
    * `OPTION_RETURNING_BATCH=false` pins row-wise output (the
    * vectorized reader still decodes columnar internally and serves
    * rows off the batch).
    */
  def reader(
      spark: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String] = Map.empty)
      : PartitionedFile => Iterator[InternalRow] = {
    val hadoopConf =
      spark.sessionState.newHadoopConfWithOptions(options)
    new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = dataSchema,
      partitionSchema = partitionSchema,
      requiredSchema = requiredSchema,
      filters = filters,
      options = options + (FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = hadoopConf)
  }

  /** One whole-file [[PartitionedFile]] (start 0, length = file size):
    * the DSv2 connectors plan one slice per data file — parquet
    * row-group alignment inside `buildReaderWithPartitionValues`
    * handles the rest.
    */
  def wholeFile(
      partitionValues: InternalRow,
      absPath: String,
      fileSize: Long,
      modificationTime: Long): PartitionedFile =
    PartitionedFile(
      partitionValues = partitionValues,
      filePath = SparkPath.fromPathString(absPath),
      start = 0L,
      length = fileSize,
      locations = Array.empty,
      modificationTime = modificationTime,
      fileSize = fileSize)

  def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  /** Spark's own split-size formula (`FilePartition.maxSplitBytes`):
    * `min(maxPartitionBytes, max(openCostInBytes, totalBytes/cores))`
    * — big scans split at ~`spark.sql.files.maxPartitionBytes`
    * (row-group-aligned by the reader), small scans stay whole-file
    * (the open cost floor), and a medium scan spreads across the
    * cluster's parallelism.
    */
  def maxSplitBytes(spark: SparkSession, totalBytes: Long): Long = {
    val defaultMax = spark.sessionState.conf.filesMaxPartitionBytes
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val minPartitionNum = spark.sessionState.conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism)
    val bytesPerCore = totalBytes / math.max(1, minPartitionNum)
    math.min(defaultMax, math.max(openCost, bytesPerCore))
  }

  /** [[PartitionedFile]] byte-range chunks of one file, at most
    * `maxSplit` each. The reader decodes exactly the row groups whose
    * MIDPOINT lands in `[start, start+length)` (Spark's standard
    * split semantics), so the chunks of a file partition its rows
    * with no overlap and no gap, and the row-index metadata column
    * stays file-absolute — position deletes keep working per chunk.
    */
  def splitFile(
      partitionValues: InternalRow,
      absPath: String,
      fileSize: Long,
      modificationTime: Long,
      maxSplit: Long): Seq[PartitionedFile] =
    if (fileSize <= maxSplit || maxSplit <= 0L)
      Seq(wholeFile(partitionValues, absPath, fileSize, modificationTime))
    else (0L until fileSize by maxSplit).map { off =>
      PartitionedFile(
        partitionValues = partitionValues,
        filePath = SparkPath.fromPathString(absPath),
        start = off,
        length = math.min(maxSplit, fileSize - off),
        locations = Array.empty,
        modificationTime = modificationTime,
        fileSize = fileSize)
    }
}
