package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata tables (TESTDATA.md). One parquet file
  * per table under the scale-factor dir passed to every query.
  *
  * 100 TB posture: these reads are plain parquet scans, so Catalyst column
  * pruning + predicate pushdown reach the file scan (verify via
  * `.explain("formatted")` → `PushedFilters`/`ReadSchema`). At cluster
  * scale the same call works on a partitioned directory; nothing here
  * assumes a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
