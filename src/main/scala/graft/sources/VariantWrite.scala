package graft.sources

import org.apache.spark.sql.SparkSession

/** Variant-column WRITE posture (r17).
  *
  * Spark 4.1 SHREDS variant columns by default on parquet writes
  * (`spark.sql.variant.writeShredding.enabled` and
  * `spark.sql.variant.inferShreddingSchema` both default true),
  * emitting the Parquet Variant Shredding layout — a `typed_value`
  * group beside `metadata`/`value`. A shredded data file inside a
  * Delta table is only legal under the `variantShredding-preview`
  * table feature (delta-spark's own posture: unshredded unless
  * `delta.enableVariantShredding=true` opts the table in), so a
  * writer that lets the Spark default through while declaring only
  * `variantType` produces files a feature-respecting old reader
  * would misread (the shredded file's `value` field is null for
  * shredded-away fields).
  *
  * This engine's writers therefore pin their session to UNSHREDDED
  * variant emission at every staged data write (sticky, the
  * fieldId-read flag discipline), and shredded emission is an
  * explicit opt-in scope whose callers declare the table feature
  * ([[DeltaExport.createShredded]]). A shredded create must not run
  * concurrently with other writes in the SAME session — the flag is
  * session-scoped, not per-write.
  */
object VariantWrite {

  private val Key = "spark.sql.variant.writeShredding.enabled"
  private val Force = "spark.sql.variant.forceShreddingSchemaForTest"
  private val Marker = "graft.sql.variant.shreddedWrites"

  /** Engine write posture: unshredded, unless inside [[shredded]]. */
  def applyPosture(spark: SparkSession): Unit =
    if (!inShreddedScope(spark)) spark.conf.set(Key, "false")

  def inShreddedScope(spark: SparkSession): Boolean =
    spark.conf.getOption(Marker).contains("true")

  /** Run `body` (one shredded staged write) with shredding ON —
    * under `schemaDdl` when given (deterministic layout), else
    * Spark's shredding-schema inference — restoring the engine's
    * unshredded posture after.
    *
    * `schemaDdl` rides Spark's FOR-TESTING force conf, which only
    * handles narrow frames (the parquet write support misindexes its
    * row schema on wider ones — observed `Index 3 out of bounds for
    * length 3` at 4 columns); pass None (inference, the production
    * route) for anything beyond a small fixture.
    */
  def shredded[A](
      spark: SparkSession, schemaDdl: Option[String] = None)(body: => A): A = {
    spark.conf.set(Marker, "true")
    spark.conf.set(Key, "true")
    schemaDdl.foreach(spark.conf.set(Force, _))
    try body
    finally {
      spark.conf.unset(Marker)
      spark.conf.set(Key, "false")
      spark.conf.unset(Force)
    }
  }
}
