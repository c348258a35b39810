package graft.sources

/** Global counter of DELETE-CONTENT reads — every decode of a Delta
  * deletion vector, puffin DV blob, or Iceberg position/equality
  * delete file bumps it. Exists for the scale contract the DSv2
  * connectors pin in their specs: PLANNING a scan must not read
  * delete content (descriptors ship in the InputPartitions; the
  * executors resolve them), so a spec can snapshot this counter
  * around `planInputPartitions` and assert it did not move.
  */
object DeleteAccess {
  val contentReads = new java.util.concurrent.atomic.AtomicLong(0L)
}
