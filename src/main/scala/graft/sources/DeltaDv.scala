package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.nio.{ByteBuffer, ByteOrder}

/** Delta DELETION VECTORS (PROTOCOL.md "Deletion Vector Format"): a
  * DV marks row INDEXES of one data file as deleted, so a row-level
  * DELETE is a metadata commit (remove + re-add of the same file with
  * a DV attached) instead of a data rewrite — the modern Delta
  * row-delete mechanism this module both READS ([[DeltaLog.read]])
  * and WRITES ([[DeltaExport.deleteWhere]]).
  *
  * Bitmap encoding is the PUBLIC 64-bit portable RoaringBitmap
  * serialization (RoaringFormatSpec): a little-endian i64 count of
  * 32-bit buckets, then per bucket a LE u32 high-key followed by the
  * standard 32-bit roaring serialization (cookie 12346/12347, array /
  * bitmap / run containers). This codec DECODES all three container
  * types and ENCODES array (<4096 values) and bitmap containers —
  * what a writer needs; run containers are a reader-side concern.
  *
  * On-disk DV file: one version byte (1), then per stored vector a
  * BIG-endian i32 data size, a LE i32 magic (1681511377), the
  * serialized bitmap, and a BIG-endian i32 CRC-32 of the
  * magic+bitmap bytes. Descriptors use the absolute-path storage
  * type (`"p"`), offset pointing at the size word. Round-trip is
  * pinned by spec; the byte layout follows PROTOCOL.md so real
  * readers have the documented shape to check.
  */
private[sources] object DeltaDv {

  val Magic = 1681511377

  // ---- 32-bit roaring (RoaringFormatSpec) ----

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347

  /** Serialize sorted distinct non-negative ints < 2^32 grouped by
    * container key (their high 16 bits). `values` are the low-16-bit
    * payloads per key, sorted.
    */
  private def write32(sorted: Array[Long]): Array[Byte] = {
    // group by high 16 bits of the 32-bit value
    val groups = sorted.map(_ & 0xFFFFFFFFL)
      .groupBy(v => ((v >> 16) & 0xFFFF).toInt).toSeq.sortBy(_._1)
      .map { case (k, vs) => k -> vs.map(v => (v & 0xFFFF).toInt) }
    val nC = groups.size
    val headerBytes = 4 + 4 + 4 * nC + 4 * nC // cookie + count + descr + offsets
    val bodyBytes = groups.map { case (_, vs) =>
      if (vs.length < 4096) 2 * vs.length else 8192
    }.sum
    val buf = ByteBuffer.allocate(headerBytes + bodyBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(SerialCookieNoRun)
    buf.putInt(nC)
    groups.foreach { case (k, vs) =>
      buf.putShort(k.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    var off = headerBytes
    groups.foreach { case (_, vs) =>
      buf.putInt(off)
      off += (if (vs.length < 4096) 2 * vs.length else 8192)
    }
    groups.foreach { case (_, vs) =>
      if (vs.length < 4096) vs.foreach(v => buf.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach(v => words(v >> 6) |= (1L << (v & 63)))
        words.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  /** Decode one 32-bit roaring bitmap from `buf` (positioned at its
    * cookie); returns the low-32-bit values, sorted.
    */
  private def read32(buf: ByteBuffer): Array[Long] = {
    val cookie = buf.getInt
    val (nC, runFlags) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, Some(flags))
      } else if (cookie == SerialCookieNoRun) {
        (buf.getInt, None)
      } else throw new IllegalStateException(
        s"not a roaring bitmap (cookie=$cookie)")
    val keys = new Array[Int](nC)
    val cards = new Array[Int](nC)
    (0 until nC).foreach { i =>
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
    }
    def isRun(i: Int): Boolean =
      runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
    // offsets section present when no-run cookie, or ≥4 containers
    val hasOffsets = runFlags.isEmpty || nC >= 4
    if (hasOffsets) (0 until nC).foreach(_ => buf.getInt)
    val out = Array.newBuilder[Long]
    (0 until nC).foreach { i =>
      val base = keys(i).toLong << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xFFFF
        (0 until nRuns).foreach { _ =>
          val start = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF
          (start to start + len).foreach(v => out += (base | v))
        }
      } else if (cards(i) <= 4096) {
        (0 until cards(i)).foreach(_ => out += (base | (buf.getShort & 0xFFFF)))
      } else {
        (0 until 1024).foreach { w =>
          val word = buf.getLong
          (0 until 64).foreach { b =>
            if ((word & (1L << b)) != 0) out += (base | (w * 64 + b))
          }
        }
      }
    }
    out.result()
  }

  // ---- 64-bit portable ----

  /** Serialize sorted distinct row indexes (< 2^63) as the 64-bit
    * portable format.
    */
  def serialize(sortedIndexes: Array[Long]): Array[Byte] = {
    val buckets = sortedIndexes.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val parts = buckets.map { case (hi, vs) => (hi, write32(vs)) }
    val total = 8 + parts.map(4 + _._2.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(parts.size.toLong)
    parts.foreach { case (hi, bytes) =>
      buf.putInt(hi.toInt)
      buf.put(bytes)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong
    (0L until n).flatMap { _ =>
      val hi = (buf.getInt.toLong & 0xFFFFFFFFL) << 32
      read32(buf).map(hi | _)
    }.toArray
  }

  // ---- DV file IO ----

  case class Descriptor(
      storageType: String, pathOrInlineDv: String, offset: Int,
      sizeInBytes: Int, cardinality: Long)

  /** Write one deletion vector into a fresh DV file under the table;
    * returns its absolute-path descriptor.
    */
  def writeFile(table: String, sortedIndexes: Array[Long]): Descriptor = {
    val bitmap = serialize(sortedIndexes)
    val data = ByteBuffer.allocate(4 + bitmap.length)
      .order(ByteOrder.LITTLE_ENDIAN)
      .putInt(Magic).put(bitmap).array()
    val crc = new java.util.zip.CRC32
    crc.update(data)
    val blob = ByteBuffer.allocate(1 + 4 + data.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
      .put(1.toByte) // file format version
      .putInt(data.length)
      .put(data)
      .putInt(crc.getValue.toInt)
      .array()
    val path = Paths.get(
      table, s"deletion_vector_${java.util.UUID.randomUUID()}.bin")
    Files.write(path, blob, StandardOpenOption.CREATE_NEW)
    Descriptor("p", path.toAbsolutePath.toString, 1, data.length,
      sortedIndexes.length.toLong)
  }

  /** Read a descriptor's deleted row indexes (absolute-path storage
    * only — `u`-storage z85 relative ids and `i`-storage inline
    * vectors are refused loudly by the caller).
    */
  def readFile(d: Descriptor): Array[Long] = {
    val bytes = Files.readAllBytes(
      Paths.get(d.pathOrInlineDv.replaceFirst("^file:/*", "/")))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(d.offset)
    val size = buf.getInt
    require(size == d.sizeInBytes,
      s"DV size mismatch: file says $size, descriptor ${d.sizeInBytes}")
    val data = new Array[Byte](size)
    buf.get(data)
    val crcStored = buf.getInt
    val crc = new java.util.zip.CRC32
    crc.update(data)
    require(crc.getValue.toInt == crcStored, "DV checksum mismatch")
    val dataBuf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = dataBuf.getInt
    require(magic == Magic, s"bad DV magic $magic")
    val bitmap = new Array[Byte](size - 4)
    dataBuf.get(bitmap)
    val got = deserialize(bitmap)
    require(got.length == d.cardinality,
      s"DV cardinality mismatch: ${got.length} vs ${d.cardinality}")
    got
  }
}
