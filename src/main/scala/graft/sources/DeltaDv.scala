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
  * bitmap / run containers). This codec DECODES and ENCODES all three
  * container types, picking the smallest per the spec's heuristic —
  * a 1M-row contiguous delete serializes as run containers in under
  * 100 bytes per 64K bucket, not 8 KiB bitmap blocks.
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
    *
    * Container choice per the spec's size heuristic: RUN when its
    * serialization (2 + 4·nRuns bytes) beats both alternatives,
    * otherwise ARRAY for cardinality ≤ 4096 (the spec's boundary —
    * exactly-4096 containers are stored as arrays, matching
    * [[read32]]'s `cards(i) <= 4096`), else an 8 KiB BITMAP. Run
    * emission makes a contiguous range-delete serialize in bytes,
    * not 8 KiB bitmap blocks.
    */
  private def write32(sorted: Array[Long]): Array[Byte] = {
    // group by high 16 bits of the 32-bit value
    val groups = sorted.map(_ & 0xFFFFFFFFL)
      .groupBy(v => ((v >> 16) & 0xFFFF).toInt).toSeq.sortBy(_._1)
      .map { case (k, vs) => k -> vs.map(v => (v & 0xFFFF).toInt) }
    val nC = groups.size
    // (start, extraLen) runs of consecutive values, per container
    def runsOf(vs: Array[Int]): Array[(Int, Int)] = {
      val out = Array.newBuilder[(Int, Int)]
      var start = vs(0); var prev = vs(0)
      vs.iterator.drop(1).foreach { v =>
        if (v != prev + 1) { out += ((start, prev - start)); start = v }
        prev = v
      }
      out += ((start, prev - start))
      out.result()
    }
    val runs = groups.map { case (_, vs) => runsOf(vs) }
    def altBytes(card: Int): Int = if (card <= 4096) 2 * card else 8192
    val asRun = groups.indices.map { i =>
      2 + 4 * runs(i).length < altBytes(groups(i)._2.length)
    }
    val anyRun = asRun.exists(identity)
    val bodyOf = groups.indices.map { i =>
      if (asRun(i)) 2 + 4 * runs(i).length else altBytes(groups(i)._2.length)
    }
    val runFlagBytes = if (anyRun) (nC + 7) / 8 else 0
    // offsets present for the no-run cookie, or with runs when nC >= 4
    val hasOffsets = !anyRun || nC >= 4
    val headerBytes = 4 + (if (anyRun) 0 else 4) + runFlagBytes +
      4 * nC + (if (hasOffsets) 4 * nC else 0)
    val buf = ByteBuffer.allocate(headerBytes + bodyOf.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    if (anyRun) {
      buf.putInt(SerialCookie | ((nC - 1) << 16))
      val flags = new Array[Byte](runFlagBytes)
      groups.indices.foreach { i =>
        if (asRun(i)) flags(i / 8) = (flags(i / 8) | (1 << (i % 8))).toByte
      }
      buf.put(flags)
    } else {
      buf.putInt(SerialCookieNoRun)
      buf.putInt(nC)
    }
    groups.foreach { case (k, vs) =>
      buf.putShort(k.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    if (hasOffsets) {
      var off = headerBytes
      bodyOf.foreach { b => buf.putInt(off); off += b }
    }
    groups.indices.foreach { i =>
      val vs = groups(i)._2
      if (asRun(i)) {
        buf.putShort(runs(i).length.toShort)
        runs(i).foreach { case (s, l) =>
          buf.putShort(s.toShort); buf.putShort(l.toShort)
        }
      } else if (vs.length <= 4096) vs.foreach(v => buf.putShort(v.toShort))
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

  // ---- z85 (ZeroMQ base85) — the encoding `u`/`i` storage uses ----

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Reverse: Array[Int] = {
    val r = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** 4-byte groups → 5 chars, big-endian per the z85 spec. */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 encodes 4-byte groups")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    bytes.grouped(4).foreach { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xFFL))
      val chars = new Array[Char](5)
      (4 to 0 by -1).foreach { i =>
        chars(i) = Z85Alphabet((v % 85).toInt); v /= 85
      }
      sb.appendAll(chars)
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups: '$s'")
    val out = new Array[Byte](s.length / 5 * 4)
    var o = 0
    s.grouped(5).foreach { g =>
      var v = 0L
      g.foreach { c =>
        val d = if (c < 128) Z85Reverse(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
      }
      (3 to 0 by -1).foreach { i => out(o + i) = (v & 0xFF).toByte; v >>= 8 }
      o += 4
    }
    out
  }

  // ---- DV file IO ----

  case class Descriptor(
      storageType: String, pathOrInlineDv: String, offset: Int,
      sizeInBytes: Int, cardinality: Long)

  /** Resolve a `u`-storage descriptor to its on-disk DV file: the
    * LAST 20 chars of pathOrInlineDv are the z85-encoded 16-byte
    * UUID, anything before them an optional directory prefix; the
    * file is `<table>/<prefix>/deletion_vector_<uuid>.bin`.
    */
  def uuidPath(table: String, pathOrInlineDv: String): String = {
    require(pathOrInlineDv.length >= 20,
      s"u-storage pathOrInlineDv too short: '$pathOrInlineDv'")
    val bytes = z85Decode(pathOrInlineDv.takeRight(20))
    val prefix = pathOrInlineDv.dropRight(20)
    val bb = ByteBuffer.wrap(bytes) // big-endian
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    (if (prefix.isEmpty) Paths.get(table, name)
    else Paths.get(table, prefix, name)).toAbsolutePath.toString
  }

  /** Decode an `i`-storage (inline) descriptor: pathOrInlineDv IS the
    * z85 of the magic+bitmap data (padded to a 4-byte boundary; the
    * descriptor's sizeInBytes is the unpadded length).
    */
  def readInline(d: Descriptor): Array[Long] = {
    val padded = z85Decode(d.pathOrInlineDv)
    require(padded.length >= d.sizeInBytes,
      s"inline DV shorter (${padded.length}) than declared ${d.sizeInBytes}")
    val data = java.util.Arrays.copyOf(padded, d.sizeInBytes)
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad inline DV magic $magic")
    val bitmap = new Array[Byte](d.sizeInBytes - 4)
    buf.get(bitmap)
    val got = deserialize(bitmap)
    require(got.length == d.cardinality,
      s"inline DV cardinality mismatch: ${got.length} vs ${d.cardinality}")
    got
  }

  /** Resolve ANY descriptor's deleted indexes (`p` absolute path, `u`
    * table-relative UUID, `i` inline).
    */
  def indexesOf(table: String, d: Descriptor): Array[Long] = {
    DeleteAccess.contentReads.incrementAndGet()
    d.storageType match {
      case "p" => readFile(d)
      case "u" => readFile(d.copy(
        storageType = "p", pathOrInlineDv = uuidPath(table, d.pathOrInlineDv)))
      case "i" => readInline(d)
      case other => throw new IllegalArgumentException(
        s"unknown deletion-vector storageType=$other: refused rather " +
          "than returning undeleted rows")
    }
  }

  /** (file blob, data length) for one vector — version byte, BE size,
    * LE magic + bitmap, BE CRC-32 of the data.
    */
  private def frame(sortedIndexes: Array[Long]): (Array[Byte], Int) = {
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
    (blob, data.length)
  }

  /** Write one deletion vector into a fresh DV file under the table;
    * returns its absolute-path (`p`) descriptor.
    */
  def writeFile(table: String, sortedIndexes: Array[Long]): Descriptor = {
    val (blob, dataLen) = frame(sortedIndexes)
    val path = Paths.get(
      table, s"deletion_vector_${java.util.UUID.randomUUID()}.bin")
    Files.write(path, blob, StandardOpenOption.CREATE_NEW)
    Descriptor("p", path.toAbsolutePath.toString, 1, dataLen,
      sortedIndexes.length.toLong)
  }

  /** Write one deletion vector in the `u` (table-relative z85 UUID)
    * storage delta-spark itself defaults to; same blob framing.
    */
  def writeFileU(table: String, sortedIndexes: Array[Long]): Descriptor = {
    val (blob, dataLen) = frame(sortedIndexes)
    val uuid = java.util.UUID.randomUUID()
    Files.write(
      Paths.get(table, s"deletion_vector_$uuid.bin"), blob,
      StandardOpenOption.CREATE_NEW)
    val bb = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits)
    Descriptor("u", z85Encode(bb.array()), 1, dataLen,
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
