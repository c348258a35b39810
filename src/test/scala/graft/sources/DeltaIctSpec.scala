package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IN-COMMIT TIMESTAMPS (PROTOCOL.md "In-Commit Timestamps") — the
  * r15-verdict interop gap: timestamp travel resolved file mtimes,
  * which are rewritten whenever a log is copied between object
  * stores; an ICT table declares each commit's timestamp INSIDE the
  * commit, immune to the copy. These specs pin:
  *  - every commit on an ICT table carries `inCommitTimestamp` as the
  *    FIRST action, strictly increasing (the monotonic floor
  *    prev + 1 even against a forged future predecessor);
  *  - timestamp travel prefers ICT: with mtimes deliberately
  *    SCRAMBLED to the wrong order, `versionAtTimestamp` still
  *    resolves every version correctly (the mtime path provably
  *    would not);
  *  - enablement on an existing table: protocol feature + the
  *    enablement version/timestamp properties, commitInfo value
  *    pinned equal to the property, pre-enablement commits still
  *    resolving via (monotonic) mtime;
  *  - `setProperties` refuses the bare property flip toward the
  *    real enablement path.
  */
class DeltaIctSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def df(ids: Range) = ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  private def commitLines(table: String, v: Long): Seq[String] =
    Files.readAllLines(
      Paths.get(table, "_delta_log", f"$v%020d.json"),
      StandardCharsets.UTF_8).asScala.toSeq

  private def ictOf(table: String, v: Long): Option[Long] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    commitLines(table, v).filter(_.startsWith("""{"commitInfo""""))
      .flatMap { l =>
        Option(mapper.readTree(l).get("commitInfo"))
          .flatMap(ci => Option(ci.get("inCommitTimestamp")))
          .map(_.asLong())
      }.headOption
  }

  test("ICT table: every commit stamped, commitInfo first, strictly increasing") {
    val t = tmp("ict_create")
    DeltaExport.create(df(0 until 5).coalesce(1), t, Nil,
      Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaExport.append(df(5 until 8).coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 1L)
    val icts = (0L to 2L).map(v => ictOf(t, v).getOrElse(
      fail(s"version $v missing inCommitTimestamp")))
    assert(icts == icts.sorted && icts.distinct.size == 3,
      s"ICTs must strictly increase: $icts")
    (0L to 2L).foreach { v =>
      assert(commitLines(t, v).head.startsWith("""{"commitInfo""""),
        s"version $v: commitInfo must be the FIRST action on an ICT table")
    }
    // protocol declares the writer feature
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.writerFeatures.contains("inCommitTimestamp"))
    assert(st.minWriter == 7)
    // the data still reads
    assert(DeltaLog.read(spark, t).count() == 7L)
  }

  test("timestamp travel prefers ICT: scrambled mtimes resolve correctly") {
    val t = tmp("ict_travel")
    DeltaExport.create(df(0 until 3).coalesce(1), t, Nil,
      Map("delta.enableInCommitTimestamps" -> "true"))
    Thread.sleep(5)
    DeltaExport.append(df(3 until 6).coalesce(1), t)
    Thread.sleep(5)
    DeltaExport.append(df(6 until 9).coalesce(1), t)
    val icts = (0L to 2L).map(v => ictOf(t, v).get)
    // SCRAMBLE the file mtimes into the reverse order — the exact
    // state a log copy produces; mtime resolution would now invert
    // every answer
    val dir = Paths.get(t, "_delta_log")
    (0L to 2L).foreach { v =>
      Files.setLastModifiedTime(
        dir.resolve(f"$v%020d.json"),
        FileTime.fromMillis(icts.last + 1000L * (3L - v)))
    }
    assert(DeltaLog.versionAtTimestamp(t, icts(0)) == 0L)
    assert(DeltaLog.versionAtTimestamp(t, icts(1)) == 1L)
    assert(DeltaLog.versionAtTimestamp(t, icts(1) + (icts(2) - icts(1)) / 2) == 1L)
    assert(DeltaLog.versionAtTimestamp(t, icts(2)) == 2L)
    assert(DeltaLog.readAsOfTimestamp(spark, t, icts(1)).count() == 6L)
    // history reports the ICTs, not the scrambled mtimes
    val hist = DeltaLog.history(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 2L).forall(v => hist(v) == icts(v.toInt)), hist.toString)
  }

  test("monotonic floor survives a forged FUTURE predecessor") {
    val t = tmp("ict_floor")
    DeltaExport.create(df(0 until 3).coalesce(1), t, Nil,
      Map("delta.enableInCommitTimestamps" -> "true"))
    // forge version 0's ICT a day into the future (a writer with a
    // broken clock): the NEXT commit must still order strictly after
    val forged = System.currentTimeMillis() + 86400000L
    val c0 = Paths.get(t, "_delta_log", f"${0L}%020d.json")
    val doctored = commitLines(t, 0L).map { l =>
      if (l.startsWith("""{"commitInfo"""))
        l.replaceAll(""""inCommitTimestamp":\d+""",
          s""""inCommitTimestamp":$forged""")
      else l
    }
    Files.write(c0, doctored.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    DeltaExport.append(df(3 until 5).coalesce(1), t)
    val ict1 = ictOf(t, 1L).get
    assert(ict1 == forged + 1L,
      s"next ICT must clamp to predecessor+1, got $ict1 vs forged $forged")
  }

  test("enablement on an existing table: boundary bookkeeping + mixed travel") {
    val t = tmp("ict_enable")
    DeltaExport.create(df(0 until 4).coalesce(1), t)
    DeltaExport.append(df(4 until 6).coalesce(1), t)
    // pre-enablement commits carry NO ict
    assert(ictOf(t, 0L).isEmpty && ictOf(t, 1L).isEmpty)
    val v = DeltaExport.enableInCommitTimestamps(spark, t)
    assert(v == 2L)
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.writerFeatures.contains("inCommitTimestamp"))
    assert(st.configuration("delta.enableInCommitTimestamps") == "true")
    assert(st.configuration("delta.inCommitTimestampEnablementVersion") == "2")
    val enableIct = ictOf(t, 2L).get
    assert(st.configuration("delta.inCommitTimestampEnablementTimestamp")
      == enableIct.toString,
      "enablement property and commitInfo value must agree")
    // post-enablement commits stamp automatically
    DeltaExport.append(df(6 until 7).coalesce(1), t)
    val ict3 = ictOf(t, 3L).get
    assert(ict3 > enableIct)
    // the boundary is monotone: enablement ICT clears every
    // mtime-derived pre-enablement timestamp
    val hist = DeltaLog.history(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist(2L) == enableIct && hist(1L) < enableIct && hist(3L) == ict3)
    assert(DeltaLog.versionAtTimestamp(t, enableIct) == 2L)
    assert(DeltaLog.versionAtTimestamp(t, ict3) == 3L)
    // idempotent re-enable is a no-op
    val before = DeltaLog.version(spark, t)
    DeltaExport.enableInCommitTimestamps(spark, t)
    assert(DeltaLog.version(spark, t) == before)
  }

  test("setProperties refuses the bare ICT property flip") {
    val t = tmp("ict_setprops")
    DeltaExport.create(df(0 until 3).coalesce(1), t)
    val e = intercept[IllegalArgumentException] {
      DeltaExport.setProperties(spark, t,
        Map("delta.enableInCommitTimestamps" -> "true"))
    }
    assert(e.getMessage.contains("enableInCommitTimestamps(spark, table)"))
  }
}
