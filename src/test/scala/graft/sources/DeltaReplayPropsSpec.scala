package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.util.Random
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Generative check of the log-replay contract: for RANDOM action
  * histories (adds, removes, re-adds, multi-action commits, an
  * optional checkpoint at a random version), the reader's active set
  * at EVERY version must equal a 10-line reference model's fold — the
  * DeltaLogSpec fixtures only exercise one handcrafted history.
  */
class DeltaReplayPropsSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(
      "id", org.apache.spark.sql.types.LongType))).json

  private def metaData: String =
    s"""{"metaData":{"id":"prop","format":{"provider":"parquet","options":{}},"schemaString":"${schemaJson.replace("\"", "\\\"")}","partitionColumns":[],"configuration":{},"createdTime":1}}"""

  private sealed trait Act
  private case class Add(f: String) extends Act
  private case class Remove(f: String) extends Act

  private def actJson(a: Act): String = a match {
    case Add(f) =>
      s"""{"add":{"path":"$f","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
    case Remove(f) =>
      s"""{"remove":{"path":"$f","deletionTimestamp":1,"dataChange":true}}"""
  }

  /** Model: fold the history to the active set at each version. */
  private def model(history: Seq[Seq[Act]]): Seq[Set[String]] =
    history.scanLeft(Set.empty[String]) { (s, commit) =>
      commit.foldLeft(s) {
        case (st, Add(f)) => st + f
        case (st, Remove(f)) => st - f
      }
    }.drop(1)

  private def writeTable(history: Seq[Seq[Act]], ckptAt: Option[Int]): Path = {
    val table = Files.createTempDirectory("delta_prop")
    val dir = table.resolve("_delta_log")
    Files.createDirectories(dir)
    // one real (empty-schema-compatible) parquet per referenced file
    val allFiles = history.flatten.collect { case Add(f) => f }.distinct
    allFiles.foreach { f =>
      val tmp = Files.createTempDirectory("dp_part")
      Seq(1L).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val s = Files.list(tmp)
        try s.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      Files.move(part, table.resolve(f))
    }
    history.zipWithIndex.foreach { case (commit, v) =>
      val head = if (v == 0)
        Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          metaData)
      else Nil
      Files.write(
        dir.resolve(f"$v%020d.json"),
        (head ++ commit.map(actJson))
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }
    ckptAt.foreach { v =>
      // author the checkpoint via the WRITER's own compaction over a
      // truncated view, then restore the later commits: simplest
      // protocol-faithful route is DeltaExport.checkpoint on a copy
      val laterCommits = ((v + 1) until history.size).map { w =>
        val p = dir.resolve(f"$w%020d.json")
        val bytes = Files.readAllBytes(p)
        Files.delete(p)
        (w, bytes)
      }
      DeltaExport.checkpoint(spark, table.toString)
      // delete the subsumed JSON to prove the checkpoint is the base
      (0 to v).foreach(w => Files.delete(dir.resolve(f"$w%020d.json")))
      laterCommits.foreach { case (w, bytes) =>
        Files.write(dir.resolve(f"$w%020d.json"), bytes)
      }
    }
    table
  }

  test("random histories: reader active set equals the model at every version") {
    val rnd = new Random(7)
    for (trial <- 1 to 4) {
      val pool = (0 until 6).map(i => s"f$i.parquet")
      var live = Set.empty[String]
      val history = (0 until (3 + rnd.nextInt(4))).map { _ =>
        (0 until (1 + rnd.nextInt(3))).flatMap { _ =>
          if (live.nonEmpty && rnd.nextBoolean()) {
            val f = live.toSeq(rnd.nextInt(live.size))
            live -= f
            Seq(Remove(f): Act)
          } else {
            val f = pool(rnd.nextInt(pool.size))
            live += f
            Seq(Add(f): Act)
          }
        }
      }
      val ckptAt =
        if (trial % 2 == 0) Some(rnd.nextInt(history.size)) else None
      val table = writeTable(history, ckptAt)
      val want = model(history)
      val checkFrom = ckptAt.map(_.toInt).getOrElse(0)
      for (v <- checkFrom until history.size) {
        val got = DeltaLog.activeFiles(spark, table.toString, Some(v.toLong))
          .collect().map(_.getString(0))
          .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
        assert(got == want(v),
          s"trial $trial ckpt=$ckptAt version $v: got $got want ${want(v)}")
      }
      // and the data read at latest returns one row per active file
      val n = DeltaLog.read(spark, table.toString).count()
      assert(n == want.last.size.toLong,
        s"trial $trial: read ${n} rows, expected ${want.last.size}")
    }
  }
}
