package graft.sources

import java.nio.file.Files
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generative check of the MERGE-ON-READ contract (r13): random
  * interleavings of append / position-delete / equality-delete /
  * compaction, written through the REAL writer, must read back equal
  * to an in-memory reference model at every step. The model applies
  * the spec's rules directly: a position delete kills the condition's
  * CURRENT matches; an equality delete kills matching rows that
  * existed BEFORE it (sequence scope — later re-inserts survive);
  * compaction changes bytes, never rows.
  */
class IcebergMorPropsSpec extends SparkSpec {
  import spark.implicits._

  test("random append/pos-delete/eq-delete/compact histories equal the model") {
    for (seed <- Seq(5L, 29L, 83L)) {
      val rnd = new Random(seed)
      val t = Files.createTempDirectory(s"iceberg_mor_$seed")
        .resolve("t").toString
      var nextId = 0L
      def fresh(n: Int): Seq[(Long, Long)] =
        (0 until n).map { _ =>
          nextId += 1
          // grp deliberately collides across batches so equality
          // deletes hit multiple eras
          (nextId, rnd.nextLong(5L))
        }
      // model: the live rows
      var live = Vector.empty[(Long, Long)]
      val first = fresh(3 + rnd.nextInt(3))
      IcebergExport.create(first.toDF("id", "grp").coalesce(1), t)
      live ++= first

      def check(step: String): Unit = {
        val got = IcebergTable.read(spark, t).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == live.sorted,
          s"seed $seed after $step: got $got, model ${live.sorted}")
      }
      check("create")

      (1 to 8).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => // append (re-inserted grps must survive older deletes)
            val b = fresh(1 + rnd.nextInt(3))
            IcebergExport.append(b.toDF("id", "grp").coalesce(1), t)
            live ++= b
          case 1 => // position delete by id predicate
            val bound = nextId - rnd.nextInt(4).toLong
            IcebergExport.deleteWhere(spark, t, col("id") >= bound)
            live = live.filterNot(_._1 >= bound)
          case 2 => // equality delete on grp — scoped to PAST rows only
            val g = rnd.nextLong(5L)
            IcebergExport.deleteWhereEquality(spark, t, Seq(g).toDF("grp"))
            live = live.filterNot(_._2 == g)
          case 3 => // compaction — rows must not change
            IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024)
        }
        check(s"step $step (seed $seed)")
      }
      // time travel: the FIRST snapshot still shows the initial rows
      val s0 = IcebergTable.snapshotIds(t).head
      assert(IcebergTable.read(spark, t, Some(s0)).count() == first.size.toLong,
        s"seed $seed: time travel to the create snapshot drifted")
    }
  }
}
