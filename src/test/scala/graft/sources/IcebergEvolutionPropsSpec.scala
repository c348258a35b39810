package graft.sources

import java.nio.file.Files
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Generative check of schema evolution (the DeltaReplayPropsSpec
  * treatment): for RANDOM sequences of append / rename / add / drop
  * against the REAL writer, the reader must equal a reference model
  * keyed by FIELD-ID at every step — ids are the identity, names are
  * labels, pre-add files read null, dropped ids never resurface.
  */
class IcebergEvolutionPropsSpec extends SparkSpec {

  // model: rows are fieldId -> value; schema is (fieldId, name) in
  // order, every column LongType for simple exact compares (id 1 is
  // the never-dropped row key)
  private case class Model(
      fields: Vector[(Int, String)], rows: Vector[Map[Int, Long]],
      nextFieldId: Int, nextRowKey: Long, nextColId: Int)

  private def sparkSchema(m: Model): StructType =
    StructType(m.fields.map { case (_, n) => StructField(n, LongType) })

  test("random append/rename/add/drop histories equal the field-id model") {
    for (seed <- Seq(7L, 23L, 101L)) {
      val rnd = new Random(seed)
      val t = Files.createTempDirectory(s"iceberg_evo_prop_$seed")
        .resolve("t").toString
      var m = Model(Vector(1 -> "k", 2 -> "v"), Vector.empty, 3, 0L, 0)

      def appendRows(create: Boolean): Unit = {
        val n = 1 + rnd.nextInt(3)
        val newRows = (0 until n).map { _ =>
          val key = m.nextRowKey + 1
          m = m.copy(nextRowKey = key)
          m.fields.map { case (fid, _) =>
            fid -> (if (fid == 1) key else rnd.nextLong(1000L))
          }.toMap
        }.toVector
        val df = spark.createDataFrame(
          newRows.map(r =>
            Row.fromSeq(m.fields.map { case (fid, _) => r(fid) })).asJava,
          sparkSchema(m))
        if (create) IcebergExport.create(df, t)
        else IcebergExport.append(df, t)
        m = m.copy(rows = m.rows ++ newRows)
      }

      appendRows(create = true)
      val nOps = 6 + rnd.nextInt(4)
      (0 until nOps).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => appendRows(create = false)
          case 1 => // rename a random column
            val i = rnd.nextInt(m.fields.size)
            val (fid, oldName) = m.fields(i)
            val nn = s"c${m.nextColId}"
            IcebergExport.renameColumn(t, oldName, nn)
            m = m.copy(
              fields = m.fields.updated(i, fid -> nn),
              nextColId = m.nextColId + 1)
          case 2 => // add a column (new field-id; old rows lack it)
            val nn = s"a${m.nextColId}"
            IcebergExport.addColumn(t, nn, LongType)
            m = m.copy(
              fields = m.fields :+ (m.nextFieldId -> nn),
              nextFieldId = m.nextFieldId + 1,
              nextColId = m.nextColId + 1)
          case 3 if m.fields.size > 2 => // drop a non-key column
            val i = 1 + rnd.nextInt(m.fields.size - 1)
            IcebergExport.dropColumn(t, m.fields(i)._2)
            m = m.copy(fields = m.fields.patch(i, Nil, 1))
          case _ => () // drop skipped at minimum width
        }
        // invariant after EVERY op: reader == model under current schema
        val got = IcebergTable.read(spark, t)
        assert(got.schema.fieldNames.toSeq == m.fields.map(_._2),
          s"seed $seed: schema drifted")
        val gotRows = got.collect().map(r =>
          m.fields.indices.map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))).toVector)
          .toVector.sortBy(_.head.get)
        val wantRows = m.rows.map(r =>
          m.fields.map { case (fid, _) => r.get(fid) }.toVector)
          .sortBy(_.head.get)
        assert(gotRows == wantRows,
          s"seed $seed: rows drifted\n got: $gotRows\nwant: $wantRows")
      }
    }
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
