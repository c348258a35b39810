package graft.etl

import graft.SparkSpec

/** E9/F4 fixed-size binary chunking (reference lambda_3.py:93-114). */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def audio(id: Long, n: Int) =
    Chunker.Audio(id, Array.tabulate(n)(i => (i % 251).toByte))

  test("chunks are fixed-size with a 1-based numbered remainder") {
    val ds = Seq(audio(1L, 25), audio(2L, 10), audio(3L, 0)).toDS()
    val chunks = Chunker.chunk(ds, chunkSize = 10).collect()
    val ep1 = chunks.filter(_.episode_id == 1L).sortBy(_.chunk_num)
    assert(ep1.map(_.chunk_num).toSeq == Seq(1, 2, 3)) // lambda_3.py:97 1-based
    assert(ep1.map(_.bytes.length).toSeq == Seq(10, 10, 5))
    assert(chunks.count(_.episode_id == 2L) == 1)
    assert(!chunks.exists(_.episode_id == 3L)) // empty input → no chunks
  }

  test("reassembly round-trips the original bytes") {
    val orig = Seq(audio(1L, 12345), audio(2L, 9999))
    val back = Chunker.reassemble(Chunker.chunk(orig.toDS(), chunkSize = 1000))
      .collect().sortBy(_.episode_id)
    orig.zip(back).foreach { case (a, b) =>
      assert(a.episode_id == b.episode_id)
      assert(a.bytes.toSeq == b.bytes.toSeq)
    }
  }

  test("default chunk size matches the reference") {
    assert(Chunker.DefaultChunkSize == 10000000)
  }
}
