package graft.multimodal

import graft.SparkSpec

/** Multimodal Dataset API: batch shape, determinism, frame explode. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  def fixture: org.apache.spark.sql.Dataset[Media.MediaRow] = Seq(
    Media.MediaRow(1L, "image", "img-bytes-1".getBytes, 640, 480, 0),
    Media.MediaRow(2L, "video", "vid-bytes-2".getBytes, 1280, 720, 0),
    Media.MediaRow(3L, "audio", "aud-bytes-3".getBytes, 0, 0, 16000))
    .toDS().repartition(2)

  test("feature extraction is deterministic and L1-normalized") {
    val f1 = Media.extractFeatures(fixture).collect().sortBy(_.media_id)
    val f2 = Media.extractFeatures(fixture).collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    f1.foreach { f =>
      assert(f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-5)
    }
  }

  test("frame sampling explodes videos to k frames, passthrough otherwise") {
    val frames = Media.sampleFrames(fixture, 4).collect()
    assert(frames.count(_.media_id == 2L) == 4)
    assert(frames.count(_.media_id == 1L) == 1)
    assert(frames.filter(_.media_id == 2L).map(_.frame_index).sorted.toSeq
      == Seq(0, 1, 2, 3))
    // distinct frames get distinct bytes
    assert(frames.filter(_.media_id == 2L)
      .map(_.frame_bytes.toSeq).distinct.length == 4)
  }

  test("resize rewrites metadata and preserves ids") {
    val r = Media.resize(fixture, 64, 64).collect().sortBy(_.media_id)
    assert(r.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(r.forall(m => m.width == 64 && m.height == 64))
  }

  test("decode stub is a pure function of bytes") {
    val a = Media.decodeStub("same".getBytes)
    val b = Media.decodeStub("same".getBytes)
    val c = Media.decodeStub("diff".getBytes)
    assert(a.toSeq == b.toSeq && a.toSeq != c.toSeq)
  }
}
