package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payload with cycling kinds") {
    val media = Multimodal.mediaTable(spark, sfDir).collect()
    assert(media.length == 500)
    media.foreach { r =>
      assert(Seq("image", "audio", "video").contains(r.kind))
      assert(r.kind == Seq("image", "audio", "video")((r.media_id % 3).toInt))
      assert(r.payload.nonEmpty)
    }
  }

  test("partition-batched decode is deterministic and byte-derived") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val decoded = Multimodal.decodeAll(media).collect().map(d => d.media_id -> d).toMap
    val raw = media.collect().map(m => m.media_id -> m).toMap
    assert(decoded.keySet == raw.keySet)
    decoded.values.foreach { d =>
      val payload = raw(d.media_id).payload
      assert(d.n_bytes == payload.length.toLong)
      assert(d.width == 16 * (1 + (payload(0) & 0xff) % 64))
      assert(d.height == 16 * (1 + (payload(1) & 0xff) % 64))
      if (d.kind != "video") assert(d.n_frames == 1)
      assert(d.payload_sha.length == 16)
    }
    // decode twice -> identical (stub is deterministic)
    val again = Multimodal.decodeAll(media).collect().map(d => d.media_id -> d).toMap
    assert(again == decoded)
  }

  test("feature extraction yields unit-normalized fixed-width vectors") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(media, bins = 16).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, f.media_id)
      assert(f.features.forall(_ >= 0.0))
    }
    // deterministic
    val again = Multimodal.extractFeatures(media, bins = 16).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("resize bounds payloads to the target scale") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val orig = media.collect().map(m => m.media_id -> m.payload.length).toMap
    val small = Multimodal.resize(media, targetWidth = 64).collect()
    small.foreach { r =>
      assert(r.payload.length <= orig(r.media_id))
      assert(r.payload.nonEmpty)
      // prefix subsample: content is a prefix of the original
      val d = Multimodal.FakeCodec.decode(r)
      assert(d.n_bytes == r.payload.length.toLong)
    }
  }

  test("frame sampling keeps every stride-th chunk") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.frameSample(media, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(frames.nonEmpty)
    assert(frames.forall { case (_, frameNo, _) => frameNo % 2 == 0 })
    val raw = media.collect().map(m => m.media_id -> m.payload.length).toMap
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val expected = (0 until (raw(id) + 1023) / 1024).count(_ % 2 == 0)
      assert(fs.length == expected, s"media $id")
    }
  }
}
