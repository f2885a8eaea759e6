package graft

import graft.model.Tables
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.syntheticMedia(Tables.documents(spark, sf)).cache()

  test("media schema: binary content + typed metadata") {
    val sch = media.schema
    assert(sch("content").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "map")
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic, unit-L1, fixed-dim") {
    val f1 = Multimodal.extractFeatures(media).collect()
    val f2 = Multimodal.extractFeatures(media).collect()
    assert(f1.map(_.id).sorted.sameElements(f2.map(_.id).sorted))
    f1.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3)
      assert(f.n_bytes > 0)
    }
    val m1 = f1.map(f => f.id -> f.features.toSeq).toMap
    val m2 = f2.map(f => f.id -> f.features.toSeq).toMap
    assert(m1 == m2)
  }

  test("frame sampling emits strided frames for video rows only") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    val kinds = media.select("id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    frames.foreach { f =>
      assert(kinds(f.id) == "video")
      assert(f.frame_no % 2 == 0)
      assert(f.frame.length <= 64)
    }
  }

  test("resize truncates oversized images and tags metadata") {
    val resized = Multimodal.resizeImages(media, budget = 100).collect()
    resized.filter(_.kind == "image").foreach { r =>
      assert(r.content.length <= 100)
      if (r.meta.contains("resized")) assert(r.content.length == 100)
    }
    // non-images untouched
    assert(resized.filter(_.kind != "image").forall(!_.meta.contains("resized")))
  }
}
