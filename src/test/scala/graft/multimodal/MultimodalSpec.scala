package graft.multimodal

import graft.SparkTestBase
import Multimodal._

class MultimodalSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      MediaItem(1L, "image", "PNGDATA-aaaaaaaaaaaa".getBytes("UTF-8"), 640, 480, 0L),
      MediaItem(2L, "audio", "RIFFDATA-bbbbbbbb".getBytes("UTF-8"), 0, 0, 1200L),
      MediaItem(3L, "video", ("MP4" * 40).getBytes("UTF-8"), 1920, 1080, 5000L)).toDS()
  }

  test("extractFeatures: schema, determinism, checksum") {
    val f1 = extractFeatures(corpus).collect().sortBy(_.media_id)
    val f2 = extractFeatures(corpus).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq) // stub is pure
    assert(f1.forall(_.feature.length == 8))
    assert(f1.find(_.media_id == 1).get.n_bytes == 20L)
    // checksum matches Spark's own md5 of the same bytes
    import org.apache.spark.sql.functions._
    val sparkMd5 = corpus.toDF().select(md5(col("payload"))).collect().map(_.getString(0)).toSet
    assert(f1.map(_.checksum).toSet == sparkMd5)
  }

  test("sampleFrames: only video, stride respected") {
    val frames = sampleFrames(corpus, stride = 7).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getLong(0) == 3L))
    val idx = frames.map(_.getInt(1)).sorted.toSeq
    assert(idx == idx.distinct && idx.forall(_ % 7 == 0))
  }

  test("resize: images re-encoded to target dims, other kinds untouched") {
    val out = resize(corpus, 64, 64).collect().sortBy(_.media_id)
    val img = out(0)
    assert(img.width == 64 && img.height == 64)
    assert(img.payload.length == 64 * 64 / 8 || img.payload.length == 20) // capped at source size
    // deterministic: same input → same bytes
    val again = resize(corpus, 64, 64).collect().sortBy(_.media_id).head
    assert(again.payload.toSeq == img.payload.toSeq)
    // audio/video pass through unchanged
    val orig = corpus.collect().sortBy(_.media_id)
    assert(out(1).payload.toSeq == orig(1).payload.toSeq)
    assert(out(2).width == 1920 && out(2).height == 1080)
  }

  test("payloads project to features before any wide op (plan shape)") {
    val feats = extractFeatures(corpus).toDF()
    // features are small fixed-size records — grouping them shuffles KBs,
    // not payloads; assert payload column is gone post-projection
    assert(!feats.columns.contains("payload"))
    val agg = feats.groupBy("kind").count().collect()
    assert(agg.map(_.getLong(1)).sum == 3L)
  }
}
