package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, deterministic stub decode, batch-shaped
  * feature extraction, metadata transforms — all real except the codec.
  */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.syntheticMedia(
    spark, Catalog(spark, sf("sf0.001")).documents)

  test("media schema: binary payload + typed metadata struct") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val metaFields = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSet
    assert(metaFields == Set("width", "height", "sampleRate", "nFrames", "mime"))
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic and histogram-normalized") {
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.features.sameElements(b.features))
    }
    f1.foreach { f =>
      assert(f.dim == 16 && f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, s"histogram not normalized: ${f.features.sum}")
    }
  }

  test("feature extraction is partition-local (no shuffle in the plan)") {
    val plan = Multimodal.extractFeatures(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resize and frame sampling rewrite metadata, not payloads") {
    val resized = Multimodal.resize(spark, media, 16, 16).collect()
    assert(resized.forall(m => m.meta.width == 16 && m.meta.height == 16))
    val orig = media.collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(resized.forall(m => m.payload.toSeq == orig(m.media_id)))

    val sampled = Multimodal.sampleFrames(spark, media, 2).collect()
    val before = media.collect().map(m => m.media_id -> m).toMap
    sampled.foreach { m =>
      val b = before(m.media_id)
      if (m.kind == "video")
        assert(m.meta.nFrames == math.max(1, (b.meta.nFrames + 1) / 2))
      else assert(m.meta.nFrames == b.meta.nFrames)
    }
  }

  test("payload column is pruned for metadata-only queries") {
    val df = media.toDF()
    val q = df.select(col("media_id"), col("kind")).groupBy(col("kind")).count()
    assert(q.collect().map(_.getLong(1)).sum == 500)
  }
}
