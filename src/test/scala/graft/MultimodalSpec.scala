package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("media schema: binary column + typed metadata") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val sch = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("media") == "binary")
    assert(sch("mime") == "string")
    assert(sch("width") == "int" && sch("height") == "int")
    assert(media.where($"width" < 64 || $"height" < 64).count() == 0)
  }

  test("stub featurizer is deterministic and fixed-dim") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text").cache()
    val f1 = Multimodal.extractFeatures(spark, media, dim = 16).toDF()
    val f2 = Multimodal.extractFeatures(spark, media, dim = 16).toDF()
    assert(f1.where(size($"features") =!= 16).count() == 0)
    val joined = f1.as("a").join(f2.as("b"), $"a.id" === $"b.id")
      .where($"a.features" =!= $"b.features")
    assert(joined.count() == 0)
    // different content -> different features (hash property, spot check)
    assert(f1.select(countDistinct(element_at($"features", 1))).as[Long].collect()(0) > 10)
  }

  test("features join back to source rows losslessly") {
    val media = Multimodal.withFakeMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media, dim = 8).toDF()
    assert(feats.count() == docs.count())
    assert(docs.select($"doc_id".as("id")).join(feats, "id").count() == docs.count())
  }

  test("frame sampling explodes binary payloads with positions") {
    val media = Multimodal.withFakeMedia(docs.limit(5), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyNBytes = 64)
    assert(frames.columns.toSeq == Seq("id", "frame_no", "frame_b64"))
    assert(frames.count() >= 5)
    assert(frames.where($"frame_no" === 0).count() == 5)
  }
}
