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

  test("multi-image pooling: page vector is the element-wise mean of its image SET") {
    // the reference featurizes a record's whole image set (train_deeper.py:
    // 59-70, imagess/dir_image.py:94-152) — a multi-image page must pool
    // across ALL embedded data URIs, not just the first
    val b64 = java.util.Base64.getEncoder
    val img1 = Array.tabulate(256)(i => (i % 251).toByte)
    val img2 = Array.tabulate(300)(i => ((i * 7 + 3) % 255).toByte)
    def uri(b: Array[Byte]) = "data:image/png;base64," + b64.encodeToString(b)
    val rows = Seq(
      (1L, s"<html><img src='${uri(img1)}'><p>x</p><img src='${uri(img2)}'></html>"),
      (2L, s"<html><img src='${uri(img1)}'></html>"),
      (3L, "<html><img src='https://cdn.example.com/a.jpg'></html>"))
      .toDF("id", "h").select($"id", encode($"h", "UTF-8").as("html"))
    val got = rows.select($"id",
        Multimodal.imageVecFromHtml($"html", dim = 8).as("v"),
        Multimodal.imageVecsFromHtml($"html", dim = 8).as("vs"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Float](1).toArray,
          r.getSeq[scala.collection.Seq[Float]](2).toSeq.map(_.toArray)))
      .toMap
    def pool(b: Array[Byte]) = {
      val a = graft.functions.Similarity.avgPool(b, 8)
      Array.tabulate(8)(a.getFloat)
    }
    // two images → per-image vectors surface AND the page vector is their mean
    assert(got(1L)._2.length == 2)
    val expected = pool(img1).zip(pool(img2)).map { case (a, b) => (a + b) / 2.0f }
    got(1L)._1.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6f) }
    // one image → unchanged single-image semantics
    got(2L)._1.zip(pool(img1)).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6f) }
    // link-only images → empty vector (scorer zero-gates)
    assert(got(3L)._1.isEmpty && got(3L)._2.isEmpty)
  }

  test("frame sampling explodes binary payloads with positions") {
    val media = Multimodal.withFakeMedia(docs.limit(5), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyNBytes = 64)
    assert(frames.columns.toSeq == Seq("id", "frame_no", "frame_b64"))
    assert(frames.count() >= 5)
    assert(frames.where($"frame_no" === 0).count() == 5)
  }
}
