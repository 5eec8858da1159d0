package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private def assets = Multimodal.assetsFromDocuments(
    Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("asset table carries binary payload + typed metadata") {
    val df = assets
    assert(df.schema("payload").dataType.typeName == "binary")
    val row = df.where(col("asset_id") === 1).head()
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") > 0 && meta.getAs[Int]("n_frames") > 0)
    assert(df.select("modality").distinct().count() == 3)
  }

  test("feature extraction carries real decoded-content statistics") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val real = Multimodal.realAssets(docs).union(Multimodal.realVideoAssets(docs))
    val f1 = Multimodal.extractFeatures(real).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(real).orderBy("asset_id").collect()
    assert(f1.length == 500) // every document, all three modalities
    assert(f1.forall(_.getSeq[Float](2).length == 8))
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq, "must be deterministic")
    // features are DECODED statistics, not hashes: image width/height and
    // mean_r land in the vector exactly as the codec reports them
    f1.foreach { r =>
      val id = r.getLong(0)
      val f = r.getSeq[Float](2)
      r.getString(1) match {
        case "image" =>
          assert(f(0) == 1f && f(1) == (8 + (id % 8) * 4).toFloat
            && f(2) == (8 + (id % 6) * 4).toFloat && f(3) == (id % 256).toFloat)
        case "audio" =>
          assert(f(0) == 2f && f(1) == (8000 + (id % 4) * 4000).toFloat
            && f(3) == ((id % 1000) + 1).toFloat)
        case "video" =>
          assert(f(0) == 3f && f(1) == (2 + (id % 6)).toFloat
            && f(2) == (8 + (id % 5) * 4).toFloat && f(4) == (id % 256).toFloat)
      }
    }
    // opaque payloads (no codec) fall back to byte statistics, not hashes
    val spark2 = spark
    import spark2.implicits._
    val opaque = Seq((9L, "text", Array[Byte](0, 10, 20))).toDF("asset_id", "modality", "payload")
    val of = Multimodal.extractFeatures(opaque).head().getSeq[Float](2)
    assert(of(0) == 0f && of(1) == 3f && of(2) == 10f && of(3) == 20f && of(4) == 0f)
  }

  test("frame sampling explodes only videos at the configured stride") {
    val frames = Multimodal.sampleFrames(assets, stride = 10)
    val vids = assets.where(col("modality") === "video")
      .select(col("asset_id"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val counts = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == vids.keySet)
    counts.foreach { case (id, n) =>
      val expected = (vids(id) - 1) / 10 + 1
      assert(n == expected, s"asset $id: $n frames, want $expected")
    }
    val r = frames.head()
    assert(r.getAs[Array[Byte]]("frame_payload").length <= 16)
  }

  test("stub resize bounds payload size") {
    val resized = Multimodal.stubResize(assets, maxBytes = 64)
    val maxLen = resized.select(max(length(col("payload")))).head().getInt(0)
    assert(maxLen <= 64)
  }
}
