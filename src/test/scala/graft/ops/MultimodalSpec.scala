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

  test("stub feature extraction is deterministic with the right shape") {
    val f1 = Multimodal.extractFeatures(assets, dim = 8).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(assets, dim = 8).orderBy("asset_id").collect()
    assert(f1.length == 500)
    assert(f1.forall(_.getSeq[Float](2).length == 8))
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq, "must be deterministic")
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
