package graft.ops

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 non-stub multimodal path: real BMP/WAV bytes decoded by the
  * JDK's own codecs. These specs prove the decode is genuine — exact pixel
  * and sample round-trips through ImageIO / javax.sound, not statistics
  * that a fake could fabricate.
  */
class RealCodecSpec extends AnyFunSuite with SparkFixture {

  test("encoded BMP round-trips exact pixels through ImageIO") {
    // distinct value in every channel of every pixel, non-multiple-of-4
    // width so row padding is exercised
    val (w, h) = (5, 3)
    def px(x: Int, y: Int): (Int, Int, Int) = (x * 40 + y, 200 - x, x + y * 50)
    val bytes = Multimodal.encodeBmp24(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must recognize the BMP")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val got = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      assert(got == px(x, y), s"pixel ($x,$y)")
    }
  }

  test("encoded WAV round-trips format and exact samples through javax.sound") {
    val samples = Array[Short](1, -2, 300, -32768, 32767, 0, 12345)
    val bytes = Multimodal.encodeWavPcm16Mono(11025, samples)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(in.getFormat.getSampleRate == 11025f)
    assert(in.getFormat.getChannels == 1)
    assert(in.getFormat.getSampleSizeInBits == 16)
    assert(in.getFrameLength == samples.length.toLong)
    val data = in.readAllBytes()
    val decoded = Array.tabulate(samples.length) { i =>
      (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff)).toShort
    }
    assert(decoded.toSeq == samples.toSeq)
  }

  test("decodeReal produces the closed-form statistics on the fixture") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Multimodal.decodeReal(Multimodal.realAssets(docs))
      .orderBy("asset_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      r.getString(1) match {
        case "image" =>
          val w = 8 + (id % 8).toInt * 4
          val h = 8 + (id % 6).toInt * 4
          assert(r.getInt(r.fieldIndex("width")) == w)
          assert(r.getInt(r.fieldIndex("height")) == h)
          assert(r.getDouble(r.fieldIndex("mean_r")) == (id % 256).toDouble)
          assert(r.getDouble(r.fieldIndex("mean_g")) ==
            (h.toLong * (w.toLong * (w - 1) / 2)).toDouble / (w.toLong * h))
        case "audio" =>
          val sr = 8000 + (id % 4).toInt * 4000
          val n = 200L + (id % 100)
          assert(r.getInt(r.fieldIndex("sample_rate")) == sr)
          assert(r.getLong(r.fieldIndex("n_samples")) == n)
          assert(r.getDouble(r.fieldIndex("peak")) == ((id % 1000) + 1).toDouble)
        case other => fail(s"unexpected modality $other")
      }
    }
    // the fixture's 500 docs split ~1/3 image, ~1/3 audio, video excluded
    assert(out.count(_.getString(1) == "image") > 100)
    assert(out.count(_.getString(1) == "audio") > 100)
  }

  test("a corrupted payload fails decode instead of yielding fake features") {
    val bytes = Multimodal.encodeBmp24(4, 4, (_, _) => (1, 2, 3))
    bytes(0) = 'X'.toByte // break the BM magic
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img == null, "ImageIO must reject a non-BMP payload")
  }

  test("encoded animated GIF round-trips every frame's exact pixels") {
    // constant-color frames (each frame one palette entry) must survive the
    // writer's palettization bit-exactly; 3 frames with distinct colors so
    // a frame-indexing bug swaps statistics
    val colors = Array((10, 20, 30), (200, 0, 255), (7, 7, 7))
    val bytes = Multimodal.encodeGifFrames(6, 4, colors(_), colors.length)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getFormatName.toLowerCase.contains("gif"))
    assert(reader.getNumImages(true) == colors.length)
    for (k <- colors.indices) {
      val img = reader.read(k)
      assert(img.getWidth == 6 && img.getHeight == 4)
      for (y <- 0 until 4; x <- 0 until 6) {
        val p = img.getRGB(x, y)
        val got = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        assert(got == colors(k), s"frame $k pixel ($x,$y)")
      }
    }
    reader.dispose()
  }

  test("decodeRealVideoFrames yields the closed-form per-frame statistics") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Multimodal.decodeRealVideoFrames(Multimodal.realVideoAssets(docs))
      .orderBy("asset_id", "frame_idx").collect()
    assert(out.nonEmpty)
    val byAsset = out.groupBy(_.getLong(0))
    byAsset.foreach { case (id, frames) =>
      assert(frames.length == 2 + (id % 6).toInt, s"asset $id frame count")
      frames.foreach { r =>
        val k = r.getInt(1)
        assert(r.getInt(2) == 8 + (id % 5).toInt * 4)
        assert(r.getInt(3) == 8 + (id % 4).toInt * 4)
        assert(r.getDouble(4) == (id % 256).toDouble, s"asset $id frame $k mean_r")
        assert(r.getDouble(5) == ((7 * k + 13) % 256).toDouble)
        assert(r.getDouble(6) == ((11 * k + 5) % 256).toDouble)
      }
    }
  }

  test("a corrupted GIF payload is rejected by the video decoder") {
    val spark2 = spark
    import spark2.implicits._
    val good = Multimodal.encodeGifFrames(4, 4, _ => (1, 2, 3), 2)
    val bad = good.clone(); bad(0) = 'X'.toByte // break the GIF magic
    val assets = Seq((1L, "video", bad)).toDF("asset_id", "modality", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeRealVideoFrames(assets).collect()
    }
    assert(e.getMessage != null)
  }
}
