package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `BINARY` columns with a typed metadata struct, and per-asset compute runs
  * as partition-local batch transforms.
  *
  * The actual codec step (JPEG decode, audio resample, …) needs native
  * libraries that are not in this container, so the decoders below are
  * DETERMINISTIC STUBS — they derive fake-but-stable features from the
  * bytes. Everything around them is the real engine surface: the asset
  * schema, the batch-shaped `mapPartitions` transform (the Scala analogue of
  * a `mapInPandas` batch UDF: amortize per-batch init, stream per-partition),
  * and the repartition-by-size guard that keeps giant blobs from skewing
  * partitions at 100 TB.
  */
object Multimodal {

  /** Canonical asset schema: id + modality + payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("content_type", StringType, nullable = true))), nullable = true)))

  /** Builds a synthetic asset table from `documents` (text bytes standing in
    * for media payloads) so the multimodal path is exercisable on the
    * fixtures: payload = utf-8 bytes, metadata derived deterministically.
    */
  def assetsFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(6)) * 64 + 64).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("n_chars"), lit(100)) + 1).cast("int").as("n_frames"),
        lit("application/octet-stream").as("content_type")).as("meta"))

  /** STUB decode: a real implementation hands `payload` to a codec. The
    * stable fake derives an 8-dim float feature vector from byte statistics
    * (xxhash64 of the payload re-hashed per dimension, scaled to [0,1)).
    * Runs as a codegen'd expression — no serialization cliff.
    */
  def stubDecodeFeatures(payload: org.apache.spark.sql.Column, dim: Int = 8): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(1000000L)).cast("double") / 1000000.0).cast("float"))

  /** Portable-stub decode for ONE feature dimension: the same stable
    * bytes→feature idea as [[stubDecodeFeatures]], but with the cross-engine
    * md5-prefix hash ([[TextOps.portableHash56]]) so a DuckDB oracle can
    * replay it bit-for-bit: `(hash56(payload_utf8 '#' dim) % 1e6) / 1e6`
    * as DOUBLE (fixture payloads are UTF-8 text standing in for media).
    */
  def stubDecodeFeaturePortable(
      payload: org.apache.spark.sql.Column,
      dim: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(
      TextOps.portableHash56(
        concat_ws("#", decode(payload, "UTF-8"), dim.cast("string"))),
      lit(1000000L)).cast("double") / lit(1000000.0)

  /** STUB resize: a real implementation re-encodes pixels; the stub slices
    * the payload to at most `maxBytes` (shape-preserving plumbing only).
    */
  def stubResize(assets: DataFrame, maxBytes: Int = 1024): DataFrame =
    assets.withColumn("payload",
      expr(s"substring(payload, 1, $maxBytes)").cast(BinaryType))

  /** Frame sampling plumbing for video assets: emits one row per sampled
    * frame index (every `stride`-th of `meta.n_frames`), payload-sliced
    * per frame by the stub. This is the row-explosion shape a real frame
    * extractor has; partitioning stays by asset so one huge video never
    * fans out across the cluster unkeyed.
    */
  def sampleFrames(assets: DataFrame, stride: Int = 10): DataFrame =
    assets
      .where(col("modality") === "video")
      .select(
        col("asset_id"),
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(stride)))
          .as("frame_idx"),
        col("payload"))
      .withColumn("frame_payload",
        expr("substring(payload, pmod(frame_idx * 16, greatest(length(payload), 1)) + 1, 16)"))
      .drop("payload")

  // -------------------------------------------------------------------
  // REAL codecs (round 6): one non-stub modality pair. The container has
  // no native media libraries, but the JDK itself ships two complete
  // codecs — ImageIO's BMP reader and javax.sound's WAV reader — so the
  // image and audio paths below are REAL: payloads are well-formed BMP /
  // RIFF-WAVE files, and decoding runs an actual third-party parser over
  // the bytes (any header, stride, padding, channel-order, or endianness
  // mistake produces garbage statistics, caught by the DuckDB oracle).
  // -------------------------------------------------------------------

  /** Encodes a 24-bit uncompressed BMP (bottom-up rows, BGR byte order,
    * 4-byte row padding) — the format ImageIO's BMPImageReader parses.
    */
  def encodeBmp24(width: Int, height: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Encodes a mono 16-bit little-endian PCM RIFF/WAVE file — the format
    * javax.sound.sampled.AudioSystem parses.
    */
  def encodeWavPcm16Mono(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic real-format asset table: per document, an actual BMP
    * (doc_id % 3 == 0; r constant = id%256, g = x, b = y — three distinct
    * channel patterns so a BGR/RGB or row-order bug shifts the statistics)
    * or an actual WAV (doc_id % 3 == 1; constant-amplitude PCM — an
    * endianness bug explodes the peak). Video (== 2) has no pure-JVM codec
    * and stays on the stub path. Payload bytes are built per partition —
    * the generate step of a real ingest, producing genuinely parseable
    * media files.
    */
  def realAssets(documents: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    documents.select("doc_id").mapPartitions { rows =>
      rows.flatMap { row =>
        val id = row.getLong(0)
        (id % 3) match {
          case 0 =>
            val w = 8 + (id % 8).toInt * 4
            val h = 8 + (id % 6).toInt * 4
            val bytes = encodeBmp24(w, h,
              (x, y) => ((id % 256).toInt, x % 256, y % 256))
            Some(Row(id, "image", bytes))
          case 1 =>
            val sr = 8000 + (id % 4).toInt * 4000
            val n = 200 + (id % 100).toInt
            val amp = ((id % 1000) + 1).toShort
            Some(Row(id, "audio", encodeWavPcm16Mono(sr, Array.fill(n)(amp))))
          case _ => None
        }
      }
    }(encoder)
  }

  /** REAL decode: images through `javax.imageio.ImageIO` (pixel-statistics
    * from the decoded raster), audio through
    * `javax.sound.sampled.AudioSystem` (format header + PCM scan). Batch
    * `mapPartitions` shape, schema all-scalar so the driver gate can sort
    * and hash it. Image rows carry width/height/mean_*, audio rows carry
    * sample_rate/n_samples/peak/duration_ms; the other modality's columns
    * are null.
    */
  def decodeReal(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("peak", DoubleType, nullable = true),
      StructField("duration_ms", DoubleType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(0)
        val modality = row.getString(1)
        val payload = row.getAs[Array[Byte]](2)
        modality match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            require(img != null, s"ImageIO could not decode asset $id")
            val w = img.getWidth
            val h = img.getHeight
            var sumR = 0L; var sumG = 0L; var sumB = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sumR += (p >> 16) & 0xff
                sumG += (p >> 8) & 0xff
                sumB += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h).toDouble
            Row(id, modality, w, h, sumR / n, sumG / n, sumB / n,
              null, null, null, null)
          case "audio" =>
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val fmt = in.getFormat
            val sr = fmt.getSampleRate.toInt
            val nFrames = in.getFrameLength
            val bytes = in.readAllBytes()
            in.close()
            var peak = 0
            var i = 0
            while (i + 1 < bytes.length) {
              val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
              val a = math.abs(s.toInt)
              if (a > peak) peak = a
              i += 2
            }
            Row(id, modality, null, null, null, null, null,
              sr, nFrames, peak.toDouble, nFrames * 1000.0 / sr)
          case other =>
            throw new IllegalArgumentException(s"no real codec for modality $other")
        }
      }
    }(encoder)
  }

  /** Batch feature extraction as a partition-local transform — the Scala
    * analogue of `mapInPandas`: per-partition init (a real codec would open
    * its native context here once), then row-streamed processing. Output:
    * (asset_id, modality, features ARRAY<FLOAT>).
    */
  def extractFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { rows =>
      // per-partition init happens here ONCE in a real decoder
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
        // STUB: stable bytes→features; a real impl calls the codec
        val features = Array.tabulate(dim) { i =>
          val h = scala.util.hashing.MurmurHash3.bytesHash(payload, i)
          ((h & Int.MaxValue).toDouble / Int.MaxValue).toFloat
        }
        Row(id, modality, features)
      }
    }(encoder)
  }
}
