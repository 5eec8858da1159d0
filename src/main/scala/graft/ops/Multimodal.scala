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
