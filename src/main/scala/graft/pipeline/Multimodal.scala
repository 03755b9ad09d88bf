package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing — north-star extension (BASELINE.json).
 *
 * Images/audio/video are opaque BINARY columns plus a typed metadata
 * struct, mirroring the FlowFile content-claim design (FlowFile.h:44-50):
 * metadata-only stages never deserialize payload bytes (Parquet column
 * pruning), and decode runs batched per partition.
 *
 * The decode step itself is STUBBED (no image/audio libs in this
 * container): `fakeDecode` derives deterministic pseudo-features from the
 * payload size — the Spark-side plumbing (schema, partition batching,
 * feature frame shape) is real and is what's under test.
 */
object Multimodal {

  /** Metadata struct carried beside the payload. */
  val metadataType: StructType = StructType(Seq(
    StructField("mimeType", StringType),
    StructField("sizeBytes", LongType),
    StructField("sourceUri", StringType)))

  /** Wrap a table into (id, payload BINARY, meta STRUCT). */
  def wrapBinary(df: DataFrame, idCol: Column, payloadCol: Column,
                 mime: String, sourceCol: Column): DataFrame =
    df.select(
      idCol.as("mmId"),
      payloadCol.cast("binary").as("payload"),
      struct(
        lit(mime).as("mimeType"),
        octet_length(payloadCol.cast("binary")).cast("long").as("sizeBytes"),
        sourceCol.cast("string").as("sourceUri")).as("meta"))

  /**
   * Batched per-partition decode — the `mapPartitions` shape a real
   * decoder (JNI/FFI image lib) would use: one library init per partition,
   * rows streamed through. The stub features are pure arithmetic on
   * sizeBytes so tests and oracles can verify the plumbing end-to-end.
   */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("mmId", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("nFrames", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex("mmId")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      // real decoder would initialize its native context HERE, once
      rows.map { r =>
        val id = r.getLong(idIdx)
        val size = r.getStruct(metaIdx).getLong(1)
        Row(id, fakeWidth(size), fakeHeight(size), fakeFrames(size))
      }
    }(encoder)
  }

  // Deterministic fake decode — stands in for the real pixel/sample probe.
  private def fakeWidth(size: Long): Long = size % 640 + 1
  private def fakeHeight(size: Long): Long = (size * 7) % 480 + 1
  private def fakeFrames(size: Long): Long = size / 100 + 1

  /** The same fake decode as Catalyst columns (for oracle-SQL parity). */
  def fakeWidthCol(size: Column): Column = size % 640 + 1
  def fakeHeightCol(size: Column): Column = (size * 7) % 480 + 1
  def fakeFramesCol(size: Column): Column = floor(size / 100) + 1

  /** Frame sampling plan for video-ish payloads: every `stride`-th frame —
    * explode stays narrow; downstream decode batches per partition. */
  def sampleFrames(df: DataFrame, nFramesCol: Column, stride: Int): DataFrame =
    df.withColumn("frameIdx",
      explode(sequence(lit(0L), (nFramesCol - 1) / stride * stride, lit(stride.toLong))))

  // --- content-claim pointers: the FlowFile content-claim design at
  // media scale (FlowFile.h:44-50). Payloads over `inlineMax` do NOT ride
  // through every shuffle as bytes — rows carry only the claim URI and
  // the decode stage materializes bytes per partition, exactly where the
  // one consumer that needs them runs. At 100 TB this is the difference
  // between shuffling metadata and shuffling the corpus. ---

  /** Split payloads into inline-vs-claim: small payloads stay inline
    * BINARY, large ones null out and are represented by `sourceUri` in
    * the metadata (the claim pointer). */
  def claimPointers(df: DataFrame, inlineMax: Long): DataFrame =
    df.withColumn("payload",
      when(col("meta.sizeBytes") <= inlineMax, col("payload")))

  private val readClaimUdf = udf((uri: String) =>
    if (uri == null) null
    else java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      uri.stripPrefix("file:")))
  )

  /** Materialize bytes at the consumer: inline payload if present, else
    * fetch the claim (local/Hadoop path — an object-store claim plugs in
    * behind the same column). Run AFTER filtering/joining so only
    * surviving rows fetch. */
  def materializePayload(inline: Column, claimUri: Column): Column =
    coalesce(inline, readClaimUdf(claimUri))
}
