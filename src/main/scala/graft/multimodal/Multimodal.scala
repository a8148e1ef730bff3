package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run per-partition over
  * Arrow-sized batches (the Scala analogue of `mapInPandas`).
  *
  * PNG/JPEG decode is REAL — `ImageCodec` on `javax.imageio`, pure JVM,
  * exercised end-to-end by the oracle-gated m6 query. WAV/PCM decode is
  * real (`AudioCodec`, m8), and so is one COMPRESSED codec end-to-end:
  * G.711 µ-law through the JDK's FormatConversionProvider (m15), plus
  * real mp3 frame / mp4 box metadata walks (m13/m14, `ContainerMeta`).
  * `decodeStub` below remains only for the codec formats the JVM
  * genuinely cannot decode (mp3→PCM, mp4→frames — the container ships
  * no ffmpeg): it derives deterministic fake features from the raw
  * bytes so the Spark-side contract — schema, partitioning, batch
  * shape, feature columns — stays real and oracle-tested; swapping in a
  * JNI/ffmpeg decoder changes only the function body marked below.
  */
object Multimodal {

  /** The typed payload schema: binary blob + metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType))))))

  /** Wrap a string column as an opaque binary payload with metadata —
    * stands in for reading real media files into the lakehouse layout.
    */
  def asMedia(id: Column, text: Column, mime: String): Seq[Column] = Seq(
    id.as("media_id"),
    text.cast("binary").as("payload"),
    struct(lit(mime).as("mime"),
      (length(text) % 640).cast("int").as("width"),
      (length(text) % 480).cast("int").as("height"),
      // BYTE length of the payload, not character length of the text:
      // for multi-byte UTF-8 the two differ, and decodeStub's n_bytes
      // (length over binary) must agree with the metadata for the same
      // asset
      length(text.cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** ===== DECODE STUB =====
    * Deterministic fake "decode + feature extraction": byte length, a
    * 64-bit digest prefix of the payload, and a "thumbnail" (the first 8
    * bytes, hex). A real implementation replaces exactly these three
    * expressions with codec calls inside mapPartitions; everything
    * downstream (schema, grouping, joins) is unchanged.
    */
  def decodeStub(payload: Column): Column = struct(
    length(payload).cast("long").as("n_bytes"),
    substring(md5(payload), 1, 16).as("digest64"),
    hex(substring(payload, 1, 8)).as("thumb"))

  /** "Frame sampling": every stride-th byte window of the payload as one
    * frame row (video → frames exploded; audio → windows). Pure plan-side
    * — the explode distributes, no driver involvement. Frames surface as
    * hex so downstream joins/dedups treat them as plain strings.
    */
  def sampleFrames(df: DataFrame, payload: String, frameBytes: Int,
                   stride: Int): DataFrame = {
    // fail fast: stride = 0 would make the frame-count division null
    // (silently dropping every row) or an ANSI error; negative values
    // produce descending sequences and negative substring offsets
    require(stride > 0 && frameBytes > 0,
      s"sampleFrames needs stride > 0 and frameBytes > 0, got " +
        s"stride=$stride frameBytes=$frameBytes")
    // payloads shorter than one frame emit ZERO frames — a clamped index
    // would emit a truncated partial "frame" that downstream dedup counts
    df.filter(length(col(payload)) >= frameBytes)
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          floor((length(col(payload)) - frameBytes) / stride).cast("int"))))
      .withColumn("frame",
        hex(expr(s"substring($payload, frame_idx * $stride + 1, $frameBytes)")))
  }
}
