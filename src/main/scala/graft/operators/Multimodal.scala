package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing here is real — schemas, partition-parallel
  * `mapPartitions` batching (the Scala analogue of `mapInPandas`),
  * explode-based frame sampling, deterministic output — while the codec
  * kernels are STUBS (byte-level stand-ins clearly marked below): actual
  * image/audio decode libraries are not available in this environment.
  * Swapping `stubDecodeFeatures` for a JNI/FFI decoder changes no
  * plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("declared_frames", IntegerType))))))

  /** Build a deterministic media table from any (id, text) DataFrame —
    * text bytes play the role of encoded media. */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("media"),
      struct(
        length(col(textCol)).cast("long").as("n_bytes"),
        (pmod(col(idCol), lit(7)) + 1).cast("int").as("declared_frames")).as("meta"))

  /** STUB decode kernel: 16-bin byte histogram, L1-normalized. A real
    * implementation decodes pixels/samples here; everything around it
    * (batching, schema, distribution) is production-shaped. */
  private def stubDecodeFeatures(bytes: Array[Byte], bins: Int): Array[Float] = {
    val h = new Array[Float](bins)
    bytes.foreach(b => h(math.floorMod(b.toInt, bins)) += 1f)
    val total = bytes.length.max(1)
    h.map(_ / total)
  }

  /** Feature extraction over the media column: partition-parallel
    * `mapPartitions` (one batch per partition — the `mapInPandas` shape),
    * emitting a fixed-width feature vector per row. */
  def extractFeatures(media: DataFrame, bins: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val mediaIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(idIdx), r.getString(kindIdx),
          stubDecodeFeatures(r.getAs[Array[Byte]](mediaIdx), bins).toSeq)
      }
    }(enc)
  }

  /** Frame sampling: split the payload into `meta.declared_frames` even
    * slices and explode one row per frame — pure expressions (substring
    * works on binary), no UDF, stays in codegen. */
  def sampleFrames(media: DataFrame): DataFrame = {
    val nf = col("meta.declared_frames")
    val frameLen = greatest((col("meta.n_bytes") / nf).cast("int"), lit(1))
    media
      .select(col("media_id"), col("kind"), col("media"), nf.as("n_frames"),
        frameLen.as("frame_len"))
      .select(col("media_id"), col("kind"), col("media"), col("frame_len"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        expr("substring(media, frame_idx * frame_len + 1, frame_len)").as("frame"))
      .filter(length(col("frame")) > 0)
  }

  /** "Resize" stub: cap payload bytes at `maxBytes` (a real resize
    * re-encodes; the truncation keeps the schema contract testable). */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("media", expr(s"substring(media, 1, $maxBytes)"))
      .withColumn("meta", struct(
        least(col("meta.n_bytes"), lit(maxBytes.toLong)).as("n_bytes"),
        col("meta.declared_frames").as("declared_frames")))
}
