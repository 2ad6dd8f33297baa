package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): `decodeStub` derives deterministic fake metadata/features
  * from the bytes. Everything around it — schema, partition-batched
  * iteration, feature shape — is the real plumbing a codec would plug
  * into: swap `decodeStub` for a real decoder and nothing else changes.
  *
  * Scale notes: media bytes never shuffle except keyed repartition; the
  * per-partition iterator is the Scala analog of a batched Pandas UDF
  * (`mapInPandas`) and amortizes decoder init per partition, not per row.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Build a media table from any (id, text) frame — stands in for real
    * image/audio bytes in tests; format derived from id. */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder — deterministic fake: "width/height" from byte
    * lengths, checksum = byte sum mod 2^31. A real implementation
    * would parse the codec header here; the signature is the contract. */
  private def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0L)
    else {
      val n = bytes.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
      ((n % 640) + 1, (n % 480) + 1, sum % Int.MaxValue)
    }
  }

  /** Partition-batched feature extraction over the media table. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media", "meta.format", "meta.n_bytes")
      .mapPartitions { rows =>
        // decoder init would happen once per partition here
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (w, h, sum) = decodeStub(bytes)
          Row(r.getLong(0), r.getString(2), r.getLong(3), w, h, sum)
        }
      }(enc)
  }

  /** Frame-sample stand-in: take every `stride`-th byte as a "frame"
    * feature vector (the batching/shape is what matters; a video
    * decoder slots in at decodeStub's seam). Bytes are exposed via a
    * latin-1 decode (bijective byte↔codepoint) since Spark can't index
    * a binary column directly. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val chars = split(decode(col("media"), "ISO-8859-1"), "")
    media.select(col("media_id"),
      transform(
        sequence(lit(0), greatest(floor(col("meta.n_bytes") / stride).cast("int") - 1, lit(0))),
        i => ascii(element_at(chars, i * stride + 1))).as("frame_bytes"))
  }
}
