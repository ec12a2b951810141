package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus a batched decode/feature-extract stage.
  *
  * The decode step is a clearly-marked deterministic STUB (the sandbox has
  * no image/audio codecs); the Spark-side plumbing — schema, partition-wise
  * batched processing via typed `mapPartitions`, metadata derivation — is
  * real and tested. Swap [[MediaStub.decode]] for a codec call (or a
  * `mapInPandas`/`mapInArrow` stage in PySpark) to process real media.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, n_bytes: Long,
                            sha: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 sha: String, width: Long, height: Long,
                                 n_frames: Long)

  /** STUB decoder: deterministic fake dimensions from the payload size.
    * Replace with a real codec for production media. */
  object MediaStub {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val n = payload.length.toLong
      (n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1)
    }
  }

  /** documents → typed media rows (text payload as the opaque binary). */
  def mediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), lit("text/plain").as("kind"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        sha2(col("text"), 256).as("sha"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode: one stub-codec invocation per partition batch — the
    * shape a vectorized (Arrow/Pandas) UDF would take. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = MediaStub.decode(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.n_bytes, r.sha, w, h, f)
      }
    }
  }

  /** Full pipeline as a DataFrame (payload dropped for the compare). */
  def features(documents: DataFrame): DataFrame =
    extractFeatures(mediaTable(documents)).toDF()
      .select("doc_id", "kind", "n_bytes", "sha", "width", "height", "n_frames")
      .orderBy("doc_id")
}
