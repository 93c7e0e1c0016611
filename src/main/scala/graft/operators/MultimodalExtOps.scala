package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (opaque-binary) column pipeline (SURVEY.md §2B q54, ◐).
  *
  * Models the image/audio/video pattern for LLM training pipelines:
  * media payloads are carried as `binary` columns with typed metadata;
  * decode / feature-extraction runs per partition over the raw bytes.
  * No media codecs exist in this container, so the decoder is a STUB —
  * [[MediaStub.decode]] — a deterministic fake standing in for a real
  * JPEG/PCM decoder; the Spark-side plumbing (binary schema, partition
  * batching, feature struct output) is real and what the operator
  * verifies.
  *
  * Scale notes: the binary payload never shuffles — features are
  * extracted map-side and only the (narrow) feature rows move. With a
  * real decoder the same shape holds: decode cost dominates, so AQE
  * partition sizing on input bytes (`files.maxPartitionBytes`) is the
  * tuning knob, not the shuffle.
  */
object MultimodalExtOps extends OpModule {

  /** STUB media decoder: stands in for an image/audio codec. Emits
    * (byte count, 64-byte "thumbnail" checksum, rolling content hash). */
  object MediaStub extends Serializable {
    def decode(payload: Array[Byte]): (Int, Long, Long) = {
      var roll = 0L
      var i = 0
      while (i < payload.length) { roll = roll * 31 + (payload(i) & 0xff); i += 1 }
      var thumb = 0L
      var j = 0
      while (j < math.min(64, payload.length)) { thumb += (payload(j) & 0xff); j += 1 }
      (payload.length, thumb, roll)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_multimodal_decode" -> { (s, d) =>
      import s.implicits._
      val bin = Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
                encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, String, Array[Byte])]
      bin.mapPartitions { it =>
        it.map { case (id, lang, payload) =>
          val (nBytes, thumb, roll) = MediaStub.decode(payload)
          (id, lang, nBytes, thumb, roll)
        }
      }.toDF("doc_id", "lang", "n_bytes", "thumb_sum", "content_hash")
        .orderBy("doc_id")
    }
  )

  // ◐ — the rolling hash is not expressible in portable SQL; covered by
  // unit tests instead (MultimodalSpec).
  def oracles: Map[String, String] = Map.empty
}
