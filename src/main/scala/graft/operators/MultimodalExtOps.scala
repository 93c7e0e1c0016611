package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (opaque-binary) column pipeline (SURVEY.md §2B q54).
  *
  * Models the image/audio pattern for LLM training pipelines: media
  * payloads are carried as `binary` columns with typed metadata, and
  * decode / feature-extraction runs map-side over the raw bytes. No
  * media codecs ship in this container, so the payloads are
  * *synthesized* — real BMP (24 bpp) and WAV (PCM16 mono) files built
  * from the document text bytes — and [[MediaCodec.decode]] is a real
  * pure-JVM binary parser: it dispatches on the magic bytes, walks the
  * actual header fields (little-endian BMP header / RIFF chunk list),
  * and checksums the payload section. Nothing downstream sees the
  * synthesis: every output feature is recomputed from the container
  * bytes alone.
  *
  * Because the container formats are deterministic functions of the
  * payload length, the decoded structure has a closed form the oracle
  * can state in SQL (file size, row/sample counts, byte-sum checksum
  * over ASCII text) — so unlike round 1's stub this operator is fully
  * oracle-checked, while the unit tests additionally verify the binary
  * round-trip on raw byte arrays.
  *
  * Scale notes: the binary payload never shuffles — decode runs in
  * `mapPartitions` (a JVM codec kernel is the point here) and only the
  * narrow feature rows move. With a real JPEG/FLAC codec the same shape
  * holds: decode cost dominates, so AQE partition sizing on input bytes
  * (`files.maxPartitionBytes`) is the tuning knob, not the shuffle.
  */
object MultimodalExtOps extends OpModule {

  /** Pure-JVM media container codec: BMP (24 bpp, fixed 32-px-wide) and
    * WAV (PCM16 mono 8 kHz). Encode packs arbitrary bytes into a valid
    * file; decode parses the real header structure back. */
  object MediaCodec extends Serializable {
    private val BmpWidth = 32
    private val BmpRowBytes = BmpWidth * 3 // 96, already 4-byte aligned
    private val WavHeaderBytes = 44
    private val BmpHeaderBytes = 54

    private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    /** 24 bpp bottom-up BMP; payload bytes become pixel data, zero-padded
      * to whole 96-byte rows. */
    def encodeBmp(data: Array[Byte]): Array[Byte] = {
      val height = (data.length + BmpRowBytes - 1) / BmpRowBytes
      val imageSize = height * BmpRowBytes
      val out = new Array[Byte](BmpHeaderBytes + imageSize)
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, out.length)          // file size
      putLe32(out, 10, BmpHeaderBytes)     // pixel data offset
      putLe32(out, 14, 40)                 // BITMAPINFOHEADER size
      putLe32(out, 18, BmpWidth)
      putLe32(out, 22, height)
      putLe16(out, 26, 1)                  // planes
      putLe16(out, 28, 24)                 // bpp
      putLe32(out, 34, imageSize)
      System.arraycopy(data, 0, out, BmpHeaderBytes, data.length)
      out
    }

    /** PCM16 mono 8 kHz WAV; payload bytes become sample data,
      * zero-padded to a whole sample. */
    def encodeWav(data: Array[Byte]): Array[Byte] = {
      val samples = (data.length + 1) / 2
      val dataSize = samples * 2
      val out = new Array[Byte](WavHeaderBytes + dataSize)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putLe32(out, 4, 36 + dataSize)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putLe32(out, 16, 16)                 // fmt chunk size
      putLe16(out, 20, 1)                  // PCM
      putLe16(out, 22, 1)                  // mono
      putLe32(out, 24, 8000)               // sample rate
      putLe32(out, 28, 16000)              // byte rate
      putLe16(out, 32, 2)                  // block align
      putLe16(out, 34, 16)                 // bits/sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putLe32(out, 40, dataSize)
      System.arraycopy(data, 0, out, WavHeaderBytes, data.length)
      out
    }

    /** kind, total file bytes, structural units (BMP rows / WAV
      * samples), unsigned byte-sum checksum of the payload section. */
    final case class Media(kind: String, fileBytes: Long, units: Long,
                           checksum: Long)

    /** 24 bpp BMP with caller-chosen width (the public
      * [[encodeBmp]] is the corpus's fixed 32-px form). */
    private[MediaCodec] def encodeBmpDims(data: Array[Byte],
                                          width: Int): Array[Byte] = {
      val rowBytes = width * 3
      require(rowBytes % 4 == 0, s"row stride must be 4-aligned: $width px")
      val height = if (data.length == 0) 0
                   else (data.length + rowBytes - 1) / rowBytes
      val imageSize = height * rowBytes
      val out = new Array[Byte](BmpHeaderBytes + imageSize)
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, out.length)
      putLe32(out, 10, BmpHeaderBytes)
      putLe32(out, 14, 40)
      putLe32(out, 18, width)
      putLe32(out, 22, height)
      putLe16(out, 26, 1)
      putLe16(out, 28, 24)
      putLe32(out, 34, imageSize)
      System.arraycopy(data, 0, out, BmpHeaderBytes, data.length)
      out
    }

    /** 2× spatial downsample of a 24 bpp BMP CONTAINER (q111): parse
      * the real header, keep every other stored row and every other
      * pixel (whole BGR triplets), re-encode at half width — a valid
      * smaller BMP. "Stored row" order (bottom-up) is the sampling
      * grid; the phase is a constant, so the semantics are closed-form
      * in the payload length. */
    def downsampleBmp(file: Array[Byte]): Array[Byte] = {
      val offset = le32(file, 10)
      val width = le32(file, 18)
      val height = le32(file, 22)
      require(le16(file, 28) == 24, "expected 24 bpp")
      val rowBytes = width * 3
      val outW = width / 2
      val outRowBytes = outW * 3
      val outH = (height + 1) / 2
      val out = new Array[Byte](outH * outRowBytes)
      var r = 0
      while (r < outH) {
        var c = 0
        while (c < outW) {
          var b = 0
          while (b < 3) {
            out(r * outRowBytes + c * 3 + b) =
              file(offset + (2 * r) * rowBytes + (2 * c) * 3 + b)
            b += 1
          }
          c += 1
        }
        r += 1
      }
      encodeBmpDims(out, outW)
    }

    /** k× temporal decimation of a PCM16 WAV CONTAINER (q111): walk the
      * RIFF chunks to the data section, keep every k-th 16-bit sample,
      * re-encode — frame-sampling for audio/video-style media. */
    def decimateWav(file: Array[Byte], k: Int): Array[Byte] = {
      require(k >= 1)
      var off = 12
      var doff = -1
      var size = 0
      while (doff < 0 && off + 8 <= file.length) {
        val id = new String(file.slice(off, off + 4), "US-ASCII")
        val sz = le32(file, off + 4)
        if (id == "data") { doff = off + 8; size = sz }
        else off += 8 + sz + (sz & 1)
      }
      require(doff >= 0, "no RIFF data chunk")
      val samples = size / 2
      val outSamples = (samples + k - 1) / k
      val out = new Array[Byte](outSamples * 2)
      var s = 0; var o = 0
      while (s < samples) {
        out(2 * o) = file(doff + 2 * s)
        out(2 * o + 1) = file(doff + 2 * s + 1)
        s += k; o += 1
      }
      encodeWav(out)
    }

    /** Real container parse: dispatch on magic, read the header fields,
      * checksum the payload the header points at. Zero-padding added by
      * encode is checksum-neutral by construction. */
    def decode(bytes: Array[Byte]): Media = {
      def sum(from: Int, until: Int): Long = {
        var s = 0L; var i = from
        while (i < until) { s += bytes(i) & 0xff; i += 1 }
        s
      }
      if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
        val fileSize = le32(bytes, 2)
        val offset = le32(bytes, 10)
        val height = le32(bytes, 22)
        require(le16(bytes, 28) == 24, "expected 24 bpp")
        val imageSize = le32(bytes, 34)
        Media("bmp", fileSize.toLong, height.toLong,
              sum(offset, offset + imageSize))
      } else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
                 bytes(2) == 'F' && bytes(3) == 'F' &&
                 bytes(8) == 'W' && bytes(9) == 'A' &&
                 bytes(10) == 'V' && bytes(11) == 'E') {
        val fileSize = 8 + le32(bytes, 4)
        // walk the RIFF chunk list to the data chunk (a real parser —
        // does not assume a fixed 44-byte layout)
        var off = 12
        var media: Media = null
        while (media == null && off + 8 <= bytes.length) {
          val id = new String(bytes.slice(off, off + 4), "US-ASCII")
          val size = le32(bytes, off + 4)
          if (id == "data") {
            val blockAlign = 2 // parsed fmt would say the same; PCM16 mono
            media = Media("wav", fileSize.toLong, (size / blockAlign).toLong,
                          sum(off + 8, off + 8 + size))
          } else off += 8 + size + (size & 1)
        }
        require(media != null, "no RIFF data chunk")
        media
      } else throw new IllegalArgumentException("unknown container magic")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_multimodal_decode" -> { (s, d) =>
      import s.implicits._
      val bin = Tables(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      bin.mapPartitions { it =>
        it.map { case (id, payload) =>
          // even ids carry images, odd ids audio — the container bytes
          // are real; decode recomputes everything from them alone
          val file = if (id % 2 == 0) MediaCodec.encodeBmp(payload)
                     else MediaCodec.encodeWav(payload)
          val m = MediaCodec.decode(file)
          (id, m.kind, m.fileBytes, m.units, m.checksum)
        }
      }.toDF("doc_id", "kind", "file_bytes", "units", "checksum")
        .orderBy("doc_id")
    },

    // Media SHARD PACKING (added r12) — the step between q111's
    // transform and training: group media files into ~64 KB shards
    // (the webdataset/tar-shard layout every multimodal loader
    // consumes), the binary-size sibling of q91's token-budget
    // packing. Distributed the way real shard writers work: 8 WRITER
    // lanes (pmod of the id), each lane packs its OWN arrival-order
    // stream with an exclusive running-byte-total — shard =
    // cum_before div 64 KB, so an item straddling the boundary starts
    // the next shard (declared streaming-packer semantics, no
    // rebalancing lookahead). The cumulative window parallelizes
    // across lanes (never a global ordered window — the q141
    // one-reducer objection); shard ids are (lane, local seq), which
    // is exactly how concurrent writers name shards without
    // coordination. File sizes come from the real decode path (q54's
    // codec), closed-form mirrored by the oracle.
    "q189_media_shards" -> { (s, d) =>
      val sized = queries("q54_multimodal_decode")(s, d)
        .select(col("doc_id"), col("kind"), col("file_bytes"))
        .withColumn("lane", pmod(col("doc_id"), lit(8)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lane").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
                       .unboundedPreceding, -1)
      sized
        .withColumn("cum_before",
          coalesce(sum(col("file_bytes")).over(w), lit(0L)))
        .withColumn("shard", expr("cum_before div 65536"))
        .groupBy("lane", "shard")
        .agg(count(lit(1)).as("n_files"),
             sum(col("file_bytes")).as("shard_bytes"),
             sum(when(col("kind") === "bmp", 1L).otherwise(0L))
               .as("n_images"),
             sum(when(col("kind") === "wav", 1L).otherwise(0L))
               .as("n_audio"))
        .orderBy("lane", "shard")
    },

    // Multimodal TRANSFORM pipeline (added r9) — the resize /
    // frame-sample stage between decode and feature extraction:
    // parse the real container, transform the media (images: 2×
    // spatial downsample keeping every other row and pixel; audio: 4×
    // temporal decimation keeping every 4th sample), re-encode a
    // valid smaller container, then decode THAT and emit its stats —
    // everything recomputed from bytes, map-side, in one typed
    // mapPartitions pass; neither the original nor the transformed
    // payload ever shuffles. With a real JPEG resize or video
    // frame-sampler the shape is identical: transform cost dominates,
    // partition sizing on input bytes is the knob. Both transforms
    // are deterministic functions of payload length, so the
    // transformed container's size/units/checksum stay closed-form —
    // fully oracled.
    "q111_multimodal_transform" -> { (s, d) =>
      import s.implicits._
      val bin = Tables(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      bin.mapPartitions { it =>
        it.map { case (id, payload) =>
          val file = if (id % 2 == 0) MediaCodec.encodeBmp(payload)
                     else MediaCodec.encodeWav(payload)
          val transformed =
            if (id % 2 == 0) MediaCodec.downsampleBmp(file)
            else MediaCodec.decimateWav(file, 4)
          val m = MediaCodec.decode(transformed)
          (id, m.kind, m.fileBytes, m.units, m.checksum)
        }
      }.toDF("doc_id", "kind", "out_bytes", "out_units", "out_checksum")
        .orderBy("doc_id")
    }
  )

  // Fully oracled (round 1 was ◐): the container formats are
  // deterministic in payload length, and the corpus text is pure ASCII
  // (verified at all SFs), so file size / units / byte-sum checksum
  // have closed forms over strlen(text) and code-point sums.
  def oracles: Map[String, String] = Map(
    "q54_multimodal_decode" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN 54 + 96 * CAST(ceil(strlen(text) / 96.0) AS BIGINT)
        |       ELSE 44 + 2 * CAST(ceil(strlen(text) / 2.0) AS BIGINT)
        |  END AS file_bytes,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN CAST(ceil(strlen(text) / 96.0) AS BIGINT)
        |       ELSE CAST(ceil(strlen(text) / 2.0) AS BIGINT)
        |  END AS units,
        |  CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
        |                                        i -> unicode(substr(text, i, 1)))),
        |                0) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q189_media_shards" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 54 + 96 * CAST(ceil(strlen(text) / 96.0) AS BIGINT)
        |         ELSE 44 + 2 * CAST(ceil(strlen(text) / 2.0) AS BIGINT)
        |    END AS file_bytes,
        |    doc_id % 8 AS lane
        |  FROM documents),
        |c AS (SELECT *,
        |    coalesce(sum(file_bytes) OVER (PARTITION BY lane
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS cum_before
        |  FROM f)
        |SELECT lane, CAST(cum_before // 65536 AS BIGINT) AS shard,
        |  count(*) AS n_files,
        |  CAST(sum(file_bytes) AS BIGINT) AS shard_bytes,
        |  CAST(sum(CASE WHEN kind = 'bmp' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_images,
        |  CAST(sum(CASE WHEN kind = 'wav' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_audio
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the transform is a deterministic function of payload length:
    // kept BMP bytes are (even stored row, even pixel) positions —
    // (i-1)//96 is the row, ((i-1)%96)//3 the pixel; kept WAV bytes
    // are every 4th 16-bit sample — (i-1)//2 is the sample index.
    // Positions past strlen are encode padding (zero, checksum-neutral)
    "q111_multimodal_transform" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN 54 + 48 * CAST(ceil(ceil(strlen(text) / 96.0) / 2.0) AS BIGINT)
        |       ELSE 44 + 2 * CAST(ceil(ceil(strlen(text) / 2.0) / 4.0) AS BIGINT)
        |  END AS out_bytes,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN CAST(ceil(ceil(strlen(text) / 96.0) / 2.0) AS BIGINT)
        |       ELSE CAST(ceil(ceil(strlen(text) / 2.0) / 4.0) AS BIGINT)
        |  END AS out_units,
        |  CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1),
        |    i -> CASE
        |           WHEN doc_id % 2 = 0
        |                AND ((i - 1) // 96) % 2 = 0
        |                AND (((i - 1) % 96) // 3) % 2 = 0
        |             THEN unicode(substr(text, i, 1))
        |           WHEN doc_id % 2 = 1 AND ((i - 1) // 2) % 4 = 0
        |             THEN unicode(substr(text, i, 1))
        |           ELSE 0
        |         END)), 0) AS BIGINT) AS out_checksum
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
