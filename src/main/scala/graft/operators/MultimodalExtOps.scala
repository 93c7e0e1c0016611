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

    /** q305's 64-bit difference hash (dHash) of a 24 bpp BMP
      * CONTAINER: parse the real header, sample a 8×9 grayscale grid
      * by nearest-neighbor over STORED rows (the downsampleBmp
      * precedent — bottom-up phase is a constant, so stored-row order
      * is the declared grid), gray = B+G+R byte sum (÷3 dropped — a
      * monotone map never flips the < below), bit(r,c) = gray(r,c) <
      * gray(r,c+1), r-major. Nearest-neighbor (not area-average)
      * keeps every sampled intensity an exact integer the oracle can
      * restate from the payload bytes. */
    def dHash(file: Array[Byte]): String = {
      val offset = le32(file, 10)
      val width = le32(file, 18)
      val height = le32(file, 22)
      require(le16(file, 28) == 24, "expected 24 bpp")
      val rowBytes = width * 3
      val imageSize = le32(file, 34)
      def gray(r: Int, c: Int): Int = {
        val bi = (r * height / 8) * rowBytes + (c * width / 9) * 3
        var g = 0; var b = 0
        while (b < 3) {
          if (bi + b < imageSize) g += file(offset + bi + b) & 0xff
          b += 1
        }
        g
      }
      val sb = new java.lang.StringBuilder(64)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          sb.append(if (gray(r, c) < gray(r, c + 1)) '1' else '0')
          c += 1
        }
        r += 1
      }
      sb.toString
    }

    /** q314's per-frame peak positions from a PCM16 WAV CONTAINER:
      * walk the RIFF chunks to the data section (the decode() parser's
      * walk — no fixed-layout assumption), frame the int16-LE samples
      * into COMPLETE 32-sample frames, and emit each frame's argmax
      * sample position (first index attaining the max — the declared
      * tie rule). The time-domain stand-in for a spectral peak picker:
      * with an FFT in the container the shape (map-side decode →
      * small integer features, payload never shuffles) is identical.
      * Samples here come from ASCII payload bytes so every value is
      * non-negative and the oracle restates the argmax closed-form
      * from the text bytes. */
    def audioPeaks(file: Array[Byte]): Array[Int] = {
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
      val frames = (size / 2) / 32
      Array.tabulate(frames) { f =>
        var best = Int.MinValue
        var bi = 0
        var j = 0
        while (j < 32) {
          val idx = doff + 2 * (f * 32 + j)
          val s0 = (file(idx) & 0xff) | (file(idx + 1) << 8)
          if (s0 > best) { best = s0; bi = j }
          j += 1
        }
        bi
      }
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

    // Perceptual-hash image dedup (added r13) — the MULTIMODAL twin
    // of q300's text SimHash join, and the operator an image-corpus
    // pipeline actually runs (pHash/dHash dedup of crawled images):
    // per image doc (even ids — the corpus's BMP carriers), a 64-bit
    // DIFFERENCE HASH computed from the DECODED container (real
    // header parse → 8×9 nearest-neighbor grayscale grid over stored
    // rows → 64 horizontal-gradient sign bits, [[MediaCodec.dHash]]),
    // then Manku's pigeonhole multi-index verbatim from q300: 4×16-bit
    // bands (Hamming ≤ 3 ⇒ one band equal, exactly), hot-bucket cap,
    // exact 64-position verify on candidates only. The decode+hash is
    // ONE typed mapPartitions pass — payload bytes never shuffle, only
    // 64-char fingerprints move; with a real JPEG decoder the shape
    // (and the oracle-free parts of the cost model) are identical.
    // The container is a deterministic function of the payload, so
    // the oracle restates the sampled grid closed-form from the text
    // bytes — the whole decode→hash→band→verify chain is hash-exact.
    "q305_phash_dedup" -> { (s, d) =>
      import s.implicits._
      val pinned = org.apache.spark.sql.graft.InternalPin.pin(
        Tables(s, d, "documents")
          .where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, payload) =>
              (id, MediaCodec.dHash(MediaCodec.encodeBmp(payload)))
            }
          }.toDF("doc_id", "fp"))
      val (fp, h) = pinned
      h.count(); graft.PinScope.retain(h)
      val bands = (0 until 4).map(b =>
          fp.select(col("doc_id"), lit(b).as("band"),
                    substring(col("fp"), b * 16 + 1, 16).as("bk")))
        .reduce(_ unionAll _)
      val capped = bands
        .withColumn("bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("band", "bk")))
        .where(col("bn") <= DedupExtOps.HotBucketCap).drop("bn")
      val cand = capped
        .select(col("band"), col("bk"), col("doc_id").as("id_a"))
        .join(capped.select(col("band"), col("bk"),
                            col("doc_id").as("id_b")), Seq("band", "bk"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      cand
        .join(fp.select(col("doc_id").as("id_a"), col("fp").as("fpa")),
              Seq("id_a"))
        .join(fp.select(col("doc_id").as("id_b"), col("fp").as("fpb")),
              Seq("id_b"))
        .withColumn("hamming",
          DedupExtOps.hamming64(col("fpa"), col("fpb")))
        .where(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy("id_a", "id_b")
    },

    // Audio landmark fingerprinting (added r13) — the AUDIO twin of
    // q305's image dHash, and the constellation-match shape
    // (Wang 2003, the Shazam landmark scheme) a media pipeline runs
    // to find duplicate audio: per WAV-carrying doc (odd ids), decode
    // the REAL RIFF container ([[MediaCodec.audioPeaks]] — chunk walk,
    // int16-LE samples, 32-sample frames, per-frame argmax position),
    // hash each 3 consecutive peak positions into a 15-bit landmark
    // key (32³ combinations), then match docs by landmark votes AT A
    // COHERENT TIME OFFSET — pairs counted per (id_a, id_b, Δframe),
    // ≥ 2 aligned landmarks = a match (the time-coherence vote is
    // what separates real duplicates from chance key collisions).
    // Decode+peaks is ONE typed mapPartitions pass — payloads never
    // shuffle, only (doc, frame, peak) ints; the landmark join is
    // keyed by the 15-bit hash under a declared ≤64 hot-key cap
    // (q305's discipline). Container is deterministic in the payload,
    // so the whole decode→frame→argmax→landmark→vote chain restates
    // closed-form over the text bytes — hash-exact oracle.
    "q314_audio_fingerprint" -> { (s, d) =>
      import s.implicits._
      val (pk, h) = org.apache.spark.sql.graft.InternalPin.pin(
        Tables(s, d, "documents")
          .where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.flatMap { case (id, payload) =>
              MediaCodec.audioPeaks(MediaCodec.encodeWav(payload))
                .iterator.zipWithIndex
                .map { case (p, f) => (id, f.toLong, p.toLong) }
            }
          }.toDF("doc_id", "f", "p"))
      h.count(); graft.PinScope.retain(h)
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("f")
      val g = pk
        .withColumn("p1", lead("p", 1).over(W))
        .withColumn("p2", lead("p", 2).over(W))
        .where(col("p2").isNotNull)
        .select(col("doc_id"), col("f"),
                (col("p") * 1024 + col("p1") * 32 + col("p2")).as("k"))
      val hot = g.groupBy("k").agg(count(lit(1)).as("ck"))
        .where(col("ck") <= lit(64)).select("k")
      val gc = g.join(broadcast(hot), Seq("k"))
      gc.select(col("k"), col("doc_id").as("id_a"), col("f").as("fa"))
        .join(gc.select(col("k"), col("doc_id").as("id_b"),
                        col("f").as("fb")), Seq("k"))
        .where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"),
                 (col("fa") - col("fb")).as("delta"))
        .agg(count(lit(1)).as("n_matched"))
        .where(col("n_matched") >= 2)
        .orderBy("id_a", "id_b", "delta")
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
    // samples are int16-LE from the ASCII payload (low byte + 256·high
    // byte, zero-padded past strlen), frames = complete 32-sample
    // blocks, per-frame argmax restated via list_position(list_max) —
    // first index attaining the max, the declared tie rule — then the
    // identical landmark/lead/hot-cap/offset-vote chain
    "q314_audio_fingerprint" ->
      """WITH au AS (
        |  SELECT doc_id, text, strlen(text) AS L,
        |    ((strlen(text) + 1) // 2) // 32 AS nf
        |  FROM documents WHERE doc_id % 2 = 1),
        |sm AS (
        |  SELECT doc_id, nf, list_transform(range(0, nf * 32), i ->
        |    CASE WHEN 2 * i + 1 <= L
        |         THEN unicode(substr(text, CAST(2 * i + 1 AS INT), 1))
        |         ELSE 0 END +
        |    256 * CASE WHEN 2 * i + 2 <= L
        |         THEN unicode(substr(text, CAST(2 * i + 2 AS INT), 1))
        |         ELSE 0 END) AS s
        |  FROM au WHERE nf >= 1),
        |fr AS (SELECT doc_id, unnest(range(0, nf)) AS f, s FROM sm),
        |p2 AS (
        |  SELECT doc_id, f,
        |    list_position(s[CAST(f * 32 + 1 AS INT):
        |                    CAST(f * 32 + 32 AS INT)],
        |      list_max(s[CAST(f * 32 + 1 AS INT):
        |                 CAST(f * 32 + 32 AS INT)])) - 1 AS p
        |  FROM fr),
        |g0 AS (
        |  SELECT doc_id, f, p,
        |    lead(p, 1) OVER (PARTITION BY doc_id ORDER BY f) AS p1,
        |    lead(p, 2) OVER (PARTITION BY doc_id ORDER BY f) AS p2x
        |  FROM p2),
        |g AS (SELECT doc_id, f, p * 1024 + p1 * 32 + p2x AS k
        |      FROM g0 WHERE p2x IS NOT NULL),
        |hot AS (SELECT k FROM g GROUP BY k HAVING count(*) <= 64),
        |gc AS (SELECT g.* FROM g JOIN hot USING (k))
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  x.f - y.f AS delta, count(*) AS n_matched
        |FROM gc x JOIN gc y ON x.k = y.k AND x.doc_id < y.doc_id
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY id_a, id_b, delta""".stripMargin,

    // the encode∘decode∘sample chain is closed-form in the payload:
    // stored row r of the 32-px BMP = payload bytes [r·96, r·96+96),
    // zero-padded past len(text); the sampled grid, gradient-sign
    // bits, pigeonhole bands, cap and 64-position verify restate the
    // Spark chain exactly (q300's band/verify SQL verbatim)
    "q305_phash_dedup" -> {
      val hamSql = (1 to 64).map(i =>
        s"CASE WHEN substr(a.fp, $i, 1) <> substr(b.fp, $i, 1) " +
          "THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH im AS (
         |  SELECT doc_id, text, strlen(text) AS L,
         |    CAST(ceil(strlen(text) / 96.0) AS BIGINT) AS h
         |  FROM documents WHERE doc_id % 2 = 0),
         |px AS (
         |  SELECT doc_id, r, c,
         |    ((r * h) // 8) * 96 + ((c * 32) // 9) * 3 AS bi, L, text
         |  FROM im, range(0, 8) t1(r), range(0, 9) t2(c)),
         |g AS (
         |  SELECT doc_id, r, c,
         |    (CASE WHEN bi < L
         |          THEN unicode(substr(text, CAST(bi + 1 AS INT), 1))
         |          ELSE 0 END +
         |     CASE WHEN bi + 1 < L
         |          THEN unicode(substr(text, CAST(bi + 2 AS INT), 1))
         |          ELSE 0 END +
         |     CASE WHEN bi + 2 < L
         |          THEN unicode(substr(text, CAST(bi + 3 AS INT), 1))
         |          ELSE 0 END) AS gray
         |  FROM px),
         |bits AS (
         |  SELECT doc_id, r, c, gray,
         |    lead(gray) OVER (PARTITION BY doc_id, r ORDER BY c)
         |      AS gnext
         |  FROM g),
         |fps AS MATERIALIZED (
         |  SELECT doc_id,
         |    string_agg(CASE WHEN gray < gnext THEN '1' ELSE '0' END,
         |               '' ORDER BY r, c) AS fp
         |  FROM bits WHERE c < 8 GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, band, substr(fp, band * 16 + 1, 16) AS bk
         |  FROM fps, (SELECT unnest([0, 1, 2, 3]) AS band) u),
         |capped AS (
         |  SELECT * FROM (
         |    SELECT *, count(*) OVER (PARTITION BY band, bk) AS bn
         |    FROM bands)
         |  WHERE bn <= ${DedupExtOps.HotBucketCap}),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM capped x JOIN capped y
         |    ON x.band = y.band AND x.bk = y.bk
         |   AND x.doc_id < y.doc_id),
         |v AS (
         |  SELECT id_a, id_b, CAST($hamSql AS BIGINT) AS hamming
         |  FROM cand JOIN fps a ON cand.id_a = a.doc_id
         |            JOIN fps b ON cand.id_b = b.doc_id)
         |SELECT id_a, id_b, hamming FROM v
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
    },

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
