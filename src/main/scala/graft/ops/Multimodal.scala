package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus a batched decode/feature-extract stage.
  *
  * The decode step is a REAL pure-JVM container parse (BMP and WAV — formats
  * whose headers are plain little-endian structs, so no codec dependency is
  * needed): [[MediaCodec.decode]] dispatches on the payload's magic bytes and
  * reads width/height (BMP `BITMAPINFOHEADER`) or channels/sample-rate/frame
  * count (WAV `fmt `/`data` chunk walk) out of the byte stream, validating
  * magic, header sizes and declared lengths. Fixture payloads are complete
  * valid files generated deterministically from `doc_id` (pixel data and PCM
  * samples included), so the driver's DuckDB oracle can verify the PARSED
  * fields against their closed-form values — two independent paths meeting
  * at the header bytes. The reference's analog runs DinoV2 via ONNX for
  * image features (`ImageSearching/ImageFeatureExtractor.java:27-60`); the
  * embedding-similarity half of that pipeline lives in
  * [[graft.ops.Similarity]], this operator is the decode/metadata half.
  *
  * Spark shape: payload generation and decode are typed `mapPartitions`
  * stages (the batch shape a vectorized `mapInArrow` codec stage takes),
  * everything else is columnar; no shuffle anywhere — the whole pipeline is
  * narrow and scales with input splits.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Typed metadata from the container parse. Image rows carry
    * (width, height, n_frames=1); audio rows carry
    * (n_frames = PCM frame count, sample_rate, channels). */
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 width: Long, height: Long, n_frames: Long,
                                 sample_rate: Long, channels: Long)

  /** Pure-JVM media container codec (BMP + PCM WAV). Encoders build complete
    * valid files; [[decode]] trusts only the bytes. */
  object MediaCodec {
    private def le16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(b: Array[Byte], o: Int, v: Int): Unit = {
      le16(b, o, v & 0xffff); le16(b, o + 2, (v >>> 16) & 0xffff)
    }
    private def rd16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], o: Int): Int =
      rd16(b, o) | (rd16(b, o + 2) << 16)

    /** 24-bpp uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + pixel
      * rows padded to 4 bytes), deterministic pixel bytes from `seed`. */
    def makeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0)
      val rowBytes = (width * 3 + 3) / 4 * 4
      val dataSize = height * rowBytes
      val b = new Array[Byte](54 + dataSize)
      b(0) = 'B'; b(1) = 'M'
      le32(b, 2, b.length)        // file size
      le32(b, 10, 54)             // pixel data offset
      le32(b, 14, 40)             // BITMAPINFOHEADER size
      le32(b, 18, width)
      le32(b, 22, height)
      le16(b, 26, 1)              // planes
      le16(b, 28, 24)             // bits per pixel
      le32(b, 34, dataSize)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < rowBytes) {
          b(54 + y * rowBytes + x) = ((seed + x + 7L * y) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      b
    }

    /** 16-bit PCM WAV (RIFF/WAVE with canonical `fmt ` + `data` chunks),
      * deterministic samples from `seed`. `nFrames` = samples per channel. */
    def makeWav(sampleRate: Int, channels: Int, nFrames: Int,
                seed: Long): Array[Byte] = {
      require(sampleRate > 0 && channels > 0 && nFrames > 0)
      val blockAlign = channels * 2
      val dataSize = nFrames * blockAlign
      val b = new Array[Byte](44 + dataSize)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      le32(b, 4, 36 + dataSize)   // RIFF chunk size
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      le32(b, 16, 16)             // fmt chunk size (PCM)
      le16(b, 20, 1)              // audio format = PCM
      le16(b, 22, channels)
      le32(b, 24, sampleRate)
      le32(b, 28, sampleRate * blockAlign) // byte rate
      le16(b, 32, blockAlign)
      le16(b, 34, 16)             // bits per sample
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      le32(b, 40, dataSize)
      var i = 0
      while (i < dataSize / 2) {
        le16(b, 44 + 2 * i, (((seed * 31 + i) % 65536) - 32768).toInt & 0xffff)
        i += 1
      }
      b
    }

    /** Nearest-neighbor resize of a 24-bpp BMP so max(width, height) ≤
      * `maxDim` (no-op if already within). Operates purely on the bytes:
      * parses the source header, samples pixel rows/columns, re-encodes a
      * complete valid BMP. */
    def resizeBmp(p: Array[Byte], maxDim: Int): Array[Byte] = {
      require(p.length >= 54 && p(0) == 'B' && p(1) == 'M', "not a BMP")
      require(rd16(p, 28) == 24, "resize supports 24-bpp only")
      val w = rd32(p, 18); val h = rd32(p, 22)
      val m = math.max(w, h)
      if (m <= maxDim) return p
      val wr = math.max(1, w * maxDim / m)
      val hr = math.max(1, h * maxDim / m)
      val srcRow = (w * 3 + 3) / 4 * 4
      val dstRow = (wr * 3 + 3) / 4 * 4
      val out = new Array[Byte](54 + hr * dstRow)
      System.arraycopy(p, 0, out, 0, 54)
      le32(out, 2, out.length)
      le32(out, 18, wr)
      le32(out, 22, hr)
      le32(out, 34, hr * dstRow)
      var y = 0
      while (y < hr) {
        val sy = y * h / hr
        var x = 0
        while (x < wr) {
          val sx = x * w / wr
          var c = 0
          while (c < 3) {
            out(54 + y * dstRow + 3 * x + c) = p(54 + sy * srcRow + 3 * sx + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

    /** Frame-sample (decimate) a 16-bit PCM WAV: keep every `stride`-th
      * frame across all channels (⌈frames/stride⌉ survive), re-encoded as a
      * complete valid WAV with the same rate/channels. */
    def sampleWav(p: Array[Byte], stride: Int): Array[Byte] = {
      require(stride >= 1)
      val (_, _, _, frames, rate, channels) = decode(p)
      require(rate > 0 && channels > 0, "not a WAV")
      // canonical layout only (fmt at 12, data at 36, 16-bit) — what the
      // encoder emits; decode()'s chunk walk is the general reader
      require(p(36) == 'd' && p(37) == 'a' && p(38) == 't' && p(39) == 'a',
        "sampleWav requires the canonical chunk layout")
      require(rd16(p, 34) == 16, "sampleWav supports 16-bit PCM only")
      if (stride == 1) return p
      val blockAlign = channels.toInt * 2
      val outFrames = ((frames + stride - 1) / stride).toInt
      val out = new Array[Byte](44 + outFrames * blockAlign)
      System.arraycopy(p, 0, out, 0, 44)
      le32(out, 4, 36 + outFrames * blockAlign)
      le32(out, 40, outFrames * blockAlign)
      var i = 0
      while (i < outFrames) {
        System.arraycopy(p, 44 + i * stride * blockAlign,
          out, 44 + i * blockAlign, blockAlign)
        i += 1
      }
      out
    }

    /** Parse the container header: (kind, width, height, n_frames,
      * sample_rate, channels). Rejects unknown magic / malformed headers. */
    def decode(p: Array[Byte]): (String, Long, Long, Long, Long, Long) = {
      if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') {
        require(rd32(p, 2) == p.length, s"BMP: declared size ${rd32(p, 2)} != ${p.length}")
        require(rd32(p, 14) >= 40, "BMP: not a BITMAPINFOHEADER")
        val w = rd32(p, 18)
        val h = rd32(p, 22)
        require(w > 0 && h > 0, s"BMP: bad dimensions ${w}x$h")
        ("image/bmp", w.toLong, h.toLong, 1L, 0L, 0L)
      } else if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
          p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
        // chunk walk: headers may order/pad chunks freely
        var off = 12
        var channels = 0L; var rate = 0L; var bits = 0L; var frames = -1L
        while (off + 8 <= p.length && (frames < 0 || channels == 0)) {
          val id = new String(p.slice(off, off + 4), "US-ASCII")
          val sz = rd32(p, off + 4)
          // a malformed declared size (negative Int, or one that fails to
          // advance the walk) must be a validation error, not a hang
          require(sz >= 0 && off + 8L + sz <= p.length,
            s"WAV: chunk '$id' declares $sz bytes at offset $off (file ${p.length})")
          if (id == "fmt ") {
            require(rd16(p, off + 8) == 1, "WAV: not PCM")
            channels = rd16(p, off + 10).toLong
            rate = rd32(p, off + 12).toLong
            bits = rd16(p, off + 22).toLong
            require(channels > 0 && bits > 0 && bits % 8 == 0,
              s"WAV: malformed fmt chunk (channels=$channels bits=$bits)")
          } else if (id == "data") {
            require(channels > 0, "WAV: data chunk before fmt")
            frames = sz / (channels * bits / 8)
          }
          off += 8 + sz + (sz & 1) // chunks are word-aligned; sz≥0 ⇒ strict advance
        }
        require(frames >= 0, "WAV: no data chunk")
        ("audio/wav", 0L, 0L, frames, rate, channels)
      } else throw new IllegalArgumentException(
        s"unknown media magic: ${p.take(4).map(b => f"$b%02x").mkString}")
    }
  }

  /** Deterministic fixture parameters, closed-form in doc_id — the SAME
    * formulas the DuckDB oracle evaluates independently of the byte path. */
  private[ops] def bmpDims(id: Long): (Int, Int) =
    (((id % 64) + 1).toInt, ((id % 48) + 1).toInt)
  private[ops] def wavParams(id: Long): (Int, Int, Int) =
    ((8000 + (id % 8) * 1000).toInt, (((id / 2) % 2) + 1).toInt,
      ((id % 1000) + 1).toInt)

  /** documents → typed media rows: even doc_id ⇒ BMP image, odd ⇒ WAV audio,
    * generated as complete valid files (a deterministic stand-in for reading
    * a binary media column off storage). */
  def mediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      if (id % 2 == 0) {
        val (w, h) = bmpDims(id)
        MediaRow(id, "image/bmp", MediaCodec.makeBmp(w, h, id))
      } else {
        val (rate, ch, frames) = wavParams(id)
        MediaRow(id, "audio/wav", MediaCodec.makeWav(rate, ch, frames, id))
      }
    })
  }

  /** Batched decode: one partition-iterator pass, parsing each payload's
    * container header — the shape a vectorized (Arrow) codec stage takes. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (kind, w, h, frames, rate, ch) = MediaCodec.decode(r.payload)
      MediaFeatures(r.doc_id, kind, r.payload.length.toLong, w, h, frames,
        rate, ch)
    })
  }

  /** Full pipeline as a DataFrame (payload dropped after decode). */
  def features(documents: DataFrame): DataFrame =
    extractFeatures(mediaTable(documents)).toDF()
      .select("doc_id", "kind", "n_bytes", "width", "height", "n_frames",
        "sample_rate", "channels")
      .orderBy("doc_id")

  /** Batched resize / frame-sample: images nearest-neighbor-resized so
    * max(w, h) ≤ `maxDim`, audio decimated to every `stride`-th frame —
    * the normalize step of a training-data media pipeline. Byte-level and
    * narrow (one mapPartitions, no shuffle); output payloads are complete
    * valid files again, so downstream stages need no special casing. */
  def downsample(media: Dataset[MediaRow], maxDim: Int = 16,
                 stride: Int = 4): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val out =
        if (r.kind == "image/bmp") MediaCodec.resizeBmp(r.payload, maxDim)
        else MediaCodec.sampleWav(r.payload, stride)
      MediaRow(r.doc_id, r.kind, out)
    })
  }

  /** Downsample + re-decode: every output field is parsed back OUT OF the
    * transformed bytes (not carried through), so the oracle certifies the
    * real resize/decimation arithmetic. */
  def downsampledFeatures(documents: DataFrame, maxDim: Int = 16,
                          stride: Int = 4): DataFrame =
    extractFeatures(downsample(mediaTable(documents), maxDim, stride)).toDF()
      .select("doc_id", "kind", "n_bytes", "width", "height", "n_frames",
        "sample_rate", "channels")
      .orderBy("doc_id")
}
