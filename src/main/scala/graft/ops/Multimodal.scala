package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt.CkptSyntax

/** Multimodal column plumbing (SURVEY.md §7): image/audio/video travel
  * as opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs batched per partition (the Scala analogue of
  * `mapInPandas`), so heavier decoders (JNI/FFI video libs) drop in
  * behind [[MediaCodec.decodeBatch]] without touching the Spark plumbing.
  *
  * The decoders are REAL and JDK-only: `javax.imageio` for png/jpeg
  * (dimensions + grayscale pixel statistics) and a RIFF chunk parse for
  * wav (sample rate, duration, PCM sample statistics). PNG and WAV are
  * lossless, so their decoded statistics are exactly reproducible from
  * the generator formulas — giving the pipeline a DuckDB oracle. JPEG is
  * lossy: dimensions are exact, pixel stats are codec-dependent.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)

  case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)

  /** Decoded per-asset features: dimensions for images, duration for
    * audio, and the mean decoded value (gray level / PCM sample). */
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long, mean_val: Double)

  /** One decoded (sampled) video frame: index in the stream plus frame
    * dimensions and mean gray level. */
  case class FrameFeatures(media_id: Long, frame_idx: Int, width: Int,
      height: Int, mean_val: Double)

  /** Consecutive-frame change signal: mean absolute pixel difference
    * between frame `frame_idx` and frame `frame_idx − 1`. */
  case class FrameDelta(media_id: Long, frame_idx: Int, mad: Double)

  /** One PCM block of a downsampled audio stream: block index, how
    * many samples it covers (the final block may be short), and the
    * integer-exact block mean. */
  case class AudioBlock(media_id: Long, block_idx: Int, n_samples: Int,
      mean_val: Double)

  /** One ViT-style image patch: grid coordinates, how many pixels the
    * patch covers (edge patches may be ragged), and the mean gray
    * level over them. */
  case class PatchFeatures(media_id: Long, py: Int, px: Int, n_px: Int,
      mean_val: Double)

  /** Container metadata sniffed from a payload's leading bytes alone —
    * format from magic numbers, dimensions/duration from the header
    * structures — WITHOUT decoding any pixel or sample data. */
  case class MediaHeader(media_id: Long, format: String, width: Int,
      height: Int, duration_ms: Long)

  /** One embedded text-metadata entry (PNG `tEXt` key/value) — the
    * caption/source sidecar that turns an image corpus into image-text
    * training pairs. */
  case class TextMeta(media_id: Long, key: String, value: String)

  /** One triage verdict: sniffed format + header facts + an
    * operational status — `ok` (full decode succeeds), `header_only`
    * (header parses, payload does not decode: truncation/corruption
    * past the header), `unparseable` (no known magic). */
  case class MediaTriage(media_id: Long, format: String, width: Int,
      height: Int, duration_ms: Long, status: String)

  /** Deterministic payload generators (the stand-in for files read from
    * a binary source). Pixels and samples follow closed-form formulas of
    * (id, x, y) so lossless decodes have an exact SQL oracle. */
  object MediaGen {
    val sampleRate = 8000

    def grayAt(id: Long, x: Int, y: Int): Int =
      ((x * 7 + y * 13 + id * 31) % 256).toInt

    def sampleAt(id: Long, i: Int): Short =
      (((id * 31 + i * 17) % 65536) - 32768).toShort

    def image(fmt: String, w: Int, h: Int, id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, grayAt(id, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    /** One standards-correct `tEXt` chunk: length + type + (key NUL
      * value) + CRC32 over type+data — bytes any PNG reader accepts. */
    def pngTextChunk(key: String, value: String): Array[Byte] = {
      val data = key.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
        value.getBytes("ISO-8859-1")
      val typ = "tEXt".getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(typ); crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ).put(data).putInt(crc.getValue.toInt)
      bb.array()
    }

    /** [[image]] as PNG with `tEXt` metadata chunks spliced in directly
      * after IHDR (always at offset 33: 8-byte signature + 25-byte IHDR
      * chunk) — the caption/source sidecar a crawled image carries.
      * Decoders ignore ancillary chunks, so pixels decode identically
      * (spec-pinned). */
    def pngWithText(w: Int, h: Int, id: Long,
        entries: Seq[(String, String)]): Array[Byte] = {
      val base = image("png", w, h, id)
      val cut = 33
      base.take(cut) ++ entries.toArray.flatMap(e =>
        pngTextChunk(e._1, e._2)) ++ base.drop(cut)
    }

    def grayVidAt(id: Long, f: Int, x: Int, y: Int): Int =
      ((x * 7 + y * 13 + id * 31 + f * 19) % 256).toInt

    /** Scene-structured variant of [[grayVidAt]]: frames share content
      * within a `sceneLen`-frame scene (the f div sceneLen term) and
      * jump at every scene boundary, so consecutive-frame deltas are
      * exactly 0 inside a scene and large (≥ 47·min-wrap share) at
      * each boundary — the fixture for cut detection. */
    def graySceneAt(id: Long, f: Int, sceneLen: Int, x: Int, y: Int): Int =
      ((x * 7 + y * 13 + id * 31 + (f / sceneLen).toLong * 47) % 256).toInt

    /** Uncompressed YUV4MPEG2 stream (the mjpegtools interchange
      * format): ASCII stream header, then `FRAME\n` + one raw plane per
      * frame. `Cmono` keeps a single luma plane, so every pixel is the
      * closed-form gray value — lossless, hence SQL-oracle-able. */
    def y4m(id: Long, w: Int, h: Int, frames: Int): Array[Byte] =
      y4mOf(w, h, frames)((f, x, y) => grayVidAt(id, f, x, y))

    /** [[y4m]] with [[graySceneAt]] pixels — identical container. */
    def y4mScenes(id: Long, w: Int, h: Int, frames: Int, sceneLen: Int): Array[Byte] =
      y4mOf(w, h, frames)((f, x, y) => graySceneAt(id, f, sceneLen, x, y))

    private def y4mOf(w: Int, h: Int, frames: Int)(px: (Int, Int, Int) => Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F10:1 Ip A1:1 Cmono\n".getBytes("US-ASCII"))
      val frameHdr = "FRAME\n".getBytes("US-ASCII")
      var f = 0
      while (f < frames) {
        bos.write(frameHdr)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { bos.write(px(f, x, y)); x += 1 }
          y += 1
        }
        f += 1
      }
      bos.toByteArray
    }

    /** Chirp-like PCM (quadratic phase): wrap points spread densely and
      * id-dependently, so frame-mean contours are diverse across ids —
      * the near-dup gate's fixture (the plain [[sampleAt]] sawtooth
      * wraps at most once per stream, collapsing every contour hash
      * into a few patterns). */
    def chirpAt(id: Long, i: Int): Short =
      (((id * 31 + i.toLong * i * 7 + i * 17) % 65536) - 32768).toShort

    def wavChirp(id: Long, nSamples: Int): Array[Byte] =
      wavOf(nSamples)(i => chirpAt(id, i))

    def wav(id: Long, nSamples: Int): Array[Byte] =
      wavOf(nSamples)(i => sampleAt(id, i))

    private def wavOf(nSamples: Int)(sample: Int => Short): Array[Byte] = {
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16) // block align, bits/sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) { bb.putShort(sample(i)); i += 1 }
      bb.array()
    }
  }

  /** Batch decoder: png/jpeg via `javax.imageio`, wav via a RIFF chunk
    * walk. Batch-in/batch-out so a native decoder amortizing per-call
    * overhead slots in without plumbing changes. */
  object MediaCodec {
    val batchSize = 64

    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        r.meta.format match {
          case "png" | "jpeg" => decodeImage(r)
          case "wav"          => decodeWav(r)
          case other =>
            MediaFeatures(r.media_id, other, r.content.length, 0, 0, 0L, 0.0)
        }
      }

    private def decodeImage(r: MediaRecord): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      MediaFeatures(r.media_id, r.meta.format, r.content.length, w, h, 0L,
        sum.toDouble / (w.toLong * h))
    }

    /** Resample a record: nearest-neighbor resize of images to
      * (ow, oh); every `stride`-th PCM sample for audio. Lossless
      * formats keep exact formula oracles (source index (x*w)//ow). */
    def resample(r: MediaRecord, ow: Int, oh: Int, stride: Int): MediaFeatures =
      r.meta.format match {
        case "png" | "jpeg" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.content))
          val w = img.getWidth
          val h = img.getHeight
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              sum += raster.getSample(x * w / ow, y * h / oh, 0)
              x += 1
            }
            y += 1
          }
          MediaFeatures(r.media_id, r.meta.format, r.content.length, ow, oh, 0L,
            sum.toDouble / (ow.toLong * oh))
        case "wav" =>
          val bb = java.nio.ByteBuffer.wrap(r.content)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val (rate, channels, dataOff, dataLen) = parseWav(r.content)
          val n = dataLen / 2
          var sum = 0L
          var count = 0
          var i = 0
          while (i < n) {
            sum += bb.getShort(dataOff + 2 * i)
            count += 1
            i += stride
          }
          val frames = n / math.max(channels, 1)
          MediaFeatures(r.media_id, r.meta.format, r.content.length, 0, 0,
            frames.toLong * 1000 / rate,
            if (count == 0) 0.0 else sum.toDouble / count)
        case other =>
          MediaFeatures(r.media_id, other, r.content.length, 0, 0, 0L, 0.0)
      }

    /** Block-downsample a WAV record's PCM stream: one [[AudioBlock]]
      * per `blockSize` samples with the integer-exact block mean — the
      * audio envelope (the contour [[audioHash]] summarizes into one
      * long, exposed here as first-class time-series rows — the audio
      * analogue of [[frameSample]]). Record-local: audio bytes never
      * shuffle, blocks explode executor-side; same bounds-checked
      * [[parseWav]] walk as every wav decoder here. */
    def blockMeans(r: MediaRecord, blockSize: Int): Seq[AudioBlock] = {
      require(blockSize > 0, s"blockSize must be positive, got $blockSize")
      val bb = java.nio.ByteBuffer.wrap(r.content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (_, _, dataOff, dataLen) = parseWav(r.content)
      val n = dataLen / 2
      val out = scala.collection.mutable.ArrayBuffer.empty[AudioBlock]
      var b = 0
      var i = 0
      while (i < n) {
        val end = math.min(i + blockSize, n)
        var sum = 0L
        var j = i
        while (j < end) { sum += bb.getShort(dataOff + 2 * j); j += 1 }
        out += AudioBlock(r.media_id, b, end - i, sum.toDouble / (end - i))
        b += 1
        i = end
      }
      out.toSeq
    }

    /** Header-only metadata probe: format sniffed from MAGIC BYTES (not
      * trusted metadata), dimensions/duration read from container
      * headers — pixel/sample data is NEVER touched. This is the
      * 100 TB triage pass: cataloguing a crawl's media by
      * format/size/duration reads tens of bytes per object instead of
      * decoding it, so the probe is I/O-bound on headers alone (pair
      * with a ranged read on a real object store). Deliberately
      * LENIENT where the full decoders are strict: a payload truncated
      * after its header still probes correctly (the spec pins that),
      * because triage must classify objects it would refuse to decode.
      *
      *   - PNG: 8-byte signature, then IHDR width/height at 16/20 (BE)
      *     — 24 bytes total.
      *   - JPEG: FFD8 then a marker-segment walk SKIPPING each
      *     segment body via its declared length until SOFn (frame
      *     height/width), stopping at SOS — touches header segments
      *     only, never entropy-coded data.
      *   - WAV: RIFF chunk walk reading `fmt ` (rate, channels) and
      *     the `data` chunk's DECLARED length (the body itself may be
      *     absent) → duration.
      */
    /** PNG chunk walk extracting `tEXt` key/value entries, in chunk
      * order. Header-scale work like [[headerProbe]] — no pixel
      * decode. Truncation-tolerant: the walk stops at the first chunk
      * that would run past the payload (or at IEND); a non-PNG payload
      * yields no entries rather than an exception. */
    def textChunks(r: MediaRecord): Seq[TextMeta] = {
      val c = r.content
      def be32(o: Int): Int = ((c(o) & 0xff) << 24) | ((c(o + 1) & 0xff) << 16) |
        ((c(o + 2) & 0xff) << 8) | (c(o + 3) & 0xff)
      if (c.length < 8 || (c(0) & 0xff) != 0x89 || c(1) != 'P' ||
          c(2) != 'N' || c(3) != 'G') return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer[TextMeta]()
      var pos = 8
      var done = false
      while (!done && pos + 8 <= c.length) {
        val len = be32(pos)
        val typ = new String(c, pos + 4, 4, "US-ASCII")
        if (len < 0 || pos + 12 + len > c.length || typ == "IEND") done = true
        else {
          if (typ == "tEXt") {
            val data = new String(c, pos + 8, len, "ISO-8859-1")
            val nul = data.indexOf('\u0000')
            if (nul >= 0)
              out += TextMeta(r.media_id, data.substring(0, nul),
                data.substring(nul + 1))
          }
          pos += 12 + len
        }
      }
      out.toSeq
    }

    def headerProbe(r: MediaRecord): MediaHeader = {
      val c = r.content
      def be32(o: Int): Int = ((c(o) & 0xff) << 24) | ((c(o + 1) & 0xff) << 16) |
        ((c(o + 2) & 0xff) << 8) | (c(o + 3) & 0xff)
      def be16(o: Int): Int = ((c(o) & 0xff) << 8) | (c(o + 1) & 0xff)
      if (c.length >= 24 && (c(0) & 0xff) == 0x89 && c(1) == 'P' &&
          c(2) == 'N' && c(3) == 'G' &&
          new String(c, 12, 4, "US-ASCII") == "IHDR")
        MediaHeader(r.media_id, "png", be32(16), be32(20), 0L)
      else if (c.length >= 4 && (c(0) & 0xff) == 0xff && (c(1) & 0xff) == 0xd8) {
        var pos = 2
        var w = 0
        var h = 0
        var done = false
        while (!done && pos + 4 <= c.length) {
          if ((c(pos) & 0xff) != 0xff) pos += 1 // tolerate fill bytes
          else {
            val m = c(pos + 1) & 0xff
            if (m == 0xff) pos += 1 // FF padding before a marker
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) pos += 2 // standalone
            else if (m == 0xda) done = true // SOS: entropy data follows, stop
            else {
              val len = be16(pos + 2)
              // SOFn carries the frame dims (C4/C8/CC are DHT/JPG/DAC)
              if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                  m != 0xcc && pos + 9 <= c.length) {
                h = be16(pos + 5)
                w = be16(pos + 7)
                done = true
              } else {
                require(len >= 2, s"corrupt JPEG segment at $pos: length $len")
                pos += 2 + len
              }
            }
          }
        }
        MediaHeader(r.media_id, "jpeg", w, h, 0L)
      } else if (c.length >= 12 && new String(c, 0, 4, "US-ASCII") == "RIFF" &&
          new String(c, 8, 4, "US-ASCII") == "WAVE") {
        val bb = java.nio.ByteBuffer.wrap(c)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var pos = 12
        var rate = 0
        var channels = 1
        var dataLen = -1
        while ((dataLen < 0 || rate == 0) && pos + 8 <= c.length) {
          val cid = new String(c, pos, 4, "US-ASCII")
          val clen = bb.getInt(pos + 4)
          require(clen >= 0, s"corrupt RIFF chunk '$cid' at $pos: length $clen")
          if (cid == "fmt " && pos + 16 <= c.length) {
            channels = bb.getShort(pos + 10).toInt
            rate = bb.getInt(pos + 12)
          } else if (cid == "data") dataLen = clen
          pos += 8 + clen + (clen & 1) // chunks are word-aligned
        }
        val frames =
          if (dataLen < 0 || channels <= 0) 0L
          else dataLen.toLong / 2 / channels
        MediaHeader(r.media_id, "wav", 0, 0,
          if (rate > 0) frames * 1000 / rate else 0L)
      } else MediaHeader(r.media_id, "unknown", 0, 0, 0L)
    }

    /** Generic RIFF chunk walk → (sampleRate, channels, dataOff, dataLen). */
    private def parseWav(c: Array[Byte]): (Int, Int, Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(c.length >= 12 && new String(c, 0, 4, "US-ASCII") == "RIFF" &&
        new String(c, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
      var pos = 12
      var rate = 0
      var channels = 1
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= c.length) {
        val cid = new String(c, pos, 4, "US-ASCII")
        val clen = bb.getInt(pos + 4)
        // a corrupt/negative declared length would make the walk
        // non-advancing (clen = -8 → pos unchanged) and spin an executor
        // forever; chunk lengths must be non-negative and in-bounds
        require(clen >= 0 && pos + 8 + clen <= c.length,
          s"corrupt RIFF chunk '$cid' at $pos: declared length $clen")
        if (cid == "fmt ") {
          channels = bb.getShort(pos + 10).toInt
          rate = bb.getInt(pos + 12)
        } else if (cid == "data") {
          dataOff = pos + 8
          dataLen = clen
        }
        pos += 8 + clen + (clen & 1) // chunks are word-aligned
      }
      require(dataOff >= 0 && rate > 0, "missing fmt/data chunk")
      (rate, channels, dataOff, dataLen)
    }

    /** Parsed YUV4MPEG2 stream header: Cmono only, dimensions
      * validated, `firstFrame` = offset of the first FRAME marker. */
    private final case class Y4mHeader(w: Int, h: Int, firstFrame: Int) {
      def frameBytes: Int = w * h
    }

    /** The ONE YUV4MPEG2 header parse + FRAME walk both [[frameSample]]
      * and [[frameDeltas]] ride (extracted so the two decoders cannot
      * drift): validates the stream header, then invokes
      * `onFrame(header, frameIndex, dataStart)` per frame with
      * `header.frameBytes` payload bytes guaranteed in-bounds — a
      * truncated or lying header fails fast instead of spinning, the
      * same posture as [[parseWav]]. */
    private def walkY4m(c: Array[Byte])(onFrame: (Y4mHeader, Int, Int) => Unit): Unit = {
      val nl = c.indexOf('\n'.toByte)
      require(nl > 0, "missing YUV4MPEG2 stream header")
      val header = new String(c, 0, nl, "US-ASCII")
      require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 payload")
      val tags = header.split(' ').drop(1)
      def tag(p: Char): Option[String] =
        tags.find(t => t.nonEmpty && t.head == p).map(_.tail)
      val w = tag('W').map(_.toInt).getOrElse(sys.error("missing W tag"))
      val h = tag('H').map(_.toInt).getOrElse(sys.error("missing H tag"))
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(tag('C').forall(_ == "mono"),
        s"only Cmono streams supported, got C${tag('C').get}")
      val hd = Y4mHeader(w, h, nl + 1)
      val frameBytes = hd.frameBytes
      var pos = hd.firstFrame
      var f = 0
      while (pos < c.length) {
        val fnl = c.indexOf('\n'.toByte, pos)
        require(fnl >= pos + 5 &&
          new String(c, pos, 5, "US-ASCII") == "FRAME",
          s"expected FRAME marker at byte $pos")
        val dataStart = fnl + 1
        require(dataStart + frameBytes <= c.length,
          s"truncated frame $f at byte $dataStart")
        onFrame(hd, f, dataStart)
        pos = dataStart + frameBytes
        f += 1
      }
    }

    /** Frame-sample a YUV4MPEG2 stream: decode every `stride`-th frame
      * (index 0, stride, 2·stride, …) and emit its mean gray level,
      * over the shared [[walkY4m]] bounds-checked walk. */
    def frameSample(r: MediaRecord, stride: Int): Seq[FrameFeatures] = {
      require(stride > 0, s"stride must be positive, got $stride")
      val c = r.content
      val out = scala.collection.mutable.ArrayBuffer.empty[FrameFeatures]
      walkY4m(c) { (hd, f, dataStart) =>
        if (f % stride == 0) {
          val n = hd.frameBytes
          var sum = 0L
          var i = 0
          while (i < n) { sum += c(dataStart + i) & 0xff; i += 1 }
          out += FrameFeatures(r.media_id, f, hd.w, hd.h, sum.toDouble / n)
        }
      }
      out.toSeq
    }

    /** ViT-style patch grid over a decoded image: split the gray
      * channel into a ceil(w/p) × ceil(h/p) grid of `p`×`p` patches
      * (edge patches truncated to the image bounds) and emit each
      * patch's pixel count and mean — the tokenization step every
      * vision-transformer ingest pipeline runs before embedding.
      * Record-local: one decode, one raster walk, no cross-row state.
      * Lossless formats (png) keep the exact closed-form oracle. */
    def patchify(r: MediaRecord, p: Int): Seq[PatchFeatures] = {
      require(p > 0, s"patch size must be positive, got $p")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val out = scala.collection.mutable.ArrayBuffer.empty[PatchFeatures]
      var py = 0
      while (py * p < h) {
        var px = 0
        while (px * p < w) {
          val x1 = math.min((px + 1) * p, w)
          val y1 = math.min((py + 1) * p, h)
          var sum = 0L
          var y = py * p
          while (y < y1) {
            var x = px * p
            while (x < x1) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          val n = (x1 - px * p) * (y1 - py * p)
          out += PatchFeatures(r.media_id, py, px, n, sum.toDouble / n)
          px += 1
        }
        py += 1
      }
      out.toSeq
    }

    /** Consecutive-frame mean absolute pixel difference over a
      * YUV4MPEG2 stream: one [[FrameDelta]] per frame index >= 1. The
      * whole walk is record-local (a video is ONE row), so the scene
      * signal costs a single sequential decode with two frame buffers
      * — no shuffle, no cross-row state. Shares [[walkY4m]]'s
      * bounds-checked walk with [[frameSample]]. */
    def frameDeltas(r: MediaRecord): Seq[FrameDelta] = {
      val c = r.content
      val out = scala.collection.mutable.ArrayBuffer.empty[FrameDelta]
      var prevStart = -1
      walkY4m(c) { (hd, f, dataStart) =>
        if (prevStart >= 0) {
          val n = hd.frameBytes
          var sum = 0L
          var i = 0
          while (i < n) {
            sum += math.abs((c(dataStart + i) & 0xff) - (c(prevStart + i) & 0xff))
            i += 1
          }
          out += FrameDelta(r.media_id, f, sum.toDouble / n)
        }
        prevStart = dataStart
      }
      out.toSeq
    }

    /** 64-bit difference hash (dHash, public: Krawetz 2013 "Kind of
      * Like That"): nearest-neighbor downsample to a 9×8 gray grid,
      * then one bit per adjacent-pixel comparison (left > right), bit
      * index y·8+x. Near-duplicate images differ in few bits, so
      * Hamming distance over these longs is the standard image-dedup
      * primitive — and it composes directly with [[Dedup.simhashPairs]]
      * -style banding. Lossless formats keep an exact SQL oracle (same
      * `(x·w)//9` source indexing as [[resample]]). */
    def dhash(r: MediaRecord): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      // ImageIO.read returns null (no exception) for undecodable bytes —
      // e.g. a wav record routed into an image-only pipeline. Fail with
      // the contract instead of an NPE deep in raster access.
      if (img == null) throw new IllegalArgumentException(
        s"media_id ${r.media_id}: format '${r.meta.format}' is not a " +
        "decodable image — dhash requires png/jpeg records; filter on " +
        "meta.format before hashing mixed-modality media")
      dhashOf(img)
    }

    /** [[dhash]] over an ALREADY-DECODED image — the fusion point for
      * pipelines that decode once and reuse the frame (triage verdict +
      * perceptual hash from one ImageIO pass). */
    def dhashOf(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val l = raster.getSample(x * w / 9, y * h / 8, 0)
          val rt = raster.getSample((x + 1) * w / 9, y * h / 8, 0)
          if (l > rt) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      hash
    }

    /** 60-bit audio delta-sign hash: the PCM stream splits into 61
      * equal-share frames and bit f (0..59) is set iff the integer mean
      * of frame f exceeds that of frame f+1 — the audio analogue of
      * [[dhash]] (energy-CONTOUR shape, comparisons only, so it is
      * level-invariant the way dHash is brightness-invariant), and it
      * composes with [[graft.ops.Dedup.hammingPairs64]] the same way.
      * Integer means (truncate-toward-zero) keep an exact SQL oracle.
      * Empty frames (streams shorter than 61 samples) read as mean 0. */
    def audioHash(r: MediaRecord): Long = {
      val bb = java.nio.ByteBuffer.wrap(r.content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (_, _, dataOff, dataLen) = parseWav(r.content)
      val n = dataLen / 2
      def mean(f: Int): Long = {
        val s = f * n / 61
        val e = (f + 1) * n / 61
        if (e <= s) 0L
        else {
          var sum = 0L
          var i = s
          while (i < e) { sum += bb.getShort(dataOff + 2 * i); i += 1 }
          sum / (e - s)
        }
      }
      var hash = 0L
      var cur = mean(0)
      var f = 0
      while (f < 60) {
        val nxt = mean(f + 1)
        if (cur > nxt) hash |= 1L << f
        cur = nxt
        f += 1
      }
      hash
    }

    private def decodeWav(r: MediaRecord): MediaFeatures = {
      val c = r.content
      val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (rate, channels, dataOff, dataLen) = parseWav(c)
      val n = dataLen / 2
      var sum = 0L
      var i = 0
      while (i < n) { sum += bb.getShort(dataOff + 2 * i); i += 1 }
      val frames = n / math.max(channels, 1)
      MediaFeatures(r.media_id, r.meta.format, c.length, 0, 0,
        frames.toLong * 1000 / rate,
        if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Synthesize a deterministic media table from any id column: real
    * encoded payloads (png/jpeg via ImageIO, wav with a hand-built RIFF
    * header), pixels/samples from the [[MediaGen]] formulas. Generated
    * executor-side per partition — no driver involvement. */
  def syntheticMedia(df: DataFrame, idCol: String)(implicit spark: SparkSession): Dataset[MediaRecord] =
    syntheticMediaFrom(df, idCol, idCol)

  /** [[syntheticMedia]] with the payload formula driven by a SEPARATE
    * generator column: rows sharing a `genCol` value carry
    * byte-identical payloads under their own `media_id`s — the shape of
    * a real corpus where many documents embed the same asset. This is
    * the fixture for exact-dup pre-collapse testing (the guard every
    * banded pairs operator requires). */
  def syntheticMediaFrom(df: DataFrame, idCol: String, genCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(genCol).cast("long").as("gen"))
      .as[(Long, Long)].map { case (id, gen) =>
        (gen % 3) match {
          case 0 | 1 =>
            val fmt = if (gen % 3 == 0) "png" else "jpeg"
            val w = (gen % 64 + 1).toInt
            val h = (gen % 48 + 1).toInt
            MediaRecord(id, MediaGen.image(fmt, w, h, gen), MediaMeta(fmt, w, h, 0L))
          case _ =>
            val n = (gen % 800 + 8).toInt
            MediaRecord(id, MediaGen.wav(gen, n),
              MediaMeta("wav", 0, 0, n.toLong * 1000 / MediaGen.sampleRate))
        }
      }
  }

  /** Synthesize a deterministic video table: one YUV4MPEG2 stream per
    * id (4–19 × 4–15 px, 2–13 frames at 10 fps), pixels from the
    * [[MediaGen.grayVidAt]] formula. Executor-side like
    * [[syntheticMedia]]. */
  def syntheticVideo(df: DataFrame, idCol: String)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val w = (id % 16 + 4).toInt
      val h = (id % 12 + 4).toInt
      val frames = (id % 12 + 2).toInt
      MediaRecord(id, MediaGen.y4m(id, w, h, frames),
        MediaMeta("y4m", w, h, frames * 100L))
    }
  }

  /** Frame sampling over a video column: decode every `stride`-th frame
    * of each stream, batched per partition like [[extractFeatures]] —
    * the row explodes into its sampled frames executor-side, so frame
    * extraction parallelizes with the scan and nothing video-shaped
    * ever moves through a shuffle. */
  def frameSampleFeatures(media: Dataset[MediaRecord], stride: Int): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize)
        .flatMap(_.flatMap(r => MediaCodec.frameSample(r, stride)))
    }
  }

  /** [[MediaCodec.patchify]] over an image table, batched per
    * partition like every decoder here — each image explodes into its
    * patch rows executor-side, so image bytes never shuffle; only
    * (id, py, px, n, mean) rows do. Non-image records are skipped. */
  def patchFeatures(media: Dataset[MediaRecord], patch: Int): Dataset[PatchFeatures] = {
    import media.sparkSession.implicits._
    media.filter((r: MediaRecord) =>
        r.meta.format == "png" || r.meta.format == "jpeg")
      .mapPartitions { it =>
        it.grouped(MediaCodec.batchSize)
          .flatMap(_.flatMap(r => MediaCodec.patchify(r, patch)))
      }
  }

  /** [[MediaCodec.blockMeans]] over a wav table, batched per partition
    * like every decoder here — audio bytes stay in the scan, only
    * (id, block, mean) rows shuffle. Non-wav records are skipped. */
  def audioBlockFeatures(media: Dataset[MediaRecord], blockSize: Int): Dataset[AudioBlock] = {
    import media.sparkSession.implicits._
    media.filter((r: MediaRecord) => r.meta.format == "wav").mapPartitions { it =>
      it.grouped(MediaCodec.batchSize)
        .flatMap(_.flatMap(r => MediaCodec.blockMeans(r, blockSize)))
    }
  }

  /** [[MediaCodec.headerProbe]] over a media table: the catalogue pass.
    * No format filter — the probe CLASSIFIES (format comes from magic
    * bytes), so every record rides through; per-record cost is tens of
    * header bytes, never a decode. */
  def headerFeatures(media: Dataset[MediaRecord]): Dataset[MediaHeader] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize)
        .flatMap(_.map(MediaCodec.headerProbe))
    }
  }

  /** Embedded text metadata per asset ([[MediaCodec.textChunks]]):
    * (media_id, key, value) rows from PNG `tEXt` chunks — the
    * caption/source extraction that pairs an image corpus with text.
    * Header-scale record-local work; payload bytes never shuffle, only
    * the small metadata rows do. Non-PNG and truncated payloads yield
    * zero rows, never an exception. */
  def textMetadata(media: Dataset[MediaRecord]): Dataset[TextMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize)
        .flatMap(_.flatMap(MediaCodec.textChunks))
    }
  }

  /** Corruption triage over a media table: classify every payload as
    * `ok` / `header_only` / `unparseable` by combining the lenient
    * [[MediaCodec.headerProbe]] (format + header facts) with a STRICT
    * decode attempt on the sniffed format — the quarantine pass a
    * crawl ingest runs so one truncated object cannot fail a whole
    * decode job (the media sibling of the q68 corrupt-record
    * quarantine). Record-local and batched like every decoder here;
    * a failure is a VERDICT row, never an executor exception. */
  def triageFeatures(media: Dataset[MediaRecord]): Dataset[MediaTriage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize).flatMap(_.map { r =>
        val hdr =
          try MediaCodec.headerProbe(r)
          catch { case _: Exception =>
            MediaHeader(r.media_id, "unknown", 0, 0, 0L) }
        if (hdr.format == "unknown")
          MediaTriage(r.media_id, "unknown", 0, 0, 0L, "unparseable")
        else {
          val decodable =
            try hdr.format match {
              case "png" | "jpeg" =>
                javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(r.content)) != null
              case "wav" =>
                MediaCodec.blockMeans(r, 1 << 20); true
              case _ => false
            } catch { case _: Exception => false }
          MediaTriage(r.media_id, hdr.format, hdr.width, hdr.height,
            hdr.duration_ms, if (decodable) "ok" else "header_only")
        }
      })
    }
  }

  /** [[MediaTriage]] plus the exact payload fingerprint and (for
    * decodable images) the perceptual hash — one row per record from a
    * SINGLE decode. */
  case class MediaTriageHash(media_id: Long, format: String, width: Int,
      height: Int, duration_ms: Long, status: String, dhash: Long,
      fp: String)

  /** [[triageFeatures]] FUSED with [[dhashWithFingerprint]]: verdict,
    * md5 payload fingerprint and (png/jpeg, status `ok`) dHash from ONE
    * ImageIO pass per record — the front-door shape of a media ingest
    * (s37): running triage and hashing as separate ops decodes every
    * payload twice, and at 100 TB the decode IS the pipeline's cost.
    * Verdict semantics are identical to [[triageFeatures]]
    * (spec-pinned); `dhash` is 0 for anything that is not an `ok`
    * image, `fp` is always present (corrupt payloads still need
    * exact-dup identity for quarantine dedup). Record-local like every
    * decoder here; a failure is a verdict row, never an exception. */
  def triageWithImageHash(media: Dataset[MediaRecord]): Dataset[MediaTriageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val fp = md.digest(r.content).map("%02x".format(_)).mkString
        val hdr =
          try MediaCodec.headerProbe(r)
          catch { case _: Exception =>
            MediaHeader(r.media_id, "unknown", 0, 0, 0L) }
        if (hdr.format == "unknown")
          MediaTriageHash(r.media_id, "unknown", 0, 0, 0L, "unparseable",
            0L, fp)
        else {
          // decode ONCE; reuse the frame for verdict AND hash
          val (status, dhash) = hdr.format match {
            case "png" | "jpeg" =>
              val img =
                try javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(r.content))
                catch { case _: Exception => null }
              if (img == null) ("header_only", 0L)
              else ("ok", MediaCodec.dhashOf(img))
            case "wav" =>
              val decodable =
                try { MediaCodec.blockMeans(r, 1 << 20); true }
                catch { case _: Exception => false }
              (if (decodable) "ok" else "header_only", 0L)
            case _ => ("header_only", 0L)
          }
          MediaTriageHash(r.media_id, hdr.format, hdr.width, hdr.height,
            hdr.duration_ms, status, dhash, fp)
        }
      }
    }
  }

  /** Envelope segmentation: maximal runs of consecutive PCM blocks
    * whose block mean clears `threshold` — the islands pass a
    * voice-activity / silence-split pipeline runs over the
    * [[audioBlockFeatures]] envelope before cutting audio into
    * training segments. Block means are integer-exact (sum/count), so
    * with an integer-representable threshold the run boundaries are
    * engine-exact. The run id is block_idx − row_number over the
    * per-media qualifying blocks (the gaps-and-islands identity); the
    * window sorts ONLY (id, block) envelope rows — audio bytes stay
    * in the scan, and blocks-per-record is bounded by record length,
    * so the per-media partition can never skew beyond it. */
  def envelopeSegments(media: Dataset[MediaRecord], blockSize: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("block_idx")
    audioBlockFeatures(media, blockSize).toDF()
      .filter(col("mean_val") >= threshold)
      .withColumn("seg", col("block_idx") - row_number().over(w))
      .groupBy(col("media_id"), col("seg"))
      .agg(min("block_idx").as("start_block"),
        max("block_idx").as("end_block"),
        count(lit(1)).as("n_blocks"))
      .select("media_id", "start_block", "end_block", "n_blocks")
  }

  /** Synthesize a deterministic SCENE-structured video table:
    * [[MediaGen.y4mScenes]] streams whose frames are identical within a
    * `sceneLen`-frame scene and jump at boundaries — the fixture for
    * [[sceneCuts]]. Executor-side like [[syntheticVideo]]. */
  def syntheticSceneVideo(df: DataFrame, idCol: String, sceneLen: Int = 4)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      val w = (id % 16 + 4).toInt
      val h = (id % 12 + 4).toInt
      val frames = (id % 10 + 6).toInt
      MediaRecord(id, MediaGen.y4mScenes(id, w, h, frames, sceneLen),
        MediaMeta("y4m", w, h, frames * 100L))
    }
  }

  /** Scene-change (shot-cut) detection over a video column: a cut is a
    * frame whose mean absolute pixel difference from its predecessor
    * reaches `threshold` (0–255 gray scale). The per-record decode
    * emits at most frames−1 (media_id, frame_idx, mad) rows and the
    * comparison is record-local, so — like every multimodal operator
    * here — video bytes never shuffle; at 100 TB the cost is exactly
    * one decode pass parallel with the scan, and only the tiny cut
    * table moves on. Threshold semantics are exact, not heuristic, for
    * lossless streams (gate m10's closed-form oracle); for lossy
    * codecs pick a threshold above the codec's residual noise floor
    * (the m9 banding evidence). */
  def sceneCuts(media: Dataset[MediaRecord], threshold: Double): Dataset[FrameDelta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize)
        .flatMap(_.flatMap(r =>
          MediaCodec.frameDeltas(r).filter(_.mad >= threshold)))
    }
  }

  /** Per-image perceptual hash record. */
  case class ImageHash(media_id: Long, width: Int, height: Int, dhash: Long)

  /** Batched perceptual hashing of an image column — same partition-wise
    * shape as [[extractFeatures]]; emits one 64-bit dHash per image, the
    * key for Hamming-banded image near-dup joins.
    *
    * PRECONDITION (shared with [[dhashWithFingerprint]]): every record
    * must be a decodable image (png/jpeg). Mixed-modality inputs should
    * filter on `meta.format` first; a non-image record fails fast with
    * an IllegalArgumentException naming the offending media_id. */
  def dhashFeatures(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    // per-record (no batch buffering): dhash has no batch-level call to
    // amortize, so chunking would only hold batchSize payloads in memory
    media.mapPartitions(_.map(r =>
      ImageHash(r.media_id, r.meta.width, r.meta.height, MediaCodec.dhash(r))))
  }

  /** Per-image perceptual hash + exact payload fingerprint. */
  case class ImageHashFp(media_id: Long, width: Int, height: Int,
      dhash: Long, fp: String)

  /** [[dhashFeatures]] plus an exact payload fingerprint (hex md5) from
    * the SAME partition-side pass — the input shape for exact-dup
    * pre-collapse: group on `fp` (16 bytes) to one min-id representative,
    * then band only representatives. One decode per payload, and the
    * payload bytes themselves never reach a shuffle. Images-only, like
    * [[dhashFeatures]] — non-image records fail fast in
    * [[MediaCodec.dhash]]. */
  def dhashWithFingerprint(media: Dataset[MediaRecord]): Dataset[ImageHashFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val fp = md.digest(r.content).map("%02x".format(_)).mkString
        ImageHashFp(r.media_id, r.meta.width, r.meta.height,
          MediaCodec.dhash(r), fp)
      }
    }
  }

  /** One decoded gray raster: row-major 8-bit luminance bytes plus the
    * dimensions that give its length (n_bytes = width·height). */
  case class GrayRaster(media_id: Long, width: Int, height: Int,
      pixels: Array[Byte])

  /** Decode each image to its NORMALIZED representation — the row-major
    * 8-bit gray raster — the "decode/normalize" stage a training-data
    * pipeline runs between admission and packing: downstream consumers
    * (blob packs, tensor shards) want pixels, not codec containers, and
    * for lossless formats the raster is a pure function of the source
    * image (so pack offsets over rasters stay SQL-oracle-expressible,
    * unlike PNG byte lengths). Record-local decode, same partition-side
    * shape as [[dhashFeatures]]: payload bytes never shuffle until the
    * caller packs the (smaller) raster. Images-only — a non-decodable
    * record fails fast naming the media_id, same contract as
    * [[MediaCodec.dhash]]; run [[triageFeatures]] quarantine first. */
  def grayRaster(media: Dataset[MediaRecord]): Dataset[GrayRaster] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      if (img == null) throw new IllegalArgumentException(
        s"media_id ${r.media_id}: not a decodable image — grayRaster " +
        "requires png/jpeg records; triage/filter first")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = raster.getSample(x, y, 0).toByte
          x += 1
        }
        y += 1
      }
      GrayRaster(r.media_id, w, h, px)
    })
  }

  /** Per-image decode-fidelity audit record: pixel-level mean absolute
    * delta and whole-image mean (DC) delta against a reference pixel
    * function. */
  case class CodecFidelity(media_id: Long, width: Int, height: Int,
      pixel_mad: Double, dc_delta: Double)

  /** Decode-fidelity audit for LOSSY image codecs: decode each record
    * and compare every pixel against a closed-form reference function
    * of (id, x, y) — emitting mean |decoded − reference| (pixel_mad)
    * and |mean(decoded) − mean(reference)| (dc_delta). The op a media
    * pipeline runs to validate a lossy re-encode sweep: JPEG must keep
    * the DC within quantization error and pixels within a codec-level
    * band, while a broken decode (wrong stride, channel swap, garbage)
    * blows far past any such band. Per-record partition-side work;
    * payload bytes never shuffle. Images-only, like [[dhashFeatures]].
    */
  def decodeFidelity(media: Dataset[MediaRecord],
      ref: (Long, Int, Int) => Int): Dataset[CodecFidelity] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      if (img == null) throw new IllegalArgumentException(
        s"media_id ${r.media_id}: format '${r.meta.format}' is not a " +
        "decodable image — decodeFidelity requires png/jpeg records")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var sumAbs = 0L; var sumD = 0L; var sumF = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = raster.getSample(x, y, 0)
          val f = ref(r.media_id, x, y)
          sumAbs += math.abs(d - f); sumD += d; sumF += f
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      CodecFidelity(r.media_id, w, h, sumAbs.toDouble / n,
        math.abs(sumD.toDouble / n - sumF.toDouble / n))
    })
  }

  case class AudioHash(media_id: Long, durationMs: Long, ahash: Long)

  /** Batched perceptual hashing of an audio column — one 60-bit
    * delta-sign hash per stream ([[MediaCodec.audioHash]]), the key for
    * Hamming-banded audio near-dup joins. */
  def audioHashFeatures(media: Dataset[MediaRecord]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      AudioHash(r.media_id, r.meta.durationMs, MediaCodec.audioHash(r))))
  }

  /** Partition-wise batched feature extraction. Each executor thread
    * consumes its partition in [[MediaCodec.batchSize]] chunks — constant
    * memory per task regardless of partition size, no driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize).flatMap(b => MediaCodec.decodeBatch(b))
    }
  }

  /** Batched resample: images to (ow, oh) via nearest neighbor, audio
    * frame-sampled every `stride`-th sample. Same partition-wise batch
    * shape as [[extractFeatures]]. */
  def resampleFeatures(media: Dataset[MediaRecord], ow: Int, oh: Int,
      stride: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(MediaCodec.batchSize)
        .flatMap(b => b.map(r => MediaCodec.resample(r, ow, oh, stride)))
    }
  }

  /** BLOB-PACK INDEX — the WebDataset/tar-shard sample index every
    * multimodal training loader needs (public format: webdataset's
    * tar-with-offsets; TFRecord's record index is the same idea): each
    * shard concatenates its members' raw bytes in deterministic
    * (h64, id) order, and the index row `(shard, offset, length)`
    * addresses any sample without touching the bytes. Placement is the
    * same engine-portable md5-h64 used by
    * [[graft.ops.CorpusOps.shardShuffle]], so (salt, nShards) fully
    * replays the layout in any engine.
    *
    * Scale shape: ONE shuffle moving each payload once to its shard —
    * identical to the shard write itself; offsets are a running
    * byte-length window inside each shard (one reducer per shard;
    * shards are the parallelism unit). The index (4 longs/row) is the
    * distributed artifact; the blob write streams shard-local at write
    * time. PRECONDITION: `idCol` unique and non-null (position is a
    * pure function of the id) and `binCol` non-null (a null length
    * would silently skip the running byte window — see
    * [[packAssignBatch]]). RUNTIME-GUARDED since r14 at zero extra
    * cost (lag over the op's own window — [[Guards.laggedIdGuard]]);
    * opt out via `spark.graft.validate.ids=false`.
    *
    * @return df's columns + (shard INT, length BIGINT, offset BIGINT)
    */
  def packIndex(df: DataFrame, idCol: String, binCol: String, nShards: Int,
      salt: String = "graft-pack"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("graft_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // unique/non-null id + non-null payload guard riding the same
    // window partitioning (Guards.laggedIdGuard — zero extra pass)
    val wLag = Window.partitionBy(col("shard"))
      .orderBy(col("graft_h"), col(idCol))
    val off = coalesce(sum(col("length")).over(w), lit(0L))
    val offCol =
      if (Guards.enabled(df))
        off + Guards.laggedIdGuard(idCol, "packIndex", wLag,
          extraViolation = col("length").isNull,
          extraMsg = " and the payload non-null")
      else off
    df.withColumn("graft_h", graft.functions.TextFunctions.h64(
        concat_ws("-", lit(salt), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("graft_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("length", octet_length(col(binCol)).cast("long"))
      .withColumn("offset", offCol)
      .drop("graft_h")
  }

  /** One micro-batch of STREAMING pack-index assignment —
    * [[packIndex]]'s fold for an appending multimodal ingest: each
    * arriving payload gets its deterministic shard and the byte offset
    * `seen(shard) + within-batch (h64, id)-ordered cumulative length`.
    * State is O(nShards) rows of per-shard byte totals — the writer's
    * append cursor. Same contract as
    * [[graft.ops.CorpusOps.shardAssignBatch]]: within each batch the
    * order matches the batch op, across batches offsets reflect arrival
    * (a late payload is appended, never inserted), so id-ordered
    * batches give the batch-boundary-insensitive (batch, h64, id)
    * layout the oracle replays. PRECONDITION: ids unique and non-null
    * across all batches, and `binCol` non-null — a null payload has a
    * null length, which the running byte window would silently skip,
    * leaving the shard cursor wrong for every later row.
    *
    * @param seen (shard, n_bytes) per-shard byte totals so far; start
    *             from an empty DataFrame with that schema
    * @return (batch columns + (shard, length, offset), updated seen)
    */
  def packAssignBatch(seen: DataFrame, batch: DataFrame, idCol: String,
      binCol: String, nShards: Int,
      salt: String = "graft-pack"): (DataFrame, DataFrame) = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("graft_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // within-batch unique/non-null id + non-null payload guard (cross-
    // batch uniqueness stays the caller's documented contract)
    val wLag = Window.partitionBy(col("shard"))
      .orderBy(col("graft_h"), col(idCol))
    val cum = coalesce(sum(col("length")).over(w), lit(0L))
    val cumCol =
      if (Guards.enabled(batch))
        cum + Guards.laggedIdGuard(idCol, "packAssignBatch", wLag,
          extraViolation = col("length").isNull,
          extraMsg = " and the payload non-null")
      else cum
    val ranked = batch.withColumn("graft_h", graft.functions.TextFunctions.h64(
        concat_ws("-", lit(salt), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("graft_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("length", octet_length(col(binCol)).cast("long"))
      .withColumn("graft_cum", cumCol)
      .ckpt // assignment + state fold both read
    val assigned = ranked
      .join(broadcast(seen.select(col("shard"),
        col("n_bytes").as("graft_seen"))), Seq("shard"), "left")
      .withColumn("offset",
        coalesce(col("graft_seen"), lit(0L)) + col("graft_cum"))
      .drop("graft_h", "graft_cum", "graft_seen")
    val totals = ranked.groupBy("shard").agg(sum("length").as("graft_bn"))
    val newSeen = seen.join(totals, Seq("shard"), "full_outer")
      .select(col("shard"),
        (coalesce(col("n_bytes"), lit(0L)) +
          coalesce(col("graft_bn"), lit(0L))).as("n_bytes"))
    (assigned, newSeen)
  }
}
