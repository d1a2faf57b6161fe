package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: treat image/audio/video payloads as opaque
 * `binary` columns with a typed metadata struct, and run decode /
 * feature-extraction as partition-batched functions.
 *
 * The image path is REAL: [[decodeImageFeatures]] runs an actual
 * `javax.imageio` codec (pure JVM, no native deps) against the payload
 * bytes — header-only reads for dimensions, so it never materializes
 * pixel rasters for large images — and [[synthesizeImageContent]]
 * produces genuine PNG bytes to exercise it. The `mapPartitions`
 * boundary is where a production pipeline amortizes per-batch decoder
 * init (codec contexts, JNI sessions, model weights) — the same shape
 * `mapInPandas` gives Python pipelines; audio/video would slot into an
 * identical partition-batched decode with an ffmpeg-style JNI call.
 */
object Multimodal {

  /** Metadata carried alongside the opaque payload. */
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType)))

  /**
   * Wrap a text column as an opaque binary payload + metadata struct —
   * the generic ingestion shape for any media column.
   */
  def attachContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col(textCol).cast("binary")).cast("long").as("byte_len")).as("meta"))

  /** Deterministic per-id image dimensions for the synthetic corpus. */
  def syntheticDims(id: Long): (Int, Int) =
    (1 + (id % 16).toInt, 1 + ((id * 7) % 16).toInt)

  /**
   * Deterministic REAL image payloads: a (1+id%16) x (1+7id%16) RGB PNG
   * per row, encoded with `javax.imageio` inside `mapPartitions` (the
   * encoder analogue of the decode boundary). Stands in for reading
   * image files at ingestion; the bytes are genuine PNG streams any
   * decoder accepts.
   */
  def synthesizeImageContent(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType),
      StructField("meta", metaType)))
    // fanOut BEFORE the encode: the corpus arrives as a single-split
    // parquet scan at bench scale, so the whole fused encode(+downstream
    // decode) stage would run as ONE task while 31 cores idle — and the
    // exchange moves only the projected 8-byte id column. Scale-adaptive:
    // a corpus that already scans as many splits passes through untouched.
    fanOut(df.select(col(idCol).cast("long"))).mapPartitions { rows =>
      // per-partition codec context: one PNG writer + buffer reused for the
      // whole batch (ImageIO.write would re-scan the writer registry per
      // call — exactly the per-row overhead the mapPartitions boundary is
      // there to amortize)
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val buf = new ByteArrayOutputStream()
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = syntheticDims(id)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        buf.reset()
        // MemoryCacheImageOutputStream explicitly: ImageIO.createImageOutputStream
        // defaults to a FileCache stream that spools every payload through a
        // disk temp file (one create+delete per row)
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
        try {
          writer.setOutput(ios)
          writer.write(img)
        } finally ios.close()
        val bytes = buf.toByteArray
        Row(id, bytes, Row("image/png", bytes.length.toLong))
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic per-id video (animated-GIF) parameters. */
  def syntheticVideo(id: Long): (Int, Int, Int) =
    (1 + (id % 8).toInt, 1 + ((id * 3) % 8).toInt, 2 + (id % 6).toInt) // (w, h, frames)

  /**
   * Deterministic REAL "video" payloads: a multi-frame animated GIF per
   * row, written with `javax.imageio`'s GIF sequence writer (pure JVM) —
   * the closest genuine frame-sequence container available without
   * native codecs. [[decodeImageFeatures]] reads the true frame count
   * back via `getNumImages(allowSearch = true)`, so the n_frames column
   * is really decoded from the container, not echoed metadata. A
   * production mp4/webm path replaces only the codec inside the same
   * partition-batched boundary (ffmpeg/JNI), as the object doc notes.
   */
  def synthesizeVideoContent(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType),
      StructField("meta", metaType)))
    // fanOut before the encode — the synthesizeImageContent rationale:
    // single-split scans serialize the whole fused stage on one core,
    // and only the 8-byte id column moves
    fanOut(df.select(col(idCol).cast("long"))).mapPartitions { rows =>
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val buf = new ByteArrayOutputStream()
      // One fixed 3-3-2 RGB palette shared by every frame in the batch:
      // GIF is palette-indexed, and handing the writer TYPE_INT_RGB
      // frames forces a full color-quantization (palette derivation +
      // nearest-color search per pixel) PER FRAME. Pre-indexed frames
      // skip that entirely — the dominant cost of the encode at bench
      // scale — and the decoded width/height/frame-count (what the
      // pipeline extracts) are identical.
      val palette = new Array[Int](256)
      var p = 0
      while (p < 256) {
        val r8 = ((p >> 5) & 0x7) * 255 / 7
        val g8 = ((p >> 2) & 0x7) * 255 / 7
        val b8 = (p & 0x3) * 255 / 3
        palette(p) = (r8 << 16) | (g8 << 8) | b8
        p += 1
      }
      val cm = new java.awt.image.IndexColorModel(8, 256, palette, 0, false, -1,
        java.awt.image.DataBuffer.TYPE_BYTE)
      // non-interlaced frames, explicitly: the JDK GIF writer defaults
      // to interlacing, and the JDK GIF READER reassembles interlaced
      // frames wrong (rows land scrambled) — pixel-level consumers
      // (sampleVideoFrames) would read garbage
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h, frames) = syntheticVideo(id)
        buf.reset()
        // memory-cached for the same reason as the image path: no per-row
        // disk temp file
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < frames) {
            val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, (id * 31 + f * 131 + x * 7 + y).toInt & 0xff)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
            f += 1
          }
          writer.endWriteSequence()
        } finally ios.close()
        val bytes = buf.toByteArray
        Row(id, bytes, Row("image/gif", bytes.length.toLong))
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Evenly-spaced FRAME SAMPLING from real frame-sequence containers
   * (the training-data step that turns a video into k keyframes):
   * frame indexes `(i * n_frames) DIV k` for i < k (integer spacing —
   * replayable exactly; duplicates collapse when k > n_frames), each
   * sampled frame decoded for real and fingerprinted by its pixel sum.
   * One row per (doc, sampled frame): (doc_id, frame_idx, pix_sum);
   * undecodable payloads contribute nothing. One mapPartitions pass
   * with a per-partition cached GIF reader; payloads never shuffle. A
   * production mp4 path swaps the codec inside the same boundary.
   */
  def sampleVideoFrames(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("pix_sum", LongType)))
    df.select(col(idCol).cast("long"), col(contentCol)).mapPartitions { rows =>
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, false, true)
          val frames = reader.getNumImages(true)
          val idxs = (0 until k).map(i => (i.toLong * frames / k).toInt).distinct
          idxs.map { f =>
            val img = reader.read(f)
            var s = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                s += img.getRGB(x, y) & 0xffffff
                x += 1
              }
              y += 1
            }
            Row(id, f, s)
          }
        } catch {
          case scala.util.control.NonFatal(_) => Seq.empty[Row]
        } finally {
          reader.setInput(null)
          iis.close()
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic per-id audio parameters for the synthetic corpus. */
  def syntheticAudio(id: Long): (Int, Int) =
    (8000, 100 + (id % 400).toInt) // (sample rate Hz, frame count)

  /**
   * Deterministic REAL audio payloads: a 16-bit mono PCM WAV per row
   * (sine-ish samples derived from the id), encoded with
   * `javax.sound.sampled` inside `mapPartitions` — genuine WAV streams
   * any decoder accepts, zero native deps.
   */
  def synthesizeAudioContent(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType),
      StructField("meta", metaType)))
    // NO fanOut here, unlike the image/video sources: the javax.sound
    // codec path serializes on a global provider-registry lock, so a
    // 32-way stage CONVOYS and runs slower than one core (measured:
    // q36 0.67 s serial -> 1.9 s fanned out, the 32-task synth+decode
    // stage alone 1.0-2.1 s). Parallel audio decode needs a codec
    // without a global lock, not more tasks.
    df.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (rate, frames) = syntheticAudio(id)
        // canonical 44-byte RIFF/WAVE PCM header written directly —
        // byte-identical to AudioSystem.write's output for 16-bit mono
        // PCM, without the per-row writer-registry lookup and
        // AudioInputStream/stream allocations it costs
        val dataLen = frames * 2
        val bytes = new Array[Byte](44 + dataLen)
        def le32(off: Int, v: Int): Unit = {
          bytes(off) = (v & 0xff).toByte
          bytes(off + 1) = ((v >> 8) & 0xff).toByte
          bytes(off + 2) = ((v >> 16) & 0xff).toByte
          bytes(off + 3) = ((v >> 24) & 0xff).toByte
        }
        def le16(off: Int, v: Int): Unit = {
          bytes(off) = (v & 0xff).toByte
          bytes(off + 1) = ((v >> 8) & 0xff).toByte
        }
        def tag(off: Int, s: String): Unit = {
          var i = 0
          while (i < 4) { bytes(off + i) = s.charAt(i).toByte; i += 1 }
        }
        tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
        tag(12, "fmt "); le32(16, 16) // PCM fmt chunk length
        le16(20, 1) // PCM
        le16(22, 1) // mono
        le32(24, rate)
        le32(28, rate * 2) // byte rate
        le16(32, 2) // block align
        le16(34, 16) // bits per sample
        tag(36, "data"); le32(40, dataLen)
        var i = 0
        while (i < frames) {
          val sample = (math.sin((id % 16 + 1) * i * 0.05) * 8000).toInt
          bytes(44 + 2 * i) = (sample & 0xff).toByte
          bytes(44 + 2 * i + 1) = ((sample >> 8) & 0xff).toByte
          i += 1
        }
        Row(id, bytes, Row("audio/wav", bytes.length.toLong))
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Partition-batched REAL audio decode: content -> (sample_rate,
   * channels, n_frames, format) via `javax.sound.sampled` header reads.
   * Undecodable or null payloads keep their row with null features.
   */
  def decodeAudioFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("format", StringType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        if (content == null) {
          Row(id, null, null, null, null, null)
        } else {
          try {
            val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(content))
            val fmt = aff.getFormat
            Row(id, content.length.toLong,
              fmt.getSampleRate.toInt, fmt.getChannels,
              aff.getFrameLength.toLong, aff.getType.getExtension)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              Row(id, content.length.toLong, null, null, null, null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Acoustic fingerprint over REAL decoded PCM: decode the WAV payload,
   * split the 16-bit mono sample stream into 65 equal windows (floor
   * boundaries `w*n/65`), take each window's integer energy (sum of
   * |sample|), and emit the 64-bit energy-gradient hash (bit `w` set iff
   * `energy(w+1) > energy(w)`) — the chromaprint-shaped comparison
   * fingerprint, from integer arithmetic over the decoded samples so the
   * hash is an exactly-reproducible function of the payload. Identical
   * audio hashes identically; re-encoded/trimmed near-duplicates land
   * within a few bits. Pair search reuses [[imageNearDupPairs]] (the
   * banded hamming join is modality-agnostic: any 64-bit fingerprint
   * column works). Undecodable or null payloads keep their row with a
   * null fingerprint. Zero shuffle; decode is partition-batched.
   */
  def audioFingerprint(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("afp", LongType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        val pcm: Array[Byte] =
          if (content == null) null
          else try {
            val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(content))
            try in.readAllBytes() finally in.close()
          } catch { case scala.util.control.NonFatal(_) => null }
        val n = if (pcm == null) 0 else pcm.length / 2
        if (n < 66) Row(id, null) // fewer samples than windows: no gradient
        else {
          val energy = new Array[Long](65)
          var w = 0
          while (w < 65) {
            val from = w * n / 65
            val until = (w + 1) * n / 65
            var e = 0L
            var i = from
            while (i < until) {
              // 16-bit little-endian mono
              val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort
              e += math.abs(s.toLong)
              i += 1
            }
            energy(w) = e
            w += 1
          }
          var hash = 0L
          w = 0
          while (w < 64) {
            if (energy(w + 1) > energy(w)) hash |= 1L << w
            w += 1
          }
          Row(id, hash)
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Frame sampling over video-like containers: every `every`-th frame of
   * each payload becomes its own output row (doc_id, frame_idx, width,
   * height) with dimensions REALLY decoded per frame from the container
   * bytes — the generator-shaped multimodal op (one input row, N output
   * rows) a frame-level training pipeline starts from. A production
   * pipeline appends the extracted frame bytes/tensor per row; the
   * decode boundary, batching, and row-explosion shape are exactly this.
   * Zero shuffle: rows explode inside the same `mapPartitions` pass, one
   * cached GIF reader per partition. Undecodable payloads yield no rows
   * (filter on [[decodeImageFeatures]] to audit them).
   */
  def sampleFrames(df: DataFrame, idCol: String, every: Int): DataFrame = {
    require(every > 0, s"frame stride must be positive, got $every")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (r.isNullAt(0) || content == null) Nil
        else {
          val id = r.getLong(0)
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(content))
          // materialized eagerly: the stream closes before flatMap pulls
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            (0 until n by every).map { f =>
              Row(id, f, reader.getWidth(f), reader.getHeight(f))
            }.toVector
          } catch {
            // NonFatal: JDK image readers throw RuntimeExceptions on
            // malformed containers, not only IOException
            case scala.util.control.NonFatal(_) => Nil
          } finally {
            reader.setInput(null)
            iis.close()
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Partition-batched REAL image resize: decode each payload's first
   * frame, nearest-neighbor resample to `outW` x `outH` (source pixel
   * `(x*srcW)/outW, (y*srcH)/outH` — pure integer floor arithmetic, so
   * output pixels are an exactly-reproducible function of input pixels),
   * re-encode as PNG, and emit an integer checksum (sum of the 24-bit
   * RGB of every output pixel) that pins the resample REALLY read the
   * decoded pixels — the oracle recomputes it from the planted pixel
   * formula, and any decoder/resampler drift breaks the match.
   * Undecodable payloads keep their row with null features (a curation
   * pipeline filters on them rather than failing a 100 TB job). Zero
   * shuffle; one decoder + one encoder context per partition.
   */
  def resizeImages(df: DataFrame, idCol: String, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"output dims must be positive, got ${outW}x$outH")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("checksum", LongType),
      StructField("content", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val buf = new ByteArrayOutputStream()
      rows.map { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        if (content == null) {
          Row(id, null, null, null, null)
        } else {
          val src =
            try ImageIO.read(new java.io.ByteArrayInputStream(content))
            catch { case scala.util.control.NonFatal(_) => null }
          if (src == null) {
            Row(id, null, null, null, null)
          } else {
            val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
            var checksum = 0L
            var y = 0
            while (y < outH) {
              val sy = y * src.getHeight / outH
              var x = 0
              while (x < outW) {
                val rgb = src.getRGB(x * src.getWidth / outW, sy) & 0xffffff
                out.setRGB(x, y, rgb)
                checksum += rgb
                x += 1
              }
              y += 1
            }
            buf.reset()
            val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
            try {
              writer.setOutput(ios)
              writer.write(out)
            } finally ios.close()
            Row(id, outW, outH, checksum, buf.toByteArray)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Perceptual dHash over REAL decoded image payloads: decode -> 9x8
   * nearest-neighbor downsample (the floor sampling of [[resizeImages]])
   * -> integer grayscale `(r+g+b)/3` -> 64-bit gradient hash (bit
   * `y*8+x` set iff `gray(x+1,y) > gray(x,y)`). Two images within a few
   * bits of hamming distance are near-identical up to re-encoding — the
   * standard image near-duplicate fingerprint. Pure integer arithmetic
   * end to end, so the hash is an exactly-reproducible function of the
   * decoded pixels. Undecodable or null payloads keep their row with a
   * null hash (filter, don't fail, at 100 TB). Zero shuffle; one decoder
   * context per partition.
   */
  def imageDhash(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("phash", LongType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        val img = if (content == null) null
        else try ImageIO.read(new ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) Row(id, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val gray = Array.ofDim[Int](8, 9)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              val rgb = img.getRGB(x * w / 9, y * h / 8) & 0xffffff
              gray(y)(x) =
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          var hash = 0L
          y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (gray(y)(x + 1) > gray(y)(x)) hash |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          Row(id, hash)
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Image near-duplicate pairs from dHash fingerprints — the multimodal
   * analogue of text simhash banding. The 64-bit hash splits into
   * `bands` slices; a pair within `maxHamming` bits differs in at most
   * `maxHamming < bands` slices, so by pigeonhole it matches EXACTLY on
   * at least one slice and the banded equi-join loses nothing (recall is
   * exact, like `Dedup.simhashNearDupPairs`). Candidates verify with the
   * native `bit_count(a ^ b)` expression — codegen'd, no UDF. One
   * shuffle on (band, slice) 12-byte keys, never a cross join; the
   * verification rides the join output, so each hash travels as one
   * extra long.
   */
  def imageNearDupPairs(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banding is only lossless for maxHamming < bands, got $maxHamming >= $bands")
    val bandLen = 64 / bands
    val mask = if (bandLen == 64) -1L else (1L << bandLen) - 1L
    val hs = hashes.select(col(idCol).as("id"), col(hashCol).cast("long").as("h"))
      .where(col("h").isNotNull)
    val banded = hs.select(col("id"), col("h"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => call_function("shiftrightunsigned", col("h"), b * lit(bandLen))
          .bitwiseAND(lit(mask)))))
      .toDF("id", "h", "band", "key")
    // Emit each candidate pair ONLY in its FIRST matching band: a pair
    // matching in k bands used to emit k times and a distinct() then
    // re-shuffled the whole candidate set to collapse them — on a
    // duplicate-heavy corpus that exchange dwarfs everything else in the
    // operator (measured 26 MB / ~20M rows at sf0.1 vs ~1 MB of banded
    // keys). Both hashes already ride the join, so "first matching band"
    // is a pure expression on their XOR: band j matches iff slice j of
    // the XOR is zero. The when-chain is whole-stage-codegen-friendly
    // (no higher-order functions), and the join's own equi-key guarantees
    // the current band matches, so the chain always terminates at or
    // before `band`.
    val xor = col("a.h").bitwiseXOR(col("b.h"))
    def xorSlice(b: Int) =
      call_function("shiftrightunsigned", xor, lit(b * bandLen))
        .bitwiseAND(lit(mask))
    val firstMatchingBand = (bands - 1 to 0 by -1)
      .foldLeft(lit(bands).cast("int")) { (rest, b) =>
        when(xorSlice(b) === 0L, lit(b)).otherwise(rest)
      }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id") && firstMatchingBand === col("a.band"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Partition-batched REAL image decode: content -> (width, height,
   * n_frames, format) via `javax.imageio` header reads. Undecodable or
   * null payloads keep their row with null feature columns (a curation
   * pipeline filters on them rather than failing the job). Zero shuffle;
   * one reader context per payload, resolved per partition.
   */
  def decodeImageFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType)))
    val input = df.select(col(idCol).cast("long"), col("content"))
    input.mapPartitions { rows =>
      // Reader reuse: resolving a reader through ImageIO.getImageReaders
      // walks the service registry and allocates a fresh reader PER ROW.
      // Sniffing the container magic and caching one reader per format
      // amortizes that to once per (partition, format) — the decoder-init
      // cost this mapPartitions boundary exists to amortize. Unknown
      // magics still fall back to the registry scan.
      val readerCache = scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
      def sniffFormat(b: Array[Byte]): String =
        if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
        else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
        else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
        else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
        else ""
      rows.map { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else r.getLong(0)
        val content = r.getAs[Array[Byte]](1)
        if (content == null) {
          Row(id, null, null, null, null, null)
        } else {
          // memory-cached: the default createImageInputStream spools the
          // payload to a disk temp file per row
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(content))
          try {
            val fmt = sniffFormat(content)
            val reader =
              if (fmt.nonEmpty) {
                readerCache.getOrElseUpdate(fmt,
                  ImageIO.getImageReadersByFormatName(fmt).next())
              } else {
                val readers = ImageIO.getImageReaders(iis)
                if (readers.hasNext) readers.next() else null
              }
            if (reader == null) {
              Row(id, content.length.toLong, null, null, null, null)
            } else {
              try {
                // seekForwardOnly must be false for getNumImages(allowSearch)
                reader.setInput(iis, false, true)
                Row(id, content.length.toLong,
                  reader.getWidth(0), reader.getHeight(0),
                  reader.getNumImages(true), reader.getFormatName.toLowerCase)
              } catch {
                // right magic, rotten body (truncated/corrupt container):
                // null features, like any other undecodable payload.
                // NonFatal, not just IOException — the JDK GIF/PNG readers
                // throw RuntimeExceptions (AIOOBE, NegativeArraySize) on
                // malformed code tables, and one bad payload must not
                // kill a 100 TB job
                case scala.util.control.NonFatal(_) =>
                  Row(id, content.length.toLong, null, null, null, null)
              } finally {
                // cached readers are reset (releasing the stream) and
                // reused; registry-resolved ones are disposed outright
                if (fmt.nonEmpty) reader.setInput(null) else reader.dispose()
              }
            }
          } finally iis.close()
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Pixel-level feature extraction from REAL image payloads: decode
   * each image, sum the three channels over every pixel, and build an
   * 8x8 (configurable) NEAREST-NEIGHBOR thumbnail whose pixel sum is
   * the resize fingerprint. Nearest-neighbor (source pixel at
   * `(tx*w DIV t, ty*h DIV t)`) is chosen deliberately over
   * interpolating scalers: it is pure integer sampling, so the resize
   * is bit-reproducible across JVMs and replayable arithmetically by
   * the oracle — an interpolated resize depends on the scaler's float
   * kernel and is not. Undecodable payloads yield null features (the
   * decode-stats contract). One mapPartitions pass; payloads never
   * shuffle.
   *
   * Output: (doc_id, width, height, sum_r, sum_g, sum_b, thumb_sum).
   */
  def imageFeatures(
      df: DataFrame,
      idCol: String,
      contentCol: String,
      thumb: Int = 8): DataFrame = {
    require(thumb >= 1, s"thumb must be >= 1, got $thumb")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("thumb_sum", LongType)))
    df.select(col(idCol).cast("long"), col(contentCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        try {
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          if (img == null) Row(id, null, null, null, null, null, null)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = img.getRGB(x, y) & 0xffffff
                sr += (v >> 16) & 255; sg += (v >> 8) & 255; sb += v & 255
                x += 1
              }
              y += 1
            }
            var ts = 0L
            var ty = 0
            while (ty < thumb) {
              var tx = 0
              while (tx < thumb) {
                ts += img.getRGB(tx * w / thumb, ty * h / thumb) & 0xffffff
                tx += 1
              }
              ty += 1
            }
            Row(id, w, h, sr, sg, sb, ts)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, null, null, null, null, null, null)
        }
      }
    }(Encoders.row(outSchema))
  }
}
