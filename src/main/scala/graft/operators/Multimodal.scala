package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column operators.
  *
  * Model: an asset is an opaque `binary` payload plus typed metadata —
  * `struct(content BINARY, mime STRING, meta STRUCT(...))`. Everything
  * relational (schema, filters, grouping, partitioning, batch plumbing) is
  * real and tested. All three modalities have REAL pure-JDK codecs:
  * IMAGE ([[decodeImageBatch]], `javax.imageio`), AUDIO
  * ([[decodeAudioBatch]], `javax.sound.sampled` WAV/PCM) and MOTION
  * ([[decodeVideoBatch]], multi-frame animated GIF via `javax.imageio`).
  * Formats needing native libraries (MP4/H.264, MP3) keep the
  * deterministic stub feature path (clearly marked STUB below) — swapping
  * in such a decoder changes one function value, not the pipeline shape.
  *
  * Scale notes: payloads never pass through a shuffle in these operators —
  * metadata extraction and feature derivation are map-side projections;
  * grouping operates on extracted scalar columns. Batched decode
  * (`decodeBatched`) mirrors the `mapInPandas` batch shape: partitions are
  * chunked into fixed-size batches so a vectorized/native decoder amortizes
  * per-call overhead, with batch size bounding decoder memory.
  */
object Multimodal {

  // ImageIO defaults to useCache=true: every ImageIO.read/write spools
  // through a TEMP FILE on disk, so per-image codec work silently pays two
  // file creations + disk writes per row — measured r17 as these rows
  // inflating 2-3x whenever the host disk degraded, and as 32-way parallel
  // decode thrashing where it should scale. All payloads here are
  // in-memory byte arrays; cache off makes the streams heap-backed. Runs
  // in the object initializer so every JVM that touches a codec helper
  // (driver or executor — the mapPartitions lambdas dereference this
  // object) flips it before first use.
  javax.imageio.ImageIO.setUseCache(false)

  /** Asset struct from a binary payload + mime. */
  def asset(content: Column, mime: Column): Column =
    struct(content.as("content"), mime.as("mime"))

  /** Deterministic fake payload from a text column (UTF-8 bytes) — the
    * fixture generator for tests/oracles (real pipelines read binary files
    * via `spark.read.format("binaryFile")`).
    */
  def fakePayloadFromText(text: Column): Column = encode(text, "UTF-8")

  /** Metadata extraction: byte size + SHA-256 content address + mime. The
    * content-address is the dedup key for exact multimodal dedup (same
    * hash-groupBy shape as text `Dedup.exactGroups`).
    */
  def withAssetMetadata(df: DataFrame, contentCol: String, mimeCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(contentCol)).cast("long"))
      .withColumn("content_sha", sha2(col(contentCol), 256))
      .withColumn("media_type", split(col(mimeCol), "/").getItem(0))

  /** STUB decode → fixed-dim feature vector. A real implementation decodes
    * the image/audio and runs a feature extractor; this deterministic stand-in
    * derives pseudo-features from content hashes so tests exercise the real
    * schema (`array<double>`), null behavior, and scale shape (map-only,
    * codegen'd). Feature i = (first 32 bits of md5(content ++ ":i") mod 1e6)
    * scaled to [0, 1) — md5 rather than xxhash64 so the derivation is
    * bit-reproducible OUTSIDE Spark and the driver's DuckDB oracle can
    * value-check the whole decode-plumbing path, not just count rows.
    */
  def stubDecodeFeatures(content: Column, dim: Int): Column =
    // explicit null guard: a missing asset must yield null features, not a
    // vector fabricated from the bare suffix bytes
    when(content.isNull, lit(null).cast(ArrayType(DoubleType, containsNull = false)))
      .otherwise(transform(sequence(lit(0), lit(dim - 1)),
        i => (conv(substring(md5(concat(content,
                encode(concat(lit(":"), i.cast("string")), "UTF-8"))), 1, 8), 16, 10)
              .cast("long") % 1000000L).cast("double") / 1000000.0))

  /** STUB "resize": real resize re-encodes pixels; the stand-in truncates
    * the payload to `maxBytes` (deterministic, size-bounded like a thumbnail)
    * and tags the mime. Byte-slicing binaries is the real plumbing a
    * thumbnailer needs (substr works on BinaryType).
    */
  def stubResize(content: Column, maxBytes: Int): Column =
    substring(content, 1, maxBytes)

  /** Frame sampling: every `stride`-th fixed-length slice of the payload —
    * for video this is "every Nth frame", here expressed over raw bytes.
    * Returns `array<binary>`; exploding it yields one row per frame, the
    * shape a per-frame feature pass consumes.
    */
  def frameSample(content: Column, frameLen: Int, stride: Int): Column =
    transform(
      sequence(lit(0),
        // `/` on Columns is double division; truncate back to int for sequence
        (greatest((length(content) - frameLen).cast("int"), lit(0)) / stride).cast("int")),
      i => substring(content, (i * stride + 1).cast("int"), lit(frameLen)))

  private val FeatureSchema = ArrayType(DoubleType, containsNull = false)

  /** REAL image codec (no stub): decodes via `javax.imageio` — PNG, BMP,
    * GIF, JPEG readers ship in the JDK, so one modality is genuinely
    * decoded with zero native dependencies. Features =
    * `[width, height, mean_r, mean_g, mean_b]`; null for null or
    * undecodable payloads (ImageIO returns null on unknown formats — the
    * lenient-ingest rule C7/C8 applied to binary). Plug into
    * [[decodeBatched]]; other mimes keep the stub.
    */
  val decodeImageBatch: Seq[Array[Byte]] => Seq[Array[Double]] = _.map { bytes =>
    if (bytes == null) null
    else {
      // NonFatal, not just IOException: plugin readers throw RuntimeExceptions
      // (NegativeArraySizeException, IllegalArgumentException) on malformed-
      // but-recognized headers — the lenient-ingest rule (C7/C8) applies to
      // every decode failure, not only clean I/O errors.
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Array(w.toDouble, h.toDouble,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
  }

  /** REAL image resize (pure JDK): decode via `javax.imageio`, scale by an
    * INTEGRAL factor with explicit nearest-neighbor pixel replication, and
    * re-encode as PNG bytes. Integral replication maps every source pixel
    * to an exact `scale x scale` block, so per-channel means are preserved
    * BIT-EXACTLY — the property that lets the DuckDB oracle value-check a
    * genuine decode→transform→re-encode→decode round trip, not just
    * metadata arithmetic. Null/undecodable payloads stay null (C7/C8 rule).
    * Same mapPartitions batch shape as [[decodeBatched]]; payloads never
    * shuffle.
    */
  def resizeImageBatched(df: DataFrame, contentCol: String, scale: Int,
                         outCol: String = "resized"): DataFrame = {
    require(scale >= 1, s"resizeImageBatched: scale must be >= 1, got $scale")
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out: Array[Byte] =
          if (bytes == null) null
          else {
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) null
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val big = new java.awt.image.BufferedImage(
                w * scale, h * scale, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h * scale) {
                var x = 0
                while (x < w * scale) {
                  big.setRGB(x, y, img.getRGB(x / scale, y / scale))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(big, "png", bos)
              bos.toByteArray
            }
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Perceptual AVERAGE-HASH (aHash) of one decoded image: sample an 8×8
    * grid by nearest neighbor (`x·w/8`, `y·h/8` — integer floor, the
    * resize family's replication arithmetic), integer luma per cell
    * (`(299r + 587g + 114b) / 1000`), bit `8y+x` set iff the cell's luma
    * exceeds the integer mean of all 64 — the classic image near-dup
    * fingerprint (two encodings/resolutions of the same picture land
    * within a few bits; distinct pictures differ in many). All-integer
    * arithmetic on exactly-decoded pixels, so the hash is deterministic
    * across JVMs. Null/undecodable payloads hash to null (C7/C8 rule).
    */
  val imageAHashBatch: Seq[Array[Byte]] => Seq[java.lang.Long] = _.map { bytes =>
    if (bytes == null) null
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val luma = new Array[Int](64)
        var sum = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val p = img.getRGB(x * w / 8, y * h / 8)
            val l = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
              114 * (p & 0xff)) / 1000
            luma(8 * y + x) = l
            sum += l
            x += 1
          }
          y += 1
        }
        val mean = sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (luma(i) > mean) hash |= (1L << i)
          i += 1
        }
        java.lang.Long.valueOf(hash)
      }
    }
  }

  /** Append the perceptual hash column (`outCol: bigint`, null for
    * undecodable payloads) — the [[decodeBatched]] batch shape; payloads
    * never shuffle, only the 8-byte hash does.
    */
  def withImageAHash(df: DataFrame, contentCol: String,
                     outCol: String = "phash", batchSize: Int = 64): DataFrame =
    withImageHash(df, contentCol, outCol, batchSize, imageAHashBatch)

  private def withImageHash(df: DataFrame, contentCol: String, outCol: String,
                            batchSize: Int,
                            hasher: Seq[Array[Byte]] => Seq[java.lang.Long])
      : DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outCol, LongType, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val hashes = hasher(batch.map(_.getAs[Array[Byte]](idx)))
        batch.lazyZip(hashes).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(enc)
  }

  private def decodeOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }

  /** Integer luma of the nearest-neighbor sample at grid cell (gx, gy)
    * of a gw×gh grid — the [[imageAHashBatch]] sampling arithmetic
    * shared by all three perceptual hashes so their grids align.
    */
  private def lumaAt(img: java.awt.image.BufferedImage,
                     gx: Int, gy: Int, gw: Int, gh: Int): Int = {
    val p = img.getRGB(gx * img.getWidth / gw, gy * img.getHeight / gh)
    (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
  }

  /** Perceptual DIFFERENCE-HASH (dHash) of one decoded image: sample a
    * 9×8 luma grid, bit `8y+x` set iff cell (x+1, y) is brighter than
    * cell (x, y) — the horizontal-gradient fingerprint (Krawetz's
    * dHash). Gradients survive global brightness/contrast shifts that
    * move [[imageAHashBatch]]'s mean, so the two hashes fail
    * differently — the reason near-dup stacks carry both. All-integer,
    * deterministic across JVMs; null for null/undecodable payloads.
    */
  val imageDHashBatch: Seq[Array[Byte]] => Seq[java.lang.Long] = _.map { bytes =>
    val img = decodeOrNull(bytes)
    if (img == null) null
    else {
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        var prev = lumaAt(img, 0, y, 9, 8)
        while (x < 8) {
          val next = lumaAt(img, x + 1, y, 9, 8)
          if (next > prev) hash |= (1L << (8 * y + x))
          prev = next
          x += 1
        }
        y += 1
      }
      java.lang.Long.valueOf(hash)
    }
  }

  // DCT-II basis for the 32-point transform, built once per JVM:
  // cos((2n+1)·k·π/64). Doubles, but the same literal table and the same
  // summation order on every executor — the hash is bit-deterministic
  // across JVMs (IEEE semantics), just not SQL-replayable.
  private lazy val dct32: Array[Array[Double]] = {
    val t = Array.ofDim[Double](32, 32)
    var k = 0
    while (k < 32) {
      var n = 0
      while (n < 32) {
        t(k)(n) = math.cos((2 * n + 1) * k * math.Pi / 64)
        n += 1
      }
      k += 1
    }
    t
  }

  /** Perceptual DCT-HASH (classic pHash): 32×32 luma grid, 2D DCT-II,
    * keep the 8×8 lowest-frequency block minus the DC term, bit `8y+x`
    * set iff that coefficient exceeds the MEDIAN of the 63 — the
    * frequency-domain fingerprint, robust to the blur/re-encode noise
    * that flips [[imageAHashBatch]]/[[imageDHashBatch]] spatial bits
    * (the DCT concentrates the pattern's energy in the low block; pixel
    * noise lands in high frequencies the hash never reads). Row/column
    * separable transform (32·32·64 mults per image), fixed summation
    * order, so the hash is deterministic across JVMs. Null for
    * null/undecodable payloads.
    */
  val imagePHashDctBatch: Seq[Array[Byte]] => Seq[java.lang.Long] = _.map { bytes =>
    val img = decodeOrNull(bytes)
    if (img == null) null
    else {
      val g = Array.ofDim[Double](32, 32)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          g(y)(x) = lumaAt(img, x, y, 32, 32).toDouble
          x += 1
        }
        y += 1
      }
      // rows then columns; only the first 8 output frequencies matter
      val rows = Array.ofDim[Double](32, 8)
      y = 0
      while (y < 32) {
        var k = 0
        while (k < 8) {
          var s = 0.0
          var n = 0
          while (n < 32) { s += g(y)(n) * dct32(k)(n); n += 1 }
          rows(y)(k) = s
          k += 1
        }
        y += 1
      }
      val coeff = new Array[Double](64)
      var ky = 0
      while (ky < 8) {
        var kx = 0
        while (kx < 8) {
          var s = 0.0
          var n = 0
          while (n < 32) { s += rows(n)(kx) * dct32(ky)(n); n += 1 }
          coeff(8 * ky + kx) = s
          kx += 1
        }
        ky += 1
      }
      // median of the 63 AC coefficients (DC excluded — it is only the
      // global brightness); 63 is odd, so the median is the 32nd order
      // statistic exactly — no even-count averaging, which would bias
      // the threshold below the true median whenever ac(30) < ac(31)
      val ac = java.util.Arrays.copyOfRange(coeff, 1, 64)
      java.util.Arrays.sort(ac)
      val median = ac(31)
      var hash = 0L
      var i = 1
      while (i < 64) {
        if (coeff(i) > median) hash |= (1L << i)
        i += 1
      }
      java.lang.Long.valueOf(hash)
    }
  }

  /** Append the dHash column — [[withImageAHash]]'s gradient twin. */
  def withImageDHash(df: DataFrame, contentCol: String,
                     outCol: String = "dhash", batchSize: Int = 64): DataFrame =
    withImageHash(df, contentCol, outCol, batchSize, imageDHashBatch)

  /** Append the DCT pHash column — [[withImageAHash]]'s frequency twin. */
  def withImagePHashDct(df: DataFrame, contentCol: String,
                        outCol: String = "dct_hash",
                        batchSize: Int = 64): DataFrame =
    withImageHash(df, contentCol, outCol, batchSize, imagePHashDctBatch)

  /** Image near-duplicate groups over a perceptual-hash column: banded
    * Hamming candidate pairs ([[Dedup.hammingNearDupPairs]] — the SimHash
    * LSH core over any 64-bit signature, never all-pairs) + connected
    * components with min-id group labels. Rows with a null hash
    * (undecodable) are excluded — nothing to compare. Returns
    * (id, group_id) for every hashed image, singletons included.
    */
  def imageNearDupGroups(df: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int = 2): DataFrame =
    Dedup.signatureNearDupGroups(df, idCol, hashCol, maxHamming,
      s"imageNearDupGroups(maxHamming=$maxHamming)")

  /** Perceptual ENERGY-HASH of one decoded WAV (PCM16, the
    * [[decodeAudioBatch]] decode contract): frames split into 64 equal
    * windows (nearest-boundary `w·n/64`), integer mean |sample| per
    * window, bit w set iff the window's energy exceeds the integer mean
    * of all 64 — [[imageAHashBatch]]'s temporal twin, the audio near-dup
    * fingerprint (re-encodes and small edits of the same clip land
    * within a few bits). Null for null/non-PCM16/undecodable payloads
    * and for clips shorter than 64 frames (no full window grid).
    */
  val audioEnergyHashBatch: Seq[Array[Byte]] => Seq[java.lang.Long] = _.map { bytes =>
    if (bytes == null) null
    else {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            null
          else {
            val data = in.readAllBytes()
            val n = data.length / 2
            if (n < 64) null
            else {
              val abs = new Array[Long](n)
              var i = 0
              while (i < n) {
                val s =
                  if (fmt.isBigEndian)
                    (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
                  else
                    (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
                abs(i) = math.abs(s.toLong)
                i += 1
              }
              val energy = new Array[Long](64)
              var sum = 0L
              var w = 0
              while (w < 64) {
                val from = w * n / 64
                val until = (w + 1) * n / 64
                var e = 0L
                var j = from
                while (j < until) { e += abs(j); j += 1 }
                energy(w) = if (until > from) e / (until - from) else 0L
                sum += energy(w)
                w += 1
              }
              val mean = sum / 64
              var hash = 0L
              w = 0
              while (w < 64) {
                if (energy(w) > mean) hash |= (1L << w)
                w += 1
              }
              java.lang.Long.valueOf(hash)
            }
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    }
  }

  /** Append the audio energy-hash column — the [[withImageAHash]] batch
    * shape for WAV payloads.
    */
  def withAudioEnergyHash(df: DataFrame, contentCol: String,
                          outCol: String = "ahash",
                          batchSize: Int = 64): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outCol, LongType, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val hashes = audioEnergyHashBatch(batch.map(_.getAs[Array[Byte]](idx)))
        batch.lazyZip(hashes).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(enc)
  }

  /** Audio near-duplicate groups over an energy-hash column — the
    * [[imageNearDupGroups]] twin, same banded-Hamming + components core.
    */
  def audioNearDupGroups(df: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int = 2): DataFrame =
    Dedup.signatureNearDupGroups(df, idCol, hashCol, maxHamming,
      s"audioNearDupGroups(maxHamming=$maxHamming)")

  /** Fixture generator: a deterministic TWO-TONE WAV per row — 256 mono
    * PCM16 frames at 8000 Hz in 64 four-frame windows, pattern class
    * `id % classes`: window w is LOUD (amplitude 12000) when
    * `(w + class) % 8 < 3`, quiet (500) otherwise; odd ids additionally
    * make window 0 loud (≤1 energy-hash bit of noise). The
    * [[synthPng2ToneFromId]] contract for audio: the oracle predicts the
    * near-dup groups from id arithmetic while the engine earns them
    * through encode→decode→hash→band→components.
    */
  def synthWav2ToneFromId(df: DataFrame, idCol: String,
                          outCol: String = "wav",
                          classes: Int = 4): DataFrame = {
    require(classes >= 1 && classes <= 8,
      s"synthWav2ToneFromId: classes must be in [1,8], got $classes")
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val cls = (id % classes).toInt
        val nFrames = 256
        val dataLen = nFrames * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)
          .putInt(8000).putInt(16000)
          .putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < nFrames) {
          val w = i / 4
          val loud = (w + cls) % 8 < 3 || (id % 2 == 1 && w == 0)
          buf.putShort(if (loud) 12000.toShort else 500.toShort)
          i += 1
        }
        Row.fromSeq(r.toSeq :+ buf.array())
      }
    }(enc)
  }

  /** Fixture generator: a deterministic TWO-TONE patterned PNG per row —
    * fixed 16×8 canvas, pattern class `id % classes`: cell column x is
    * BRIGHT (gray 200) when `(x + class·5) % 8 < 3`, dark (gray 20)
    * otherwise, so the aHash of every image in a class is the identical
    * 24-bit-set signature and distinct classes differ in many bits (the
    * patterns are distinct 3-of-8 column shifts); odd ids additionally
    * brighten the top-left cell — one aHash bit of noise, keeping them
    * within Hamming 1 of their class. An oracle can therefore predict the
    * near-dup GROUPS from id arithmetic alone, while the engine earns
    * them through the full encode→decode→hash→band→components pipeline.
    */
  def synthPng2ToneFromId(df: DataFrame, idCol: String,
                          outCol: String = "png",
                          classes: Int = 5): DataFrame =
    synthImage2ToneFromId(df, idCol, outCol, classes, "png")

  /** [[synthPng2ToneFromId]] as JPEG bytes (r15, VERDICT r14 §next-5):
    * the single most common web image format, encoded LOSSY through
    * the JDK's own writer — downstream assertions must target decoded-
    * pixel INVARIANTS (dimensions, class recovery through the
    * perceptual hash), never byte equality. The two-tone pattern's
    * 200-vs-20 gray contrast dwarfs JPEG block artifacts, so the aHash
    * class structure survives the lossy round trip.
    */
  def synthJpeg2ToneFromId(df: DataFrame, idCol: String,
                           outCol: String = "jpg",
                           classes: Int = 5): DataFrame =
    synthImage2ToneFromId(df, idCol, outCol, classes, "jpg")

  /** Per-class ±1 sign for low-frequency slot (u, v) — an LCG-mixed bit,
    * shared between the spectrum fixture below and its spec so the
    * planted pattern is checkable bit-for-bit.
    */
  def spectrumSign(cls: Int, u: Int, v: Int): Int =
    if (((1103515245L * (cls * 64 + u * 8 + v) + 12345L) >>> 16 & 1L) == 0L) 1
    else -1

  /** Fixture generator for the FREQUENCY-domain hash: a 32×32 image
    * built directly IN the DCT basis —
    * luma = 128 + Σ over the 63 low-frequency slots of
    * sign(cls,u,v) · 4 · cos((2x+1)uπ/64) · cos((2y+1)vπ/64) —
    * so by orthogonality each low-block AC coefficient is ±4·256 with
    * the PLANTED class-keyed sign, far from the ~0 median, and the hash
    * bit pattern IS the sign pattern. (The two-tone cell fixture is
    * WRONG for [[imagePHashDctBatch]]: its classes are phase shifts of
    * one period — same DCT magnitudes — and its sparse spectrum leaves
    * most coefficients at zero, where median signs are noise. A
    * frequency hash needs a dense-spectrum fixture.) Odd ids get one
    * +15 impulse pixel — energy spread thinly across all 1024
    * frequencies (≤ 15 per coefficient vs the planted ±1024), the
    * within-class robustness the DCT hash exists for.
    */
  def synthPngSpectrumFromId(df: DataFrame, idCol: String,
                             outCol: String = "png",
                             classes: Int = 5): DataFrame = {
    require(classes >= 1 && classes <= 8,
      s"synthPngSpectrumFromId: classes must be in [1,8], got $classes")
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      val base = Array.tabulate(8, 32)((k, n) =>
        math.cos((2 * n + 1) * k * math.Pi / 64))
      it.map { r =>
        val id = r.getLong(idIdx)
        val cls = (id % classes).toInt
        val img = new java.awt.image.BufferedImage(
          32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            var s = 0.0
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                if (u != 0 || v != 0)
                  s += spectrumSign(cls, u, v) * 4.0 * base(u)(x) * base(v)(y)
                v += 1
              }
              u += 1
            }
            val g0 = math.max(0, math.min(255, 128 + s.round.toInt))
            val g = if (id % 2 == 1 && x == 0 && y == 0)
              math.min(255, g0 + 15) else g0
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  private def synthImage2ToneFromId(df: DataFrame, idCol: String,
                                    outCol: String, classes: Int,
                                    format: String): DataFrame = {
    require(classes >= 1 && classes <= 8,
      s"synth2ToneFromId: classes must be in [1,8], got $classes")
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val cls = (id % classes).toInt
        val img = new java.awt.image.BufferedImage(
          16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 16) {
            // aHash samples x*16/8 = even columns; keep odd columns equal
            // to their even neighbor so sampling sees the intended pattern
            val cell = x / 2
            val bright = (cell + cls * 5) % 8 < 3
            val noisy = id % 2 == 1 && cell == 0 && y == 0
            val g = if (bright || noisy) 200 else 20
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, format, baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** Fixture generator: a deterministic solid-color PNG per row — size
    * `(1 + id % 16) × (1 + id % 8)`, fill `rgb(id%256, id*7%256, id*13%256)`
    * — so an oracle can predict the decoded width/height/channel means in
    * plain SQL. Encoded executor-side (mapPartitions, no shuffle); real
    * pipelines read payloads via `spark.read.format("binaryFile")` instead.
    */
  def synthPngFromId(df: DataFrame, idCol: String,
                     outCol: String = "png"): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val w = (1 + id % 16).toInt
        val h = (1 + id % 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (((id % 256) << 16) | ((id * 7 % 256) << 8) | (id * 13 % 256)).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** REAL audio codec (no stub): decodes RIFF/WAV PCM via
    * `javax.sound.sampled` (AudioSystem ships in the JDK, like imageio).
    * Features = `[sample_rate, n_channels, n_frames, duration_sec, rms]`
    * with RMS normalized to [0, 1] by the 16-bit full scale; null for null,
    * non-PCM16, or undecodable payloads — the lenient-ingest rule (C7/C8)
    * applied to binary, matching [[decodeImageBatch]]. Plug into
    * [[decodeBatched]].
    */
  val decodeAudioBatch: Seq[Array[Byte]] => Seq[Array[Double]] = _.map { bytes =>
    if (bytes == null) null
    else {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            null
          else {
            val data = in.readAllBytes()
            val n = data.length / 2
            var sumSq = 0.0
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1).toInt
              val s = if (fmt.isBigEndian) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
                      else (hi << 8) | lo
              sumSq += s.toDouble * s
              i += 1
            }
            val channels = fmt.getChannels
            val frames = n / channels
            val rate = fmt.getSampleRate.toDouble
            Array(rate, channels.toDouble, frames.toDouble,
              frames / rate,
              if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    }
  }

  /** REAL audio downsample (pure JDK, r15): decode PCM16 WAV via
    * `javax.sound.sampled`, DECIMATE by an integral factor (keep every
    * `factor`-th frame — the naive-but-exact resampler; proper
    * anti-alias filtering is a DSP-library concern, this is the Spark
    * plumbing with a deterministic kernel), and re-encode through the
    * JDK's own WAV writer at `rate/factor`. Integral decimation of a
    * CONSTANT-amplitude fixture preserves RMS bit-exactly and maps
    * frame counts to `ceil(n/factor)` — the properties that let the
    * DuckDB oracle value-check a genuine decode→transform→re-encode→
    * decode round trip (the [[resizeImageBatched]] contract, audio
    * side). Null/non-PCM16/undecodable payloads stay null (C7/C8);
    * a sample rate not divisible by `factor` nulls too (the lenient
    * rule — a fractional output rate would lie about duration).
    * Same mapPartitions batch shape as [[decodeBatched]].
    */
  def downsampleWavBatched(df: DataFrame, contentCol: String, factor: Int,
                           outCol: String = "down"): DataFrame = {
    require(factor >= 1, s"downsampleWavBatched: factor >= 1, got $factor")
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out: Array[Byte] =
          if (bytes == null) null
          else {
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = in.getFormat
                val rate = math.round(fmt.getSampleRate)
                if (fmt.getSampleSizeInBits != 16 ||
                    fmt.getEncoding !=
                      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                    rate % factor != 0) null
                else {
                  val block = fmt.getFrameSize // channels × 2 bytes
                  val data = in.readAllBytes()
                  val nFrames = data.length / block
                  val kept = (nFrames + factor - 1) / factor
                  val outData = new Array[Byte](kept * block)
                  var f = 0
                  while (f < kept) {
                    System.arraycopy(data, f * factor * block,
                      outData, f * block, block)
                    f += 1
                  }
                  val outFmt = new javax.sound.sampled.AudioFormat(
                    fmt.getEncoding, rate.toFloat / factor, 16,
                    fmt.getChannels, block, rate.toFloat / factor,
                    fmt.isBigEndian)
                  val ais = new javax.sound.sampled.AudioInputStream(
                    new java.io.ByteArrayInputStream(outData), outFmt,
                    kept.toLong)
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.sound.sampled.AudioSystem.write(ais,
                    javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
                  bos.toByteArray
                }
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => null }
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  // ---------------------------------------------------------------------
  // G.711 µ-law — the COMPRESSED (companded, lossy) audio chain (r16,
  // VERDICT r15 §next-6): the JPEG treatment for audio. µ-law is the
  // ITU-T G.711 standard's 8-bit logarithmic companding of 16-bit PCM
  // (classic telephony; arithmetic follows the public-domain Sun
  // g711.c reference): segment exponent + 4-bit mantissa, so
  // decode(encode(x)) quantizes x deterministically — integer-exact and
  // replayable in oracle SQL, unlike JPEG whose loss is
  // implementation-defined. The chain halves the byte size (16→8 bits
  // per sample) and loses precision, exactly the lossy-codec shape the
  // pipeline must survive.
  // ---------------------------------------------------------------------

  private val MuClip = 32635
  private val MuBias = 0x84 // 132

  /** Linear PCM16 → µ-law byte (0..255), G.711 / g711.c arithmetic. */
  def mulawEncode(pcm: Int): Int = {
    val sign = if (pcm < 0) 0x80 else 0x00
    var m = if (pcm < 0) -pcm else pcm // Int math: -(-32768) is safe
    if (m > MuClip) m = MuClip
    m += MuBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (m & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (m >> (exp + 3)) & 0x0F
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** µ-law byte → linear PCM16, the exact inverse table. */
  def mulawDecode(ulaw: Int): Int = {
    val u = ~ulaw & 0xFF
    val exp = (u >> 4) & 0x07
    val mant = u & 0x0F
    val mag = (((mant << 3) + MuBias) << exp) - MuBias
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Transcode a PCM16 WAV into a µ-law WAV (RIFF format tag 7, 8-bit
    * samples, `fact` chunk per the non-PCM RIFF rule). Each 16-bit
    * sample companded through [[mulawEncode]] — the body is HALF the
    * PCM byte size, the loss is G.711's quantization. Null for null /
    * non-PCM16 / undecodable payloads (the lenient-ingest C7/C8 rule);
    * same mapPartitions batch shape as [[decodeBatched]].
    */
  def transcodeWavMulawBatched(df: DataFrame, contentCol: String,
                               outCol: String = "mulaw"): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out: Array[Byte] =
          if (bytes == null) null
          else {
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = in.getFormat
                if (fmt.getSampleSizeInBits != 16 ||
                    fmt.getEncoding !=
                      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
                else {
                  val data = in.readAllBytes()
                  val n = data.length / 2
                  val body = new Array[Byte](n)
                  var i = 0
                  while (i < n) {
                    val s =
                      if (fmt.isBigEndian)
                        (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
                      else
                        (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
                    body(i) = mulawEncode(s).toByte
                    i += 1
                  }
                  val rate = math.round(fmt.getSampleRate)
                  val ch = fmt.getChannels
                  val buf = java.nio.ByteBuffer.allocate(58 + n)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  buf.put("RIFF".getBytes("US-ASCII")).putInt(50 + n)
                    .put("WAVE".getBytes("US-ASCII"))
                    .put("fmt ".getBytes("US-ASCII")).putInt(18)
                    .putShort(7)                    // WAVE_FORMAT_MULAW
                    .putShort(ch.toShort)
                    .putInt(rate).putInt(rate * ch) // byte rate: 1 B/sample
                    .putShort(ch.toShort).putShort(8)
                    .putShort(0)                    // cbSize
                    .put("fact".getBytes("US-ASCII")).putInt(4)
                    .putInt(n / ch)                 // frame count
                    .put("data".getBytes("US-ASCII")).putInt(n)
                    .put(body)
                  buf.array()
                }
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => null }
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Decode a µ-law WAV back to a canonical PCM16 WAV (the 44-byte
    * header of [[synthWavFromId]], rate/channels preserved) — container
    * parsing via `javax.sound.sampled` (it reads format-7 RIFF as
    * `Encoding.ULAW`), sample expansion via [[mulawDecode]]. Null for
    * null / non-µ-law / undecodable payloads. The output feeds the
    * standard [[decodeAudioBatch]] analysis unchanged.
    */
  def decodeMulawWavBatched(df: DataFrame, contentCol: String,
                            outCol: String = "pcm"): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out: Array[Byte] =
          if (bytes == null) null
          else {
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = in.getFormat
                if (fmt.getSampleSizeInBits != 8 ||
                    fmt.getEncoding !=
                      javax.sound.sampled.AudioFormat.Encoding.ULAW) null
                else {
                  val body = in.readAllBytes()
                  val n = body.length
                  val rate = math.round(fmt.getSampleRate)
                  val ch = fmt.getChannels
                  val buf = java.nio.ByteBuffer.allocate(44 + 2 * n)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
                    .put("WAVE".getBytes("US-ASCII"))
                    .put("fmt ".getBytes("US-ASCII")).putInt(16)
                    .putShort(1).putShort(ch.toShort)
                    .putInt(rate).putInt(rate * ch * 2)
                    .putShort((ch * 2).toShort).putShort(16)
                    .put("data".getBytes("US-ASCII")).putInt(2 * n)
                  var i = 0
                  while (i < n) {
                    buf.putShort(mulawDecode(body(i) & 0xFF).toShort)
                    i += 1
                  }
                  buf.array()
                }
              } finally in.close()
            } catch { case scala.util.control.NonFatal(_) => null }
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Fixture generator: a deterministic mono PCM16 WAV per row — sample
    * rate 8000 Hz, `8 + id % 64` frames, every sample the constant
    * `(id * 37) % 20000 - 10000` — so an oracle can predict the decoded
    * frame count, duration (`n/8000.0`) and RMS (`|amp|/32768.0`, exact in
    * IEEE doubles: the mean of identical squares is a representable perfect
    * square) in plain SQL. The audio twin of [[synthPngFromId]]; encoded
    * executor-side, canonical 44-byte RIFF header.
    */
  def synthWavFromId(df: DataFrame, idCol: String,
                     outCol: String = "wav"): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val nFrames = (8 + id % 64).toInt
        val amp = ((id * 37) % 20000 - 10000).toShort
        val dataLen = nFrames * 2
        val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)          // PCM, mono
          .putInt(8000).putInt(16000)       // sample rate, byte rate
          .putShort(2).putShort(16)         // block align, bits/sample
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        var i = 0
        while (i < nFrames) { buf.putShort(amp); i += 1 }
        Row.fromSeq(r.toSeq :+ buf.array())
      }
    }(enc)
  }

  /** REAL motion/video codec (no stub) for the one multi-frame container
    * the JDK can decode end-to-end: animated GIF via `javax.imageio`'s GIF
    * reader. Features = `[n_frames, width, height, mean_r, mean_g]` with
    * the channel means taken over ALL frames' pixels; null for null or
    * undecodable payloads (lenient-ingest rule C7/C8, like the image and
    * audio codecs). Frame iteration uses `getNumImages(allowSearch=true)` +
    * per-frame `read(i)` — the real frame-sample path [[frameSample]] only
    * models over raw bytes. MP4/H.264 would need native libraries this
    * container doesn't ship; the GIF path proves the full decode plumbing
    * with a genuine multi-frame format.
    */
  val decodeVideoBatch: Seq[Array[Byte]] => Seq[Array[Double]] = _.map { bytes =>
    if (bytes == null) null
    else {
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(in)
            val n = reader.getNumImages(true)
            if (n <= 0) null
            else {
              var w = 0; var h = 0
              var sr = 0L; var sg = 0L; var nPix = 0L
              var f = 0
              while (f < n) {
                val img = reader.read(f)
                if (f == 0) { w = img.getWidth; h = img.getHeight }
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val p = img.getRGB(x, y)
                    sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff
                    nPix += 1
                    x += 1
                  }
                  y += 1
                }
                f += 1
              }
              // A decodable GIF reporting only zero-area frames has no
              // pixels to average — null, not NaN, per the lenient-ingest
              // contract (same as the n <= 0 branch).
              if (nPix == 0) null
              else Array(n.toDouble, w.toDouble, h.toDouble,
                sr.toDouble / nPix, sg.toDouble / nPix)
            }
          } finally { reader.dispose(); in.close() }
        }
      } catch { case scala.util.control.NonFatal(_) => null }
    }
  }

  /** Fixture generator: a deterministic animated GIF per row — `2 + id % 6`
    * solid-color frames of size `(1 + id % 8) × (1 + id % 4)`, frame `f`
    * filled with `rgb((id*13 + 17f) % 256, (id*29 + 31f) % 256, 0)` — so an
    * oracle can predict frame count, dimensions, and all-frame channel
    * means in plain SQL (solid fills survive GIF's palette exactly; the
    * mean over frames is a short modular sum both engines compute
    * identically in IEEE doubles). The motion twin of [[synthPngFromId]].
    */
  def synthGifFromId(df: DataFrame, idCol: String,
                     outCol: String = "gif"): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val nFrames = (2 + id % 6).toInt
        val w = (1 + id % 8).toInt
        val h = (1 + id % 4).toInt
        val baos = new java.io.ByteArrayOutputStream()
        val out = javax.imageio.ImageIO.createImageOutputStream(baos)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        writer.setOutput(out)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          // indexed frame with an explicit palette: the GIF writer emits the
          // IndexColorModel verbatim as the frame's local color table, so
          // the decoded color is bit-exact (an RGB frame would go through
          // the writer's quantizer and could land on a nearby palette entry)
          val cr = ((id * 13 + 17 * f) % 256).toInt
          val cg = ((id * 29 + 31 * f) % 256).toInt
          val icm = new java.awt.image.IndexColorModel(8, 2,
            Array(cr.toByte, 0.toByte), Array(cg.toByte, 0.toByte),
            Array(0.toByte, 0.toByte))
          // fresh BufferedImage rasters are zero-filled: every pixel is
          // palette index 0 = the frame color
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        out.close()
        Row.fromSeq(r.toSeq :+ baos.toByteArray)
      }
    }(enc)
  }

  /** Batched decode over partitions — the Scala analogue of `mapInPandas`:
    * rows are grouped into `batchSize` chunks and handed to a *batch* decoder
    * (`Seq[payload] => Seq[features]`), the signature a vectorized or
    * JNI-backed codec wants. The default decoder is the STUB above computed
    * JVM-side; production swaps `decodeBatch` only.
    *
    * Returns the input columns + `features array<double>`. Partitioning is
    * preserved (mapPartitions, no shuffle); memory is bounded by
    * `batchSize × payload` per concurrent batch.
    */
  def decodeBatched(df: DataFrame, contentCol: String, dim: Int,
                    batchSize: Int = 64,
                    decodeBatch: Seq[Array[Byte]] => Seq[Array[Double]] = null): DataFrame = {
    val decoder: Seq[Array[Byte]] => Seq[Array[Double]] =
      if (decodeBatch != null) decodeBatch
      else _.map { bytes =>
        // STUB: byte-identical to stubDecodeFeatures' md5(content ++ ":i")
        // expression (first 4 digest bytes big-endian = its 8-hex-digit
        // conv), and null-propagating — a null payload must yield null
        // features here too, not a vector hashed from the bare suffix.
        if (bytes == null) null
        else Array.tabulate(dim) { i =>
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(bytes)
          md.update(s":$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val d = md.digest()
          val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          (v % 1000000L).toDouble / 1000000.0
        }
      }
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = df.schema.add("features", FeatureSchema, nullable = true)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder(batch.map(_.getAs[Array[Byte]](idx)))
        batch.lazyZip(feats).map((r, f) =>
          Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq)))
      }
    }(enc)
  }
}
