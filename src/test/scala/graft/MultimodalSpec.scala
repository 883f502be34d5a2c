package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val assets = Seq(
    (1L, "hello world", "image/png"),
    (2L, "tiny", "audio/wav"),
    (3L, "hello world", "video/mp4") // same content as 1 -> same content_sha
  ).toDF("id", "text", "mime")
    .withColumn("payload", Multimodal.fakePayloadFromText(col("text")))

  test("withAssetMetadata: byte size, content address, media type") {
    val m = Multimodal.withAssetMetadata(assets, "payload", "mime")
      .select("id", "n_bytes", "content_sha", "media_type")
      .as[(Long, Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 11L && m(2L)._2 == 4L)
    assert(m(1L)._3 == m(3L)._3)            // content-addressed dedup key
    assert(m(1L)._4 == "image" && m(2L)._4 == "audio" && m(3L)._4 == "video")
  }

  test("frameSample: frame count and frame bytes") {
    // 11 bytes, frameLen 4, stride 3 -> starts at 0,3,6 ( (11-4)/3=2 -> 3 frames )
    val frames = assets.filter(col("id") === 1)
      .select(Multimodal.frameSample(col("payload"), 4, 3).as("f"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.length == 3)
    assert(new String(frames.head, "UTF-8") == "hell")
    assert(new String(frames(1), "UTF-8") == "lo w")
  }

  test("stubResize truncates to maxBytes") {
    val r = assets.filter(col("id") === 1)
      .select(Multimodal.stubResize(col("payload"), 5).as("r")).as[Array[Byte]].head()
    assert(new String(r, "UTF-8") == "hello")
  }

  test("binaryFile source: real asset files flow into the metadata pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-assets")
    java.nio.file.Files.write(dir.resolve("a.png"), "fake-png-bytes".getBytes)
    java.nio.file.Files.write(dir.resolve("b.wav"), "fake-wav".getBytes)
    val files = spark.read.format("binaryFile").load(dir.toString)
      .withColumn("mime", concat(lit("x/"), regexp_extract(col("path"), "\\.(\\w+)$", 1)))
    val m = Multimodal.withAssetMetadata(files, "content", "mime")
      .select("n_bytes", "media_type")
      .as[(Long, String)].collect().toSet
    assert(m == Set((14L, "x"), (8L, "x")))
  }

  test("decodeBatched and stubDecodeFeatures agree on null payloads (null features)") {
    val withNull = Seq((1L, Some("x")), (2L, None)).toDF("id", "text")
      .withColumn("payload", Multimodal.fakePayloadFromText(col("text")))
      .select("id", "payload")
    val viaExpr = withNull.select(col("id"),
        Multimodal.stubDecodeFeatures(col("payload"), 2).as("features"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    val viaBatch = Multimodal.decodeBatched(withNull, "payload", dim = 2)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(viaExpr == Map(1L -> false, 2L -> true))
    assert(viaBatch == viaExpr)
  }

  test("decodeBatched matches stubDecodeFeatures and respects batch bounds") {
    val viaExpr = assets.select(col("id"),
        Multimodal.stubDecodeFeatures(col("payload"), 4).as("features"))
      .as[(Long, Seq[Double])].collect().toMap
    val viaBatch = Multimodal.decodeBatched(assets.select("id", "payload"), "payload",
        dim = 4, batchSize = 2)
      .select("id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(viaBatch.keySet == Set(1L, 2L, 3L))
    assert(viaBatch == viaExpr) // JVM-side stub == expression-side stub
    assert(viaBatch(1L) == viaBatch(3L)) // content-deterministic
  }

  test("decodeImageBatch really decodes PNGs: exact size and channel means") {
    val ids = Seq(0L, 7L, 300L).toDF("doc_id")
    val out = Multimodal.decodeBatched(
        Multimodal.synthPngFromId(ids, "doc_id"),
        "png", dim = 5, decodeBatch = Multimodal.decodeImageBatch)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    for (id <- Seq(0L, 7L, 300L)) {
      val f = out(id)
      assert(f(0) == 1 + id % 16, s"width for $id")
      assert(f(1) == 1 + id % 8, s"height for $id")
      assert(f(2) == (id % 256).toDouble, s"mean_r for $id") // solid fill => exact mean
      assert(f(3) == (id * 7 % 256).toDouble, s"mean_g for $id")
      assert(f(4) == (id * 13 % 256).toDouble, s"mean_b for $id")
    }
  }

  test("JPEG codec path: lossy round trip preserves dimensions and " +
      "aHash class structure (r15)") {
    // r15 (VERDICT r14 §next-5): the first fixture to exercise the
    // javax.imageio JPEG reader. JPEG is LOSSY — assertions target
    // decoded-pixel invariants (dims, perceptual-hash class recovery),
    // never byte equality. 20 ids cover all 5 pattern classes with
    // clean and noisy (odd-id) members.
    val ids = (0L until 20L).toDF("doc_id")
    val jp = Multimodal.synthJpeg2ToneFromId(ids, "doc_id", classes = 5)
    // it really is JPEG on the wire (SOI marker), not PNG
    val magic = jp.select("jpg").as[Array[Byte]].head()
    assert((magic(0) & 0xff) == 0xd8 || (magic(1) & 0xff) == 0xd8,
      s"not a JPEG: ${magic.take(4).map(b => f"${b & 0xff}%02x").mkString}")
    val feats = Multimodal.decodeBatched(jp, "jpg", dim = 5,
        decodeBatch = Multimodal.decodeImageBatch)
      .select("doc_id", "features").as[(Long, Seq[Double])]
      .collect().toMap
    ids.as[Long].collect().foreach { id =>
      assert(feats(id)(0) == 16.0 && feats(id)(1) == 8.0,
        s"dims for $id: ${feats(id)}")
    }
    val hashes = Multimodal.withImageAHash(jp, "jpg", "phash")
      .select("doc_id", "phash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // within-class distances small, cross-class LARGE — the class
    // structure survives the lossy encode with a wide margin
    val within = for {
      a <- 0L until 20L; b <- 0L until 20L
      if a < b && a % 5 == b % 5
    } yield ham(hashes(a), hashes(b))
    val cross = for {
      a <- 0L until 20L; b <- 0L until 20L
      if a < b && a % 5 != b % 5
    } yield ham(hashes(a), hashes(b))
    assert(within.max <= 4,
      s"within-class aHash drifted past 4 bits under JPEG: ${within.max}")
    assert(cross.min > 8,
      s"cross-class aHash collapsed under JPEG: ${cross.min}")
  }

  test("downsampleWavBatched: real decimation round trip — rate halves, " +
      "frames ceil(n/2), RMS preserved, junk/indivisible null (r15)") {
    val ids = Seq(0L, 7L, 63L, 300L).toDF("doc_id")
    val down = Multimodal.downsampleWavBatched(
      Multimodal.synthWavFromId(ids, "doc_id"), "wav", factor = 2)
    val out = Multimodal.decodeBatched(down, "down", dim = 5,
        decodeBatch = Multimodal.decodeAudioBatch)
      .select("doc_id", "features").as[(Long, Seq[Double])]
      .collect().toMap
    for (id <- Seq(0L, 7L, 63L, 300L)) {
      val f = out(id)
      val n0 = 8 + id % 64
      assert(f(0) == 4000.0, s"rate for $id: ${f(0)}")
      assert(f(2) == ((n0 + 1) / 2).toDouble, s"frames for $id: ${f(2)}")
      assert(f(4) == math.abs((id * 37) % 20000 - 10000) / 32768.0,
        s"rms for $id: ${f(4)}")
    }
    // a factor that does not divide the rate nulls (8000 % 3 != 0),
    // as do null and undecodable payloads — the C7/C8 lenient rule
    val bad = Multimodal.downsampleWavBatched(
        Multimodal.synthWavFromId(Seq(1L).toDF("doc_id"), "doc_id"),
        "wav", factor = 3)
      .select("down").collect()(0)
    assert(bad.isNullAt(0), "indivisible rate must null, not lie")
    val junk = Multimodal.downsampleWavBatched(
        Seq((1L, Array[Byte](1, 2, 3)),
          (2L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "wav"),
        "wav", factor = 2)
      .select("down").collect()
    assert(junk.forall(_.isNullAt(0)))
  }

  test("resizeImageBatched: real 2x replication — dims double, means exact, junk null") {
    val ids = Seq(0L, 7L, 300L).toDF("doc_id")
    val out = Multimodal.decodeBatched(
        Multimodal.resizeImageBatched(
          Multimodal.synthPngFromId(ids, "doc_id"), "png", scale = 2),
        "resized", dim = 5, decodeBatch = Multimodal.decodeImageBatch)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    for (id <- Seq(0L, 7L, 300L)) {
      val f = out(id)
      assert(f(0) == 2 * (1 + id % 16), s"width for $id")
      assert(f(1) == 2 * (1 + id % 8), s"height for $id")
      assert(f(2) == (id % 256).toDouble, s"mean_r preserved for $id")
      assert(f(4) == (id * 13 % 256).toDouble, s"mean_b preserved for $id")
    }
    // undecodable and null payloads pass through as null resized bytes
    val junk = Seq((1L, Array[Byte](9, 9)), (2L, null)).toDF("id", "png")
    val rz = Multimodal.resizeImageBatched(junk, "png", scale = 2)
      .select("resized").collect()
    assert(rz.forall(_.isNullAt(0)))
  }

  test("decodeImageBatch yields null features for undecodable or null bytes") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("id", "payload")
    val out = Multimodal.decodeBatched(junk, "payload", dim = 5,
        decodeBatch = Multimodal.decodeImageBatch)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("decodeAudioBatch really decodes WAVs: rate, frames, duration, exact RMS") {
    val ids = Seq(0L, 7L, 300L).toDF("doc_id")
    val out = Multimodal.decodeBatched(
        Multimodal.synthWavFromId(ids, "doc_id"),
        "wav", dim = 5, decodeBatch = Multimodal.decodeAudioBatch)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    for (id <- Seq(0L, 7L, 300L)) {
      val f = out(id)
      val nFrames = 8 + id % 64
      val amp = (id * 37) % 20000 - 10000
      assert(f(0) == 8000.0, s"sample rate for $id")
      assert(f(1) == 1.0, s"channels for $id")
      assert(f(2) == nFrames.toDouble, s"frames for $id")
      assert(f(3) == nFrames.toDouble / 8000.0, s"duration for $id")
      assert(f(4) == math.abs(amp).toDouble / 32768.0, s"rms for $id") // constant fill => exact
    }
  }

  test("decodeVideoBatch really decodes animated GIFs: frames, size, exact means") {
    val ids = Seq(0L, 7L, 300L).toDF("doc_id")
    val out = Multimodal.decodeBatched(
        Multimodal.synthGifFromId(ids, "doc_id"),
        "gif", dim = 5, decodeBatch = Multimodal.decodeVideoBatch)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    for (id <- Seq(0L, 7L, 300L)) {
      val f = out(id)
      val nFrames = (2 + id % 6).toInt
      assert(f(0) == nFrames.toDouble, s"frames for $id")
      assert(f(1) == 1 + id % 8, s"width for $id")
      assert(f(2) == 1 + id % 4, s"height for $id")
      val meanR = (0 until nFrames).map(fr => (id * 13 + 17 * fr) % 256).sum.toDouble / nFrames
      val meanG = (0 until nFrames).map(fr => (id * 29 + 31 * fr) % 256).sum.toDouble / nFrames
      assert(f(3) == meanR, s"mean_r for $id: got ${f(3)}, want $meanR")
      assert(f(4) == meanG, s"mean_g for $id: got ${f(4)}, want $meanG")
    }
  }

  test("decodeVideoBatch yields null features for undecodable or null bytes") {
    val junk = Seq((1L, Array[Byte](71, 73, 70)), (2L, null)) // truncated "GIF"
      .toDF("id", "payload")
    val out = Multimodal.decodeBatched(junk, "payload", dim = 5,
        decodeBatch = Multimodal.decodeVideoBatch)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("imageAHash: hand-computed bits, noise distance, class separation") {
    val ids = Seq(0L, 1L, 2L, 6L).toDF("doc_id")
    val hashed = Multimodal.withImageAHash(
        Multimodal.synthPng2ToneFromId(ids, "doc_id", classes = 5),
        "png", "phash")
      .select("doc_id", "phash").as[(Long, Long)].collect().toMap
    // hand-computed aHash of class 0 (id 0, even -> no noise): bright
    // cells are columns where (x + 0) % 8 < 3, identical in every row
    val expected0 = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 8 if x % 8 < 3) h |= 1L << (8 * y + x)
      h
    }
    assert(hashed(0L) == expected0,
      s"${hashed(0L).toBinaryString} vs ${expected0.toBinaryString}")
    // id 1 is class 1 with the noise bit (odd, and class 1's cell 0 is
    // dark, so the noise flips a real bit): Hamming 1 from clean id 6
    assert(java.lang.Long.bitCount(hashed(6L) ^ hashed(1L)) == 1)
    // different classes differ in many bits (distinct 3-of-8 shifts)
    assert(java.lang.Long.bitCount(hashed(0L) ^ hashed(2L)) > 8)
    // undecodable payloads hash to null
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("id", "payload")
    val nulls = Multimodal.withImageAHash(junk, "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(nulls == Map(1L -> true, 2L -> true))
  }

  test("imageDHash: gradient bits from the sampled pattern, noise bound, classes, nulls") {
    val ids = (0L until 40L).toDF("doc_id")
    val hashed = Multimodal.withImageDHash(
        Multimodal.synthPng2ToneFromId(ids, "doc_id", classes = 5),
        "png", "dhash")
      .select("doc_id", "dhash").as[(Long, Long)].collect().toMap
    // hand-derived dHash of class 0, even id: the 9-point row sample of
    // the 16-wide image hits cells (x*16/9)/2 = 0,0,1,2,3,4,5,6,7; cell c
    // is bright iff c % 8 < 3, so the luma run is
    // 200,200,200,200,20,... — strictly-greater transitions only where a
    // dark->bright step occurs, which class 0 never has: hash 0
    assert(hashed(0L) == 0L, hashed(0L).toBinaryString)
    // class separation and within-class noise bound over all 40
    val within = for (a <- 0L until 40L; b <- 0L until a if a % 5 == b % 5)
      yield java.lang.Long.bitCount(hashed(a) ^ hashed(b))
    val cross = for (a <- 0L until 40L; b <- 0L until a if a % 5 != b % 5)
      yield java.lang.Long.bitCount(hashed(a) ^ hashed(b))
    assert(within.max <= 2, s"within-class dHash drift ${within.max}")
    assert(cross.min >= 4, s"cross-class dHash collapse ${cross.min}")
    val junk = Seq((1L, Array[Byte](9, 9)), (2L, null)).toDF("id", "payload")
    val nulls = Multimodal.withImageDHash(junk, "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(nulls == Map(1L -> true, 2L -> true))
  }

  test("imagePHashDct: planted spectrum signs recovered, impulse-noise immune, classes") {
    val ids = (0L until 40L).toDF("doc_id")
    val hashed = Multimodal.withImagePHashDct(
        Multimodal.synthPngSpectrumFromId(ids, "doc_id", classes = 5),
        "png", "dct_hash")
      .select("doc_id", "dct_hash").as[(Long, Long)].collect().toMap
    // the fixture is built IN the DCT basis: bit (8v+u) must equal the
    // planted sign for all 63 AC slots, up to the median boundary (an
    // exactly-median coefficient fails the strict >; <=2 such slots)
    var mismatches = 0
    for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0) {
      val bit = (hashed(0L) >> (8 * v + u)) & 1L
      val want = if (Multimodal.spectrumSign(0, u, v) > 0) 1L else 0L
      if (bit != want) mismatches += 1
    }
    assert(mismatches <= 2, s"planted-sign mismatches $mismatches")
    // the +15 impulse pixel on odd ids spreads <=15 per coefficient vs
    // the planted +-1024: hashes within a class are IDENTICAL (measured
    // 0; allow 2), classes far apart
    val within = for (a <- 0L until 40L; b <- 0L until a if a % 5 == b % 5)
      yield java.lang.Long.bitCount(hashed(a) ^ hashed(b))
    val cross = for (a <- 0L until 40L; b <- 0L until a if a % 5 != b % 5)
      yield java.lang.Long.bitCount(hashed(a) ^ hashed(b))
    assert(within.max <= 2, s"within-class dct drift ${within.max}")
    assert(cross.min >= 16, s"cross-class dct collapse ${cross.min}")
    val junk = Seq((1L, Array[Byte](0)), (2L, null)).toDF("id", "payload")
    val nulls = Multimodal.withImagePHashDct(junk, "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(nulls == Map(1L -> true, 2L -> true))
  }

  test("imageNearDupGroups recovers the planted pattern classes") {
    val ids = (0L until 40L).toDF("doc_id")
    val groups = Multimodal.imageNearDupGroups(
        Multimodal.withImageAHash(
          Multimodal.synthPng2ToneFromId(ids, "doc_id", classes = 5),
          "png", "phash"),
        "doc_id", "phash", maxHamming = 2)
      .as[(Long, Long)].collect().toMap
    assert(groups.size == 40)
    (0L until 40L).foreach(id => assert(groups(id) == id % 5,
      s"id $id -> ${groups(id)}"))
  }

  test("audioEnergyHash: hand-computed bits, noise distance, groups") {
    val ids = Seq(0L, 2L, 3L, 7L).toDF("doc_id")
    val hashed = Multimodal.withAudioEnergyHash(
        Multimodal.synthWav2ToneFromId(ids, "doc_id", classes = 4),
        "wav", "ahash")
      .select("doc_id", "ahash").as[(Long, Long)].collect().toMap
    // class 0 (id 0, even): loud windows are w % 8 < 3
    val expected0 = {
      var h = 0L
      for (w <- 0 until 64 if w % 8 < 3) h |= 1L << w
      h
    }
    assert(hashed(0L) == expected0,
      s"${hashed(0L).toBinaryString} vs ${expected0.toBinaryString}")
    // id 3 is class 3 with the noise window (odd, and class 3's window 0
    // is quiet): Hamming 1 from clean class-3 id 7... both odd; compare
    // against the constructed clean hash instead
    val clean3 = {
      var h = 0L
      for (w <- 0 until 64 if (w + 3) % 8 < 3) h |= 1L << w
      h
    }
    assert(java.lang.Long.bitCount(hashed(3L) ^ clean3) == 1)
    assert(hashed(3L) == hashed(7L)) // same class + same noise
    // classes far apart
    assert(java.lang.Long.bitCount(hashed(0L) ^ hashed(2L)) > 8)
    // null/short payloads hash to null
    val junk = Seq((1L, Array[Byte](82, 73, 70, 70)), (2L, null))
      .toDF("id", "payload")
    val nulls = Multimodal.withAudioEnergyHash(junk, "payload")
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(nulls == Map(1L -> true, 2L -> true))
    // end-to-end groups recover the planted classes
    val many = (0L until 24L).toDF("doc_id")
    val groups = Multimodal.audioNearDupGroups(
        Multimodal.withAudioEnergyHash(
          Multimodal.synthWav2ToneFromId(many, "doc_id", classes = 4),
          "wav", "ahash"),
        "doc_id", "ahash", maxHamming = 2)
      .as[(Long, Long)].collect().toMap
    (0L until 24L).foreach(id => assert(groups(id) == id % 4))
  }

  test("decodeAudioBatch yields null features for undecodable or null bytes") {
    val junk = Seq((1L, Array[Byte](82, 73, 70, 70)), (2L, null)) // truncated "RIFF"
      .toDF("id", "payload")
    val out = Multimodal.decodeBatched(junk, "payload", dim = 5,
        decodeBatch = Multimodal.decodeAudioBatch)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }
  test("mulaw codec: exhaustive idempotence, sign, quantization bound, " +
      "and agreement with the JDK ULAW converter") {
    // G.711 properties over EVERY 16-bit sample: re-encoding the decoded
    // value is the identity on codes (the codec is a projection), the
    // sign survives, and the quantization error stays within the
    // segment's step (8<<exp <= (|x|+132)/16).
    var x = -32768
    while (x <= 32767) {
      val u = Multimodal.mulawEncode(x)
      val d = Multimodal.mulawDecode(u)
      // projection modulo G.711's two zero codes: 0x7F is "-0", which
      // decodes to linear 0 and re-encodes as "+0" (0xFF)
      val u2 = Multimodal.mulawEncode(d)
      assert(u2 == u || (u == 0x7F && u2 == 0xFF), s"not a projection at $x")
      assert(x == 0 || (x < 0) == (d < 0) || d == 0, s"sign flip at $x -> $d")
      val clipped = math.max(-32635, math.min(32635, x))
      assert(math.abs(d - clipped) <= (math.abs(clipped) + 132) / 16 + 1,
        s"quantization error too large at $x: decoded $d")
      x += 1
    }
    // all 256 codes decode-encode back to themselves (modulo the two
    // zero codes 0xFF/0x7F mapping +0/-0 to the same linear 0)
    var u = 0
    while (u < 256) {
      val d = Multimodal.mulawDecode(u)
      assert(Multimodal.mulawDecode(Multimodal.mulawEncode(d)) == d)
      u += 1
    }
    // independent implementation check: the JDK's own ULAW converter
    // (javax.sound.sampled) companding must agree byte-for-byte
    val n = 4096
    val pcm = new Array[Byte](2 * n)
    val bb = java.nio.ByteBuffer.wrap(pcm)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val samples = (0 until n).map(i => ((i * 16381) % 65536 - 32768).toShort)
    samples.foreach(bb.putShort)
    val srcFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val ulawFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(ulawFmt,
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), srcFmt, n.toLong))
    val jdk = conv.readAllBytes()
    assert(jdk.length == n)
    samples.zipWithIndex.foreach { case (s0, i) =>
      // compare only inside G.711's linear domain (|x| <= 32635, the
      // clip threshold): in the clip zone the JDK's short-domain
      // arithmetic overflows (bias addition past 32767, negation of
      // -32768) and emits QUIET codes for the loudest samples — our
      // Int-domain clip follows the g711.c reference instead
      if (math.abs(s0.toInt) <= 32635)
        assert((jdk(i) & 0xFF) == Multimodal.mulawEncode(s0.toInt),
          s"JDK disagrees at sample $i value $s0: " +
            s"jdk=${jdk(i) & 0xFF} ours=${Multimodal.mulawEncode(s0.toInt)}")
    }
    // clip zone: loudest codes, the G.711 answer (0x80 = loudest
    // positive, 0x00 = loudest negative)
    assert(Multimodal.mulawEncode(32767) == 0x80)
    assert(Multimodal.mulawEncode(32756) == 0x80)
    assert(Multimodal.mulawEncode(-32768) == 0x00)
    assert(Multimodal.mulawEncode(-32700) == 0x00)
  }

  test("mulaw WAV chain: transcode halves the body, round trip restores " +
      "the quantized signal, lenient nulls") {
    val base = Multimodal.synthWavFromId(
      (1L to 40L).toDF("doc_id"), "doc_id")
    val mu = Multimodal.transcodeWavMulawBatched(base, "wav")
    val back = Multimodal.decodeMulawWavBatched(mu, "mulaw")
    val feats = Multimodal.decodeBatched(back, "pcm", dim = 5,
      decodeBatch = Multimodal.decodeAudioBatch)
      .select(col("doc_id"), col("features"))
      .as[(Long, Seq[Double])].collect().toMap
    var quantized = 0
    (1L to 40L).foreach { id =>
      val f = feats(id)
      val nFrames = 8 + id % 64
      val amp = ((id * 37) % 20000 - 10000).toInt
      val ampQ = Multimodal.mulawDecode(Multimodal.mulawEncode(amp))
      assert(f(0) == 8000.0 && f(1) == 1.0 && f(2) == nFrames.toDouble, f)
      assert(f(4) == math.abs(ampQ) / 32768.0,
        s"id=$id amp=$amp ampQ=$ampQ rms=${f(4)}")
      if (ampQ != amp) quantized += 1
    }
    // the chain IS lossy: most amplitudes move (a few land exactly on a
    // segment level — e.g. 9852 = (3·8+132)·64 − 132 — and survive)
    assert(quantized > 30, s"only $quantized/40 amplitudes quantized")
    // the compressed body is half the PCM body (8 vs 16 bits/sample)
    val sizes = mu.select(col("doc_id"), octet_length(col("wav")),
        octet_length(col("mulaw"))).as[(Long, Int, Int)].collect()
    sizes.foreach { case (id, pcmLen, muLen) =>
      val n = (8 + id % 64).toInt
      assert(pcmLen == 44 + 2 * n && muLen == 58 + n, s"$id: $pcmLen $muLen")
    }
    // lenient ingest: garbage and null payloads flow through as null
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("id", "b")
    assert(Multimodal.transcodeWavMulawBatched(junk, "b")
      .filter(col("mulaw").isNotNull).count() == 0)
    assert(Multimodal.decodeMulawWavBatched(junk, "b")
      .filter(col("pcm").isNotNull).count() == 0)
    // a PCM16 wav is NOT a mulaw wav: the decoder refuses it, the
    // transcoder refuses its own output
    assert(Multimodal.decodeMulawWavBatched(base, "wav")
      .filter(col("pcm").isNotNull).count() == 0)
    assert(Multimodal.transcodeWavMulawBatched(
        mu.select(col("doc_id"), col("mulaw")), "mulaw", outCol = "mu2")
      .filter(col("mu2").isNotNull).count() == 0)
  }
}

