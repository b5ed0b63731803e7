package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaRow

/** Real-codec multimodal tests: PNG images via the JDK's ImageIO and WAV
  * audio via javax.sound.sampled, synthesized in-test — no fixtures, no
  * external libraries. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  /** A deterministic gradient PNG. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(1, w - 1)) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    MultimodalOps.ImageCodec.encodePng(img)
  }

  /** A 16-bit mono PCM WAV of a sine at `amp` peak. */
  private def wav(rate: Int, seconds: Double, amp: Double): Array[Byte] = {
    import javax.sound.sampled._
    val n = (rate * seconds).toInt
    val samples = Array.tabulate(n) { i =>
      (math.sin(2 * math.Pi * 440.0 * i / rate) * amp * 32767).toInt.toShort
    }
    val bytes = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def media(id: Long, modality: String, payload: Array[Byte]) =
    MediaRow(id, modality, payload, 0, 0, 0)

  test("decodeImages: real PNG decode with correct dimensions and luma") {
    val rows = Seq(
      media(1L, "image", png(40, 20)),
      media(2L, "image", png(8, 8)),
      media(3L, "image", "not an image".getBytes))
    val out = MultimodalOps.decodeImages(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).ok && out(1L).width == 40 && out(1L).height == 20)
    assert(out(2L).ok && out(2L).width == 8 && out(2L).height == 8)
    // gradient 0..255 over x: mean luma = mean of gray levels = 127.5
    assert(math.abs(out(1L).mean_luma - 127.5) < 1.0, s"${out(1L)}")
    assert(!out(3L).ok, "non-image bytes must flag, not throw")
  }

  test("resizeImages: bounded edge, aspect preserved, re-decodable, deterministic") {
    val rows = Seq(
      media(1L, "image", png(64, 32)),
      media(2L, "image", png(10, 10)),   // already small: untouched
      media(3L, "image", "junk".getBytes)) // non-decodable: passes through
    def run(parts: Int) = MultimodalOps.resizeImages(
      spark.createDataset(rows).repartition(parts), maxEdge = 16)
      .collect().map(r => r.media_id -> r).toMap
    val out = run(1)
    assert(out(1L).width == 16 && out(1L).height == 8, "aspect must survive")
    assert(out(2L).width == 10 && out(2L).height == 10)
    assert(out(3L).payload.sameElements("junk".getBytes),
      "non-decodable rows must pass through unchanged")
    // the resized payload is itself a valid image with the stamped dims
    val redecoded = MultimodalOps.ImageCodec.decode(out(1L).payload)
    assert(redecoded.exists(i => i.getWidth == 16 && i.getHeight == 8))
    // determinism under partitioning
    val out3 = run(3)
    assert(out.keySet.forall(k =>
      out3(k).payload.sameElements(out(k).payload)))
  }

  test("imageDHash + imageNearDupPairs: resized/re-encoded copies pair, others don't") {
    // a textured deterministic image (gradient + checker) so the dHash has
    // structure in every band; its downscaled re-encode is a true near-dup
    def textured(w: Int, h: Int, invert: Boolean): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 255 / math.max(1, w - 1)) & 0xff
        val c = if (((x / 8) + (y / 8)) % 2 == 0) g else 255 - g
        val v = if (invert) 255 - c else c
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      MultimodalOps.ImageCodec.encodePng(img)
    }
    val original = textured(128, 96, invert = false)
    val resizedCopy = {
      val img = MultimodalOps.ImageCodec.decode(original).get
      MultimodalOps.ImageCodec.encodePng(
        MultimodalOps.ImageCodec.resize(img, 64))
    }
    val rows = Seq(
      media(1L, "image", original),
      media(2L, "image", resizedCopy),
      media(3L, "image", textured(128, 96, invert = true)), // structural opposite
      media(4L, "image", "broken payload".getBytes))
    val hashes = MultimodalOps.imageDHash(spark.createDataset(rows))
    val hm = hashes.collect().map(f => f.media_id -> f).toMap
    assert(hm(1L).ok && hm(2L).ok && hm(3L).ok && !hm(4L).ok)
    // determinism: hashing the same payloads again is identical
    val again = MultimodalOps.imageDHash(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f.dhash).toMap
    assert(rows.map(_.media_id).forall(id => again(id) == hm(id).dhash))
    val pairs = MultimodalOps.imageNearDupPairs(hashes.toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 6L),
      s"resized copy must pair with its original: $pairs")
    assert(pairs.forall(p => Set(p._1, p._2) == Set(1L, 2L)),
      s"inverted/broken images must not pair: $pairs")
  }

  test("audioEnvHash + audioNearDupPairs: volume-scaled copies pair, different shapes don't") {
    // amplitude-modulated sine: envelope rises then falls — structured
    // rms differences in every window; a volume-scaled copy has the SAME
    // sign pattern (scale cancels in the comparisons)
    def modWav(rate: Int, seconds: Double, amp: Double, invertEnv: Boolean): Array[Byte] = {
      import javax.sound.sampled._
      val n = (rate * seconds).toInt
      val samples = Array.tabulate(n) { i =>
        val t = i.toDouble / n
        val env0 = if (t < 0.5) t * 2 else (1 - t) * 2
        val env = if (invertEnv) 1.0 - env0 else env0
        (math.sin(2 * math.Pi * 440.0 * i / rate) * env * amp * 32767)
          .toInt.toShort
      }
      val bytes = new Array[Byte](n * 2)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      media(1L, "audio", modWav(8000, 1.0, 0.9, invertEnv = false)),
      media(2L, "audio", modWav(8000, 1.0, 0.45, invertEnv = false)), // half volume
      media(3L, "audio", modWav(8000, 1.0, 0.9, invertEnv = true)),   // other shape
      media(4L, "audio", "not audio".getBytes))
    val hashes = MultimodalOps.audioEnvHash(spark.createDataset(rows))
    val hm = hashes.collect().map(f => f.media_id -> f).toMap
    assert(hm(1L).ok && hm(2L).ok && hm(3L).ok && !hm(4L).ok)
    assert(hm(1L).ehash == hm(2L).ehash,
      "amplitude scaling must not change the envelope hash")
    val pairs = MultimodalOps.audioNearDupPairs(hashes.toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L), s"$pairs")
    assert(pairs.forall(p => Set(p._1, p._2) == Set(1L, 2L)),
      s"the inverted-envelope clip must not pair: $pairs")
  }

  test("media near-dup pairs compose with dedupClusters (cluster the modality graph)") {
    // two image variants + their original = one cluster via transitivity
    def shifted(w: Int, h: Int, shift: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = ((x * 255 / math.max(1, w - 1)) + shift) & 0xff
        val c = if (((x / 8) + (y / 8)) % 2 == 0) g else 255 - g
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      MultimodalOps.ImageCodec.encodePng(img)
    }
    val original = shifted(128, 96, 0)
    val rows = Seq(
      media(1L, "image", original),
      media(2L, "image", MultimodalOps.ImageCodec.encodePng(
        MultimodalOps.ImageCodec.resize(
          MultimodalOps.ImageCodec.decode(original).get, 64))),
      media(3L, "image", MultimodalOps.ImageCodec.encodePng(
        MultimodalOps.ImageCodec.resize(
          MultimodalOps.ImageCodec.decode(original).get, 96))), // second variant
      media(4L, "image", shifted(96, 128, 128))) // different geometry+phase
    val hashes = MultimodalOps.imageDHash(spark.createDataset(rows))
    val pairs = MultimodalOps.imageNearDupPairs(hashes.toDF())
    val clusters = graft.operators.DedupOps.dedupClusters(
      pairs, "media_a", "media_b")
      .as[(Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // 1, 2, 3 all reachable -> one cluster rooted at the smallest id
    assert(clusters.get(1L).contains(1L) && clusters.get(2L).contains(1L) &&
      clusters.get(3L).contains(1L), s"$clusters")
    assert(!clusters.contains(4L), "the unrelated image joins no cluster")
  }

  test("oversizedFingerprintBuckets flags the degenerate flat-image class") {
    // 30 flat single-color images: all dHash to the same value, so every
    // band bucket holds all 30 — at a cap of 10 all 8 buckets flag
    def flat(v: Int): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      MultimodalOps.ImageCodec.encodePng(img)
    }
    val rows = (0 until 30).map(i => media(i.toLong, "image", flat(100 + i)))
    val hashes = MultimodalOps.imageDHash(spark.createDataset(rows)).toDF()
    val flagged = MultimodalOps.oversizedFingerprintBuckets(
      hashes, "dhash", maxBucket = 10)
      .as[(Int, Long, Long)].collect()
    assert(flagged.length == 8 && flagged.forall(_._3 == 30L), s"${flagged.toSeq}")
    // and at the default cap nothing flags on a healthy corpus
    assert(MultimodalOps.oversizedFingerprintBuckets(hashes, "dhash")
      .count() == 0)
  }

  test("audioFeatures: real WAV decode with rate, frames, and sine RMS") {
    val rate = 8000
    // an 8-bit unsigned WAV: decodable container, unsupported sample width
    val eightBit = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(8000f, 8, 1, false, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](800)(64)), fmt, 800L)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      media(1L, "audio", wav(rate, 0.5, amp = 0.8)),
      media(2L, "audio", wav(rate, 0.25, amp = 0.2)),
      media(3L, "audio", "not audio".getBytes),
      media(4L, "audio", eightBit))
    val out = MultimodalOps.audioFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).ok && out(1L).sample_rate == rate &&
      out(1L).n_frames == rate / 2)
    // RMS of a sine at peak a is a/sqrt(2)
    assert(math.abs(out(1L).rms - 0.8 / math.sqrt(2)) < 0.01, s"${out(1L)}")
    assert(math.abs(out(2L).rms - 0.2 / math.sqrt(2)) < 0.01, s"${out(2L)}")
    assert(!out(3L).ok, "non-audio bytes must flag, not throw")
    assert(!out(4L).ok, "non-16-bit PCM must flag, not mis-parse")
  }

  /** A small doc table shaped like the driver's documents table: ids cover
    * the re-encode-twin (8), resize-variant (4, 12), broken (0, 97), and
    * no-variant residue classes of the synthetic corpora. */
  private def docTable = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 12L, 16L, 97L)
      .map(i => (i, s"doc $i body " + (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("syntheticImageCorpus: planted twins pair at hamming 0, broken rows flagged and excluded") {
    val media = MultimodalOps.syntheticImageCorpus(
      docTable, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
    val rows = media.collect()
    val off = MultimodalOps.VariantIdOffset
    // residue classes: 0 and 97 broken; 8, 16 re-encode twins; 4, 12 resized
    assert(rows.count(_.media_id >= off) == 6, s"${rows.map(_.media_id).toSeq}")
    val hashes = MultimodalOps.imageDHash(media)
    val hm = hashes.collect().map(h => h.media_id -> h).toMap
    assert(!hm(off + 0L).ok && !hm(off + 97L).ok, "truncated PNGs must flag")
    assert(rows.filter(_.media_id < off).forall(r => hm(r.media_id).ok))
    // decode -> re-encode twin: pixel-identical, dHash equal
    assert(hm(off + 8L).dhash == hm(8L).dhash)
    assert(hm(off + 16L).dhash == hm(16L).dhash)
    val pairs = MultimodalOps.imageNearDupPairs(hashes.toDF(), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((8L, off + 8L)).contains(0L), s"$pairs")
    assert(pairs.get((16L, off + 16L)).contains(0L))
    // broken variants must never appear in the pair output
    assert(pairs.keys.forall { case (a, b) =>
      a != off + 0L && b != off + 0L && a != off + 97L && b != off + 97L })
  }

  test("syntheticAudioCorpus: half-volume twins hash identically, broken rows excluded") {
    val media = MultimodalOps.syntheticAudioCorpus(
      docTable, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
    val hashes = MultimodalOps.audioEnvHash(media)
    val hm = hashes.collect().map(h => h.media_id -> h).toMap
    val off = MultimodalOps.VariantIdOffset
    assert(!hm(off + 0L).ok && !hm(off + 97L).ok, "truncated WAVs must flag")
    // amplitude-scale invariance: the 45%-volume twin hashes EXACTLY equal
    for (i <- Seq(4L, 8L, 12L, 16L))
      assert(hm(off + i).ehash == hm(i).ehash, s"twin $i")
    val pairs = MultimodalOps.audioNearDupPairs(hashes.toDF(), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- Seq(4L, 8L, 12L, 16L))
      assert(pairs.get((i, off + i)).contains(0L), s"twin pair $i missing: $pairs")
    assert(pairs.keys.forall { case (a, b) =>
      a != off + 0L && b != off + 0L && a != off + 97L && b != off + 97L })
  }

  /** A deterministic multi-frame Y4M: luma(f, x, y) is textured so frame
    * dHashes spread; even dims by default so C420 round-trips. */
  private def y4m(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = Vector.tabulate(nFrames) { f =>
      Array.tabulate(w * h) { i =>
        ((i % w) * 29 + (i / w) * 17 + f * 101 + (i * i) % 61).toByte
      }
    }
    MultimodalOps.VideoCodec.encodeY4m(w, h, 25, 1, frames)
  }

  test("VideoCodec: encodeY4m -> decode round-trips luma, header, and framing") {
    val payload = y4m(16, 12, 4)
    val v = MultimodalOps.VideoCodec.decode(payload).get
    assert(v.width == 16 && v.height == 12 && v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.lumaFrames.size == 4)
    // luma is the identity through encode∘decode (chroma is synthetic)
    val expect = Vector.tabulate(4) { f =>
      Array.tabulate(16 * 12) { i =>
        ((i % 16) * 29 + (i / 16) * 17 + f * 101 + (i * i) % 61).toByte
      }
    }
    v.lumaFrames.zip(expect).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
    // mono round-trip on ODD dimensions (legal Y4M, no chroma planes)
    val mono = MultimodalOps.VideoCodec.encodeY4mMono(9, 11, 30, 1,
      Seq(Array.tabulate(99)(_.toByte)))
    val mv = MultimodalOps.VideoCodec.decode(mono).get
    assert(mv.width == 9 && mv.height == 11 && mv.lumaFrames.size == 1)
    assert(java.util.Arrays.equals(mv.lumaFrames.head,
      Array.tabulate(99)(_.toByte)))
  }

  test("VideoCodec.decode: truncated, hostile, and malformed payloads return None") {
    val good = y4m(16, 12, 3)
    // truncation at any depth: header-only, mid-marker, mid-frame
    assert(MultimodalOps.VideoCodec.decode(good.take(10)).isEmpty)
    assert(MultimodalOps.VideoCodec.decode(good.take(good.length / 2)).isEmpty)
    assert(MultimodalOps.VideoCodec.decode(good.dropRight(1)).isEmpty)
    assert(MultimodalOps.VideoCodec.decode("not video".getBytes).isEmpty)
    assert(MultimodalOps.VideoCodec.decode(null).isEmpty)
    // hostile header claiming giant dimensions must refuse pre-allocation
    val hostile = ("YUV4MPEG2 W100000 H100000 F30:1 C420jpeg\nFRAME\n")
      .getBytes("US-ASCII")
    assert(MultimodalOps.VideoCodec.decode(hostile).isEmpty)
    // zero/negative dims and unknown colourspace
    assert(MultimodalOps.VideoCodec.decode(
      "YUV4MPEG2 W0 H16 F30:1\nFRAME\n".getBytes("US-ASCII")).isEmpty)
    assert(MultimodalOps.VideoCodec.decode(
      "YUV4MPEG2 W16 H16 F30:1 Cweird\nFRAME\n".getBytes("US-ASCII")).isEmpty)
  }

  test("AviCodec: DIB round-trips luma exactly; MJPEG survives dHash-equivalent") {
    import MultimodalOps.{AviCodec, VideoCodec}
    // smooth gradient frames: JPEG quantization must not move 9x8 box means
    val frames = Vector.tabulate(3) { f =>
      Array.tabulate(16 * 12) { i =>
        ((i % 16) * 13 + (i / 16) * 7 + f * 31).toByte }
    }
    // lossless fixture: uncompressed bottom-up BGR24 DIB frames
    val dib = AviCodec.decode(
      AviCodec.encodeDib(16, 12, 40000L, frames)).get
    assert(dib.width == 16 && dib.height == 12 && dib.lumaFrames.size == 3)
    assert(dib.fpsNum == 1000000 && dib.fpsDen == 40000) // 25 fps rational
    dib.lumaFrames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want),
        "DIB decode must be the luma identity") }
    // compressed fixture: every frame an independent JPEG (Motion-JPEG)
    val mj = AviCodec.decode(
      AviCodec.encodeMjpeg(16, 12, 40000L, frames)).get
    assert(mj.width == 16 && mj.height == 12 && mj.lumaFrames.size == 3)
    mj.lumaFrames.zip(frames).foreach { case (got, want) =>
      val d = java.lang.Long.bitCount(
        VideoCodec.dHashLuma(got, 16, 12) ^ VideoCodec.dHashLuma(want, 16, 12))
      assert(d <= 2, s"JPEG loss moved the perceptual hash $d bits") }
  }

  test("AviCodec.decode: truncated, hostile, and malformed payloads return None") {
    import MultimodalOps.AviCodec
    val frames = Vector.tabulate(2)(f =>
      Array.tabulate(16 * 12)(i => (i + f).toByte))
    val good = AviCodec.encodeMjpeg(16, 12, 40000L, frames)
    assert(AviCodec.decode(good).nonEmpty, "fixture sanity")
    assert(AviCodec.decode(good.take(20)).isEmpty)
    assert(AviCodec.decode(good.take(good.length / 2)).isEmpty)
    assert(AviCodec.decode(good.dropRight(3)).isEmpty)
    assert(AviCodec.decode(null).isEmpty)
    assert(AviCodec.decode("RIFFxxxxWAVEdata".getBytes("US-ASCII")).isEmpty)
    // hostile avih claiming giant dims with a DIB frame: size check refuses
    val dibGood = AviCodec.encodeDib(16, 12, 40000L, frames)
    val hostile = dibGood.clone()
    // avih dwWidth lives 8 bytes into RIFF + LIST(hdrl) + avih headers:
    // find the 'avih' fourcc and poison its width field
    val at = hostile.sliding(4).indexWhere(_.sameElements("avih".getBytes))
    hostile(at + 8 + 32) = 0xff.toByte; hostile(at + 8 + 33) = 0xff.toByte
    hostile(at + 8 + 34) = 0xff.toByte
    assert(AviCodec.decode(hostile).isEmpty)
    // garbage bytes in an 00dc chunk: ImageIO refuses, row must not decode
    val bad = AviCodec.encodeAviForTest(16, 12, 40000L,
      Seq(("00dc", Array.fill[Byte](64)(0x42))))
    assert(AviCodec.decode(bad).isEmpty)
  }

  test("decodeVideo: container-agnostic — MJPEG-AVI twin of a Y4M video pairs") {
    import MultimodalOps.{AviCodec, VideoCodec}
    val base = y4m(16, 16, 6)
    val v = VideoCodec.decode(base).get
    // the SAME luma content shipped as compressed MJPEG inside AVI
    val avi = AviCodec.encodeMjpeg(16, 16, 40000L, v.lumaFrames)
    val unrelated = {
      val frames = Vector.tabulate(6)(f =>
        Array.tabulate(256)(i => ((i % 16) * 91 + (i / 16) * 3 + f * 7).toByte))
      VideoCodec.encodeY4m(16, 16, 25, 1, frames)
    }
    val rows = Seq(
      media(1L, "video", base),
      media(2L, "video", avi),
      media(3L, "video", unrelated),
      media(4L, "video", avi.take(60))) // broken AVI: flagged, never pairs
    val hashes = MultimodalOps.videoFrameHashes(spark.createDataset(rows))
    assert(hashes.filter(h => !h.ok).collect().map(_.media_id).toSeq ==
      Seq(4L), "only the broken AVI flags")
    val pairs = MultimodalOps.videoNearDupPairs(hashes.toDF(),
      maxHamming = 6, minMatchFrac = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(pairs.contains((1L, 2L)),
      s"Y4M and its MJPEG-AVI twin must pair across containers: $pairs")
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L },
      s"unrelated video must not pair: $pairs")
  }

  test("videoFeatures + videoFrameHashes: decode, flag, and hash per sampled frame") {
    val rows = Seq(
      media(1L, "video", y4m(16, 16, 6)),
      media(2L, "video", y4m(16, 16, 6).take(40)), // truncated
      media(3L, "video", "junk".getBytes))
    val feats = MultimodalOps.videoFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).ok && feats(1L).n_frames == 6 &&
      feats(1L).width == 16 && feats(1L).fps == 25.0)
    assert(!feats(2L).ok && !feats(3L).ok)
    val hashes = MultimodalOps.videoFrameHashes(
      spark.createDataset(rows), stride = 2, maxFrames = 2).collect()
    val byId = hashes.groupBy(_.media_id)
    // stride 2 over 6 frames = indices 0,2,4; maxFrames 2 caps to 0,2
    assert(byId(1L).forall(_.ok) &&
      byId(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    // undecodable rows emit exactly one ok=false integrity row
    assert(byId(2L).toSeq.map(h => (h.ok, h.frame_idx)) == Seq((false, -1)))
    assert(byId(3L).toSeq.map(h => (h.ok, h.frame_idx)) == Seq((false, -1)))
    // re-encode twin: decode -> encode -> hash is bit-identical per frame
    val re = MultimodalOps.VideoCodec.encodeY4m(16, 16, 25, 1,
      MultimodalOps.VideoCodec.decode(y4m(16, 16, 6)).get.lumaFrames)
    val twin = MultimodalOps.videoFrameHashes(spark.createDataset(
      Seq(media(1L, "video", y4m(16, 16, 6)), media(9L, "video", re))))
      .collect().groupBy(_.media_id)
    assert(twin(1L).map(h => h.frame_idx -> h.fhash).toMap ==
      twin(9L).map(h => h.frame_idx -> h.fhash).toMap)
  }

  test("sampleVideoFrames: stride keeps every Nth frame; odd dims re-encode mono") {
    val rows = Seq(
      media(1L, "video", y4m(16, 16, 6)),
      media(2L, "video", {
        // odd-dimension mono source: 15x11, 4 frames
        val frames = Vector.tabulate(4)(f =>
          Array.tabulate(15 * 11)(i => (i * 7 + f * 31).toByte))
        MultimodalOps.VideoCodec.encodeY4mMono(15, 11, 30, 1, frames)
      }),
      media(3L, "video", "junk".getBytes))
    val out = MultimodalOps.sampleVideoFrames(spark.createDataset(rows), 2)
      .collect().map(r => r.media_id -> r).toMap
    val v1 = MultimodalOps.VideoCodec.decode(out(1L).payload).get
    assert(v1.lumaFrames.size == 3) // frames 0, 2, 4
    val orig = MultimodalOps.VideoCodec.decode(y4m(16, 16, 6)).get
    assert(java.util.Arrays.equals(v1.lumaFrames(1), orig.lumaFrames(2)))
    // ADVICE r9: odd-dimension decodable videos must be SAMPLED (mono
    // re-encode), not silently passed through
    val v2 = MultimodalOps.VideoCodec.decode(out(2L).payload).get
    assert(v2.width == 15 && v2.height == 11 && v2.lumaFrames.size == 2)
    // undecodable rows pass through byte-identical (no row invented/lost)
    assert(java.util.Arrays.equals(out(3L).payload, "junk".getBytes))
  }

  test("videoNearDupPairs: re-encoded and frame-subsampled (trimmed) copies pair") {
    val base = y4m(16, 16, 6)
    val v = MultimodalOps.VideoCodec.decode(base).get
    val trimmed = MultimodalOps.VideoCodec.encodeY4m(16, 16, 25, 1,
      v.lumaFrames.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f })
    val unrelated = {
      val frames = Vector.tabulate(6)(f =>
        Array.tabulate(256)(i => ((i % 16) * 91 + (i / 16) * 3 + f * 7).toByte))
      MultimodalOps.VideoCodec.encodeY4m(16, 16, 25, 1, frames)
    }
    val rows = Seq(
      media(1L, "video", base),
      media(2L, "video", MultimodalOps.VideoCodec.encodeY4m(16, 16, 25, 1,
        v.lumaFrames)), // re-encode twin
      media(3L, "video", trimmed), // frame-subsampled copy
      media(4L, "video", unrelated),
      media(5L, "video", base.take(50))) // broken: must never pair
    val pairs = MultimodalOps.videoNearDupPairs(
      MultimodalOps.videoFrameHashes(spark.createDataset(rows)).toDF(),
      maxHamming = 2, minMatchFrac = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.get((1L, 2L)).contains(1.0), s"re-encode twin: $pairs")
    // trimmed copy: all 3 kept frames match, normalized over MIN(nf)=3
    assert(pairs.get((1L, 3L)).contains(1.0), s"trimmed copy: $pairs")
    assert(pairs.get((2L, 3L)).contains(1.0))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated video must not pair: $pairs")
    assert(!pairs.keys.exists { case (a, b) => a == 5L || b == 5L },
      "broken payload must never pair")
  }

  test("syntheticVideoCorpus: planted twins pair at frac 1.0, broken rows flagged and excluded") {
    val media = MultimodalOps.syntheticVideoCorpus(
      docTable, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))
    val rows = media.collect()
    val off = MultimodalOps.VariantIdOffset
    // residue classes: 0 and 97 broken; 8, 16 re-encode twins; 4, 12 stride
    assert(rows.count(_.media_id >= off) == 6, s"${rows.map(_.media_id).toSeq}")
    val hashes = MultimodalOps.videoFrameHashes(media)
    val hm = hashes.collect().groupBy(_.media_id)
    assert(hm(off + 0L).forall(!_.ok) && hm(off + 97L).forall(!_.ok),
      "truncated Y4Ms must flag")
    assert(rows.filter(_.media_id < off).forall(r => hm(r.media_id).forall(_.ok)))
    // re-encode twins carry all 6 frames; stride twins exactly 3
    assert(hm(off + 8L).length == 6 && hm(off + 16L).length == 6)
    assert(hm(off + 4L).length == 3 && hm(off + 12L).length == 3)
    val pairs = MultimodalOps.videoNearDupPairs(hashes.toDF(), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    for (i <- Seq(4L, 8L, 12L, 16L))
      assert(pairs.get((i, off + i)).contains(1.0), s"twin pair $i: $pairs")
    assert(pairs.keys.forall { case (a, b) =>
      a != off + 0L && b != off + 0L && a != off + 97L && b != off + 97L })
  }

  test("registered media queries: deterministic rows on a sf-shaped table") {
    // the q86/q87 bodies run on Tables.documents; emulate with the doc
    // table twice — row counts and pair sets must be identical across runs
    def run() = {
      val img = MultimodalOps.imageNearDupPairs(
        MultimodalOps.imageDHash(MultimodalOps.syntheticImageCorpus(
          docTable, org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))).toDF(), 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val aud = MultimodalOps.audioNearDupPairs(
        MultimodalOps.audioEnvHash(MultimodalOps.syntheticAudioCorpus(
          docTable, org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))).toDF(), 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val vid = MultimodalOps.videoNearDupPairs(
        MultimodalOps.videoFrameHashes(MultimodalOps.syntheticVideoCorpus(
          docTable, org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))).toDF(), 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      (img, aud, vid)
    }
    val (i1, a1, v1) = run()
    val (i2, a2, v2) = run()
    assert(i1 == i2 && a1 == a2 && v1 == v2)
    assert(i1.nonEmpty && a1.nonEmpty && v1.nonEmpty)
  }

  test("MpegAudioCodec: CBR encode -> parse roundtrips frames, rate, duration") {
    import MultimodalOps.MpegAudioCodec
    // 10 frames at bitrate index 9 = 128 kbps, MPEG-1 Layer III 44.1 kHz mono
    val p = MpegAudioCodec.encodeMp3ForTest(Seq.fill(10)(9))
    val i = MpegAudioCodec.parse(p).get
    assert(i.version === 1 && i.layer === 3)
    assert(i.sampleRate === 44100 && i.channels === 1)
    assert(i.nFrames === 10 && !i.isVbr)
    assert(i.meanBitrateKbps === 128.0)
    assert(i.durationMs === 10L * 1152 * 1000 / 44100) // 261 ms
  }

  test("MpegAudioCodec: VBR stream behind an ID3v2 tag parses; bitrate is the frame mean") {
    import MultimodalOps.MpegAudioCodec
    val idxs = 1 to 14 // every table entry once
    val p = MpegAudioCodec.encodeMp3ForTest(idxs, id3Bytes = 37)
    val i = MpegAudioCodec.parse(p).get
    assert(i.nFrames === 14 && i.isVbr)
    val kbps = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    assert(i.meanBitrateKbps === kbps.sum.toDouble / 14)
  }

  test("MpegAudioCodec: truncated final frame is tolerated but not counted") {
    import MultimodalOps.MpegAudioCodec
    val p = MpegAudioCodec.encodeMp3ForTest(Seq.fill(10)(9))
    val i = MpegAudioCodec.parse(p.dropRight(5)).get
    assert(i.nFrames === 9)
    // an ID3v1 'TAG' tail after the last frame is tolerated too
    val tag = "TAG".getBytes ++ Array.fill[Byte](125)(0x20)
    assert(MpegAudioCodec.parse(p ++ tag).get.nFrames === 10)
  }

  test("MpegAudioCodec: garbage, single-frame, and mid-stream corruption fail") {
    import MultimodalOps.MpegAudioCodec
    assert(MpegAudioCodec.parse(Array.tabulate[Byte](64)(i => (i * 13).toByte)).isEmpty)
    assert(MpegAudioCodec.parse(MpegAudioCodec.encodeMp3ForTest(Seq(9))).isEmpty)
    val p = MpegAudioCodec.encodeMp3ForTest(Seq.fill(10)(9))
    val corrupt = p.clone()
    corrupt(417 * 3) = 0x00 // stomp the 4th frame's sync byte
    assert(MpegAudioCodec.parse(corrupt).isEmpty)
    assert(MpegAudioCodec.parse(null).isEmpty)
    assert(MpegAudioCodec.parse(Array.emptyByteArray).isEmpty)
  }

  test("mpegAudioInfo over syntheticMp3Corpus: CBR/VBR verdicts, ID3 path, broken rows") {
    val rows = MultimodalOps.mpegAudioInfo(MultimodalOps.syntheticMp3Corpus(
      docTable, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")))
      .collect().map(r => r.media_id -> r).toMap
    assert(rows.size === 10)
    assert(!rows(0L).ok && !rows(97L).ok)       // planted garbage payloads
    rows.values.filter(_.ok).foreach { r =>
      assert(r.sample_rate === 44100 && r.version === 1 && r.layer === 3)
      assert(r.n_frames >= 8 && r.duration_ms > 0)
      assert(r.is_vbr === (r.media_id % 2 == 1)) // even ids CBR, odd VBR
    }
    // compressed audio is NOT a PCM container: the PCM face must flag it,
    // not mis-parse it — the transcode contract's test half
    val viaPcm = MultimodalOps.audioFeatures(MultimodalOps.syntheticMp3Corpus(
      docTable, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"))).collect()
    assert(viaPcm.forall(!_.ok))
  }
}
