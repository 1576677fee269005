package graft

import graft.multimodal.{Codecs, Multimodal}

/** Real-codec round trips (BMP 24-bit, WAV PCM16) and the distributed
  * decode → feature pipeline over genuine encoded payloads.
  */
class CodecSpec extends SparkSpec {

  test("BMP24 round-trip: encode then decode recovers every pixel") {
    val (w, h) = (5, 3)
    val rng = new scala.util.Random(11)
    val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val bytes = Codecs.encodeBmp24(w, h, rgb)
    val (dw, dh, gray) = Codecs.decodeBmp24(bytes)
    assert((dw, dh) == (w, h))
    for (p <- 0 until w * h) {
      val r = rgb(p * 3) & 0xff; val g = rgb(p * 3 + 1) & 0xff; val b = rgb(p * 3 + 2) & 0xff
      val want = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
      assert(math.abs(gray(p) - want) < 1e-12, s"pixel $p: ${gray(p)} vs $want")
    }
    // Odd widths exercise the 4-byte row padding.
    assert(bytes.length == 54 + (w * 3 + (4 - (w * 3) % 4) % 4) * h)
  }

  test("WAV PCM16 round-trip: sine wave survives within quantization error") {
    val sr = 16000
    val samples = Array.tabulate(800)(i => math.sin(2 * math.Pi * 440 * i / sr) * 0.8)
    val bytes = Codecs.encodeWavPcm16(samples, sr)
    val (dsr, decoded) = Codecs.decodeWavPcm16(bytes)
    assert(dsr == sr && decoded.length == samples.length)
    samples.zip(decoded).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 0.5 / 32767 + 1e-9, s"$a vs $b")
    }
  }

  test("malformed payloads fail loudly, not silently") {
    intercept[IllegalArgumentException](Codecs.decodeBmp24("nope".getBytes))
    intercept[IllegalArgumentException](Codecs.decodeWavPcm16(new Array[Byte](50)))
    // Truncated pixel data must throw too.
    val ok = Codecs.encodeBmp24(4, 4, new Array[Byte](48))
    intercept[IllegalArgumentException](Codecs.decodeBmp24(ok.take(ok.length - 8)))
  }

  test("distributed decode of real BMP/WAV payloads matches local features") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 40L).map { id =>
      if (id % 2 == 0) {
        val (w, h) = (6, 4)
        val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
        Multimodal.MediaRow(id, "image", Codecs.encodeBmp24(w, h, rgb),
          Multimodal.MediaMeta(w, h, 0, 1, "image/bmp"))
      } else {
        val n = 200 + rng.nextInt(100)
        val s = Array.tabulate(n)(i => math.sin(0.01 * (id + 1) * i) * 0.9)
        Multimodal.MediaRow(id, "audio", Codecs.encodeWavPcm16(s, 16000),
          Multimodal.MediaMeta(1, 1, 16000, n, "audio/wav"))
      }
    }
    val ds = spark.createDataset(rows).repartition(4)
    val feats = Multimodal.extractFeatures(spark, ds)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 40)
    rows.foreach { m =>
      val decoded = Codecs.decodeAny(m.payload, m.meta)
      val hist = new Array[Double](16)
      var n = 0
      decoded.foreach(_.foreach { v => hist(math.min(15, (v * 16).toInt)) += 1.0; n += 1 })
      (0 until 16).foreach(i => hist(i) /= n)
      val got = feats(m.media_id)
      assert(got.dim == 16)
      got.features.zip(hist).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"media ${m.media_id}: $a vs $b")
      }
      // Histograms are probability mass: non-negative, sum to 1.
      assert(math.abs(got.features.sum - 1.0) < 1e-9)
    }
  }

  test("codec registry: a registered codec takes over its mime, deregister restores the stub") {
    import graft.multimodal.{CodecRegistry, MediaCodec}
    // webp: a format with NO built-in codec (PNG/JPEG/GIF now decode for
    // real through javax.imageio, so they never reach the stub).
    val meta = Multimodal.MediaMeta(2, 2, 0, 1, "image/webp")
    val payload = Array[Byte](1, 2, 3, 4)
    // Before registration: unknown compressed format falls back to the stub.
    val viaStub = Codecs.decodeAny(payload, meta)
    val stub = Multimodal.DecodeStub.decode(payload, meta)
    assert(viaStub.length == stub.length &&
      viaStub.zip(stub).forall { case (a, b) => a sameElements b })

    // A drop-in codec (e.g. a real WebP decoder from a user jar) registers
    // for its mime and decodeAny routes through it — decodeAny untouched.
    object FakeWebp extends MediaCodec {
      def mimes: Seq[String] = Seq("image/webp")
      def decode(p: Array[Byte], m: Multimodal.MediaMeta): Array[Array[Double]] =
        Array(p.map(b => (b & 0xff) / 255.0 + 100.0)) // recognizable output
    }
    CodecRegistry.register(FakeWebp)
    try {
      val viaCodec = Codecs.decodeAny(payload, meta)
      assert(viaCodec(0).forall(_ > 99.0), "registered codec was not used")
    } finally CodecRegistry.deregister("image/webp")

    // Stub fallback restored after deregistration.
    val again = Codecs.decodeAny(payload, meta)
    assert(again(0).forall(_ <= 1.0))
    // Built-ins still intact.
    assert(CodecRegistry.lookup("image/bmp").nonEmpty &&
      CodecRegistry.lookup("audio/wav").nonEmpty &&
      CodecRegistry.lookup("image/png").nonEmpty &&
      CodecRegistry.lookup("image/jpeg").nonEmpty)
  }

  test("PNG decodes for real (lossless): javax.imageio path matches exact luminance") {
    val (w, h) = (6, 4)
    val rng = new scala.util.Random(23)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val want = new Array[Double](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val r = rng.nextInt(256); val g = rng.nextInt(256); val b = rng.nextInt(256)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      want(y * w + x) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val frames = Codecs.decodeAny(out.toByteArray,
      Multimodal.MediaMeta(w, h, 0, 1, "image/png"))
    assert(frames.length == 1 && frames(0).length == w * h)
    frames(0).zip(want).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$a vs $b")
    }
  }

  test("JPEG decodes for real (lossy): flat field survives within codec error") {
    val (w, h) = (16, 16)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val frames = Codecs.decodeAny(out.toByteArray,
      Multimodal.MediaMeta(w, h, 0, 1, "image/jpeg"))
    val want = 0x80 / 255.0
    assert(frames(0).length == w * h)
    frames(0).foreach(v => assert(math.abs(v - want) < 0.02, s"$v vs $want"))
  }

  test("corrupt PNG fails loudly, not with garbage features") {
    intercept[IllegalArgumentException] {
      Codecs.decodeAny("not a png at all".getBytes,
        Multimodal.MediaMeta(2, 2, 0, 1, "image/png"))
    }
  }
}
