package graft.multimodal

/** Real, dependency-free codecs: 24-bit BMP (BITMAPINFOHEADER, bottom-up,
  * 4-byte row padding) and PCM16 WAV (RIFF chunk walk, mono/stereo)
  * parsed with plain byte arithmetic, plus PNG/JPEG/GIF through the JDK's
  * own `javax.imageio` (see [[CodecRegistry]]). These retire the decode
  * stub for every image format the JDK can read — only formats with no
  * JDK decoder (MP3, video) still fall back to [[Multimodal.DecodeStub]].
  * Bytes in, samples out, round-trip-tested against the matching encoders
  * in CodecSpec.
  *
  * Both decoders validate magic numbers and bounds and throw on
  * malformed input — a corrupt payload must fail loudly in a pipeline,
  * not produce silent garbage features.
  */
object Codecs {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
    ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def put16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
    put16(b, o, v & 0xffff); put16(b, o + 2, (v >>> 16) & 0xffff)
  }

  // ---- BMP (24-bit uncompressed) ------------------------------------

  /** Encode top-down row-major RGB triples (r,g,b per pixel, w*h*3
    * bytes) as a standard bottom-up 24-bit BMP.
    */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    put32(out, 2, out.length); put32(out, 10, 54)
    put32(out, 14, 40); put32(out, 18, width); put32(out, 22, height)
    put16(out, 26, 1); put16(out, 28, 24); put32(out, 30, 0)
    put32(out, 34, dataSize)
    var o = 54
    var row = height - 1 // bottom-up
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val p = (row * width + x) * 3
        out(o) = rgb(p + 2); out(o + 1) = rgb(p + 1); out(o + 2) = rgb(p) // BGR
        o += 3; x += 1
      }
      o += pad
      row -= 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP to (width, height, grayscale in
    * [0,1] top-down row-major) — the luminance-weighted mean of RGB.
    */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOffset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val height = i32(bytes, 22)
    require(u16(bytes, 28) == 24, s"unsupported bit depth ${u16(bytes, 28)}")
    require(i32(bytes, 30) == 0, "compressed BMP unsupported")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    require(bytes.length >= dataOffset + (rowBytes + pad) * height,
      "truncated BMP pixel data")
    val gray = new Array[Double](width * height)
    var row = 0
    while (row < height) {
      val src = dataOffset + (height - 1 - row) * (rowBytes + pad)
      var x = 0
      while (x < width) {
        val o = src + x * 3
        val b = bytes(o) & 0xff; val g = bytes(o + 1) & 0xff; val r = bytes(o + 2) & 0xff
        gray(row * width + x) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        x += 1
      }
      row += 1
    }
    (width, height, gray)
  }

  // ---- WAV (PCM16) --------------------------------------------------

  /** Encode samples in [-1,1] as a PCM16 WAV (interleaved if stereo —
    * here mono only, channels=1).
    */
  def encodeWavPcm16(samples: Array[Double], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    put32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    put32(out, 16, 16); put16(out, 20, 1); put16(out, 22, 1)
    put32(out, 24, sampleRate); put32(out, 28, sampleRate * 2)
    put16(out, 32, 2); put16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    put32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0, math.min(1.0, samples(i)))
      put16(out, 44 + i * 2, math.round(v * 32767.0).toInt & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16 WAV to (sampleRate, mono samples in [-1,1]) — stereo
    * is folded by channel mean. Walks RIFF chunks, so extra chunks
    * (LIST/INFO) before `data` are handled.
    */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Double]) = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a WAV payload")
    var o = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (o + 8 <= bytes.length && dataOff < 0) {
      val id = new String(bytes.slice(o, o + 4), "US-ASCII")
      val sz = i32(bytes, o + 4)
      // A corrupt (negative / overlong) chunk size would stall or reverse
      // the walk — an infinite loop inside an executor task. Reject it.
      require(sz >= 0 && o + 8 + sz.toLong <= bytes.length,
        s"corrupt WAV chunk size $sz at offset $o")
      id match {
        case "fmt " =>
          require(u16(bytes, o + 8) == 1, "non-PCM WAV unsupported")
          channels = u16(bytes, o + 10)
          sampleRate = i32(bytes, o + 12)
          bits = u16(bytes, o + 22)
          require(bits == 16, s"unsupported bit depth $bits")
        case "data" =>
          dataOff = o + 8; dataLen = sz
        case _ => () // skip LIST/INFO/fact chunks
      }
      o += 8 + sz + (sz % 2) // chunks are word-aligned
    }
    require(dataOff > 0 && channels > 0, "no data/fmt chunk found")
    require(dataOff + dataLen <= bytes.length, "truncated WAV data")
    val frames = dataLen / (2 * channels)
    val mono = new Array[Double](frames)
    var f = 0
    while (f < frames) {
      var s = 0.0
      var c = 0
      while (c < channels) {
        val raw = u16(bytes, dataOff + (f * channels + c) * 2)
        s += (if (raw >= 0x8000) raw - 0x10000 else raw) / 32767.0
        c += 1
      }
      mono(f) = s / channels
      f += 1
    }
    (sampleRate, mono)
  }

  /** Dispatch through [[CodecRegistry]]: real decode for every registered
    * mime (built-in BMP/WAV plus anything discovered or registered),
    * stub for everything else. Returns the frames × samples shape the
    * feature extractors consume; values are shifted to [0,1] for audio so
    * histograms bin uniformly.
    */
  def decodeAny(payload: Array[Byte], meta: Multimodal.MediaMeta): Array[Array[Double]] =
    CodecRegistry.lookup(meta.mime) match {
      case Some(codec) => codec.decode(payload, meta)
      case None        => Multimodal.DecodeStub.decode(payload, meta)
    }
}

/** A pluggable media decoder: bytes + metadata in, frames × samples out.
  * Implementations shipped in a user jar are discovered via the standard
  * `java.util.ServiceLoader` mechanism (a
  * `META-INF/services/graft.multimodal.MediaCodec` entry) — so a JPEG or
  * PNG decoder backed by a real library drops in WITHOUT touching
  * [[Codecs.decodeAny]]; `CodecRegistry.register` is the programmatic
  * alternative for tests and ad hoc wiring.
  */
trait MediaCodec extends Serializable {
  /** Mime types this codec claims, e.g. `Seq("image/png")`. */
  def mimes: Seq[String]
  def decode(payload: Array[Byte], meta: Multimodal.MediaMeta): Array[Array[Double]]
}

/** Per-JVM codec registry. Executors build the same registry on first
  * access (object init + ServiceLoader over the task classpath), so a
  * codec shipped in the application jar is present cluster-wide with no
  * driver→executor state to synchronize.
  */
object CodecRegistry {
  private val codecs =
    new java.util.concurrent.ConcurrentHashMap[String, MediaCodec]()

  /** Built-in pure-JVM codecs. */
  private object BmpCodec extends MediaCodec {
    def mimes: Seq[String] = Seq("image/bmp")
    def decode(payload: Array[Byte], meta: Multimodal.MediaMeta): Array[Array[Double]] = {
      val (_, _, gray) = Codecs.decodeBmp24(payload)
      Array(gray)
    }
  }
  private object WavCodec extends MediaCodec {
    def mimes: Seq[String] = Seq("audio/wav")
    def decode(payload: Array[Byte], meta: Multimodal.MediaMeta): Array[Array[Double]] = {
      val (_, mono) = Codecs.decodeWavPcm16(payload)
      Array(mono.map(v => math.max(0.0, math.min(1.0, (v + 1.0) / 2.0))))
    }
  }

  /** PNG/JPEG via `javax.imageio` — part of the JDK (java.desktop,
    * headless-safe), so these compressed formats decode for real with
    * ZERO added dependencies; only formats the JDK lacks a decoder for
    * (MP3, video) still fall back to the stub. Output is the same
    * luminance-weighted grayscale in [0,1], top-down row-major, that
    * [[Codecs.decodeBmp24]] produces, so every image mime feeds the
    * feature extractors identically.
    */
  private object ImageIoCodec extends MediaCodec {
    def mimes: Seq[String] = Seq("image/png", "image/jpeg", "image/gif")
    def decode(payload: Array[Byte], meta: Multimodal.MediaMeta): Array[Array[Double]] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      // ImageIO returns null (not an exception) on an unreadable payload;
      // a corrupt image must fail loudly in a pipeline, not emit garbage.
      require(img != null, s"unreadable ${meta.mime} payload (${payload.length} bytes)")
      val w = img.getWidth; val h = img.getHeight
      val gray = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          gray(y * w + x) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          x += 1
        }
        y += 1
      }
      Array(gray)
    }
  }

  register(BmpCodec)
  register(WavCodec)
  register(ImageIoCodec)
  // ServiceLoader discovery: later entries win over built-ins only for
  // mimes the built-ins don't claim first-come; explicit register() after
  // startup always wins (ConcurrentHashMap.put replaces).
  java.util.ServiceLoader.load(classOf[MediaCodec]).forEach(c => register(c))

  /** Register (or replace) the codec for each mime it claims. */
  def register(codec: MediaCodec): Unit =
    codec.mimes.foreach(m => codecs.put(m, codec))

  def lookup(mime: String): Option[MediaCodec] = Option(codecs.get(mime))

  /** Remove a mime binding (test cleanup). */
  def deregister(mime: String): Unit = codecs.remove(mime)
}
