package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / resize / frame-sampling run as
  * partition-wise batched kernels (`mapPartitions` over the typed Dataset —
  * the Scala counterpart of Python's `mapInPandas` Arrow batches).
  *
  * The actual codecs are NOT present in this environment, so the
  * byte-interpreting kernels are STUBS — deterministic functions of the
  * bytes (md5-derived) with the real production signature. The Spark-side
  * contract — schema, encoders, batch shape, partitioning, null handling —
  * is real and tested; swapping in a JNI/ffmpeg decoder changes only the
  * function body.
  */
object Multimodal {

  /** A media asset row: opaque payload + envelope metadata. */
  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte],
                        source_uri: String)

  case class DecodedMeta(asset_id: Long, kind: String, n_bytes: Long,
                         content_hash: String, width: Int, height: Int,
                         channels: Int, est_duration_ms: Long)

  case class MediaFeatures(asset_id: Long, embedding: Array[Float])

  case class FrameSample(asset_id: Long, frame_index: Int, frame_hash: String)

  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("source_uri", StringType)))

  /** Wrap any table with a binary-able column into the media envelope
    * (test/bench carrier: documents.text bytes stand in for media bytes).
    */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String,
               kind: String): Dataset[MediaAsset] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
        lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        concat(lit("mem://"), col(idCol)).as("source_uri"))
      .as[MediaAsset]
  }

  private def md5Bytes(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** Cap on declared pixel count (width × height). A decompression-bomb
    * payload — tiny bytes declaring huge dimensions — must quarantine, not
    * feed a downstream stage that would allocate width×height×channels.
    */
  private[operators] val MaxDeclaredPixels: Long = 512L * 1024 * 1024

  /** Tighter cap for the FULL-pixel decode paths ([[lumaGrid]],
    * [[resizeImageBytes]]): `ImageIO.read` allocates width×height×4 bytes,
    * so the header-parse cap above (sized for pixel-free metadata reads)
    * would admit ~2 GB single-row rasters. 16M px bounds a task's decode
    * buffer at ~64 MB.
    */
  private[operators] val MaxFullDecodePixels: Long = 16L * 1024 * 1024

  /** Real image header decode, JDK-only (`javax.imageio` — PNG/JPEG/GIF/BMP
    * ship with the JRE; no native deps). Gated on the container magic bytes
    * so non-image payloads skip reader probing entirely — at corpus scale
    * the gate is what keeps a mixed binary column from paying decoder init
    * per row. Reads ONLY the header: `reader.getWidth/getHeight/
    * getImageTypes` parse container metadata without allocating or
    * decompressing a single pixel row, so a decompression bomb costs a few
    * header bytes, and the per-row cost is parsing, not decoding. The
    * in-memory `ImageInputStream` (cache disabled) avoids ImageIO's default
    * per-call disk-cache file. Any failure — including `Error`s a malformed
    * container can provoke in a reader — degrades to None (quarantine-able
    * metadata), never a stage failure. Returns (width, height, channels).
    */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def hasImageMagic: Boolean = bytes.length >= 4 && {
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') || // PNG
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte && bytes(2) == 0xff.toByte) ||    // JPEG
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') ||         // GIF
      (bytes(0) == 'B' && bytes(1) == 'M')                                                  // BMP
    }
    if (!hasImageMagic) None
    else try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h.toLong > MaxDeclaredPixels) None
            else {
              val types = reader.getImageTypes(0)
              if (!types.hasNext) None
              else Some((w, h, types.next().getColorModel.getNumComponents))
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Throwable => None }
  }

  /** Real audio header decode, JDK-only (`javax.sound.sampled` — WAV/AIFF/
    * AU ship with the JRE). Gated on the container magic (RIFF/WAVE, FORM/
    * AIFF, .snd) so non-audio payloads skip parser probing. Reads ONLY the
    * header: `getAudioFileFormat` parses format chunks without decoding
    * samples, so cost is bytes-of-header per row. Returns
    * (channels, duration_ms); duration derives from frame count / frame
    * rate and is -1 when the container does not declare them.
    */
  private[operators] def decodeAudio(bytes: Array[Byte]): Option[(Int, Long)] = {
    def hasAudioMagic: Boolean = bytes.length >= 12 && {
      (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') ||
      (bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M') || // AIFF
      (bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd')    // AU
    }
    if (!hasAudioMagic) None
    else try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength
      val rate = fmt.getFrameRate
      val durMs =
        if (frames > 0 && rate > 0 && !rate.isNaN) (frames * 1000.0 / rate).toLong
        else -1L
      val ch = fmt.getChannels
      if (ch <= 0) None else Some((ch, durMs))
    } catch { case _: Throwable => None }
  }

  /** Real video CONTAINER-HEADER decode: a minimal ISO BMFF (MP4/QuickTime)
    * box walk, pure JVM — no codec library, because none is needed for
    * metadata: dimensions and duration live in the `moov` header boxes,
    * not in the sample data. Gated on the `ftyp` magic at offset 4.
    * Walks top-level boxes to `moov`, reads `mvhd` (timescale + duration →
    * milliseconds; v0 and v1 layouts) and every `trak`/`tkhd` (16.16
    * fixed-point width/height; audio tracks declare 0×0, so the max over
    * tracks is the video track's raster). Frame/pixel decode — the part
    * that genuinely requires ffmpeg-class native code — is exactly what
    * metadata extraction at ingest must NOT do per asset.
    */
  private[operators] def decodeVideo(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def typ(o: Int): String = new String(bytes, o + 4, 4, "ISO-8859-1")
    def hasFtyp: Boolean = bytes.length >= 12 && typ(0) == "ftyp"
    if (!hasFtyp) return None
    try {
      // (start, end) of each box's PAYLOAD within [from, until)
      def boxes(from: Int, until: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var o = from
          def hasNext: Boolean = o + 8 <= until
          def next(): (String, Int, Int) = {
            val declared = u32(o)
            val t = typ(o)
            val (hdr, size) =
              if (declared == 1L && o + 16 <= until) (16, u64(o + 8))
              else if (declared == 0L) (8, (until - o).toLong) // to end
              else (8, declared)
            val end = math.min(until.toLong, o + math.max(size, hdr.toLong)).toInt
            val r = (t, o + hdr, end)
            o = end
            r
          }
        }
      val moov = boxes(0, bytes.length).collectFirst { case ("moov", s, e) => (s, e) }
      moov.flatMap { case (ms, me) =>
        var durMs = -1L
        var w = 0
        var h = 0
        boxes(ms, me).foreach {
          case ("mvhd", s, e) =>
            val v = bytes(s) & 0xff
            if (v == 1 && s + 28 + 4 <= e) {
              val scale = u32(s + 20); val dur = u64(s + 24)
              if (scale > 0) durMs = dur * 1000L / scale
            } else if (v == 0 && s + 16 + 4 <= e) {
              val scale = u32(s + 12); val dur = u32(s + 16)
              if (scale > 0) durMs = dur * 1000L / scale
            }
          case ("trak", s, e) =>
            boxes(s, e).foreach {
              case ("tkhd", ts, te) =>
                val v = bytes(ts) & 0xff
                val base = if (v == 1) ts + 88 else ts + 76 // width offset
                if (base + 8 <= te) {
                  w = math.max(w, (u32(base) >> 16).toInt)
                  h = math.max(h, (u32(base + 4) >> 16).toInt)
                }
              case _ =>
            }
          case _ =>
        }
        if (w > 0 && h > 0) Some((w, h, durMs)) else None
      }
    } catch { case _: Throwable => None }
  }

  /** Decode kernel: REAL for images (ImageIO — true width/height/channels
    * from the container header, pixel-decode-free), for audio
    * (javax.sound.sampled — true channels/duration from WAV/AIFF/AU
    * headers), and for video (ISO-BMFF `moov` box walk — true raster and
    * duration from MP4/QuickTime headers). Payloads whose kind-specific
    * parse fails (e.g. the text-bytes bench carrier) fall back to the
    * deterministic hash path, so the kernel is total — a corrupt blob in a
    * 100 TB corpus degrades to quarantine-able metadata instead of failing
    * the stage. The batched iteration, encoder, and null handling are
    * production shape; one kernel invocation per partition amortizes codec
    * init exactly like an Arrow batch does.
    */
  private def decodeOne(a: MediaAsset): DecodedMeta = {
    val bytes = Option(a.payload).getOrElse(Array.emptyByteArray)
    val h = md5Bytes(bytes)
    val n = bytes.length.toLong
    val img = if (a.kind == "image") decodeImage(bytes) else None
    val aud = if (a.kind == "audio") decodeAudio(bytes) else None
    val vid = if (a.kind == "video") decodeVideo(bytes) else None
    (img, aud, vid) match {
      case (Some((w, hgt, c)), _, _) =>
        DecodedMeta(a.asset_id, a.kind, n, hex(h),
          width = w, height = hgt, channels = c, est_duration_ms = 0L)
      case (_, Some((ch, durMs)), _) =>
        DecodedMeta(a.asset_id, a.kind, n, hex(h),
          width = 0, height = 0, channels = ch, est_duration_ms = durMs)
      case (_, _, Some((w, hgt, durMs))) =>
        DecodedMeta(a.asset_id, a.kind, n, hex(h),
          width = w, height = hgt, channels = 3, est_duration_ms = durMs)
      case _ =>
        DecodedMeta(a.asset_id, a.kind, n, hex(h),
          width = 1 + ((h(0) & 0x7f) << 4 | (h(1) & 0x0f)),
          height = 1 + ((h(2) & 0x7f) << 4 | (h(3) & 0x0f)),
          channels = if (a.kind == "audio") 2 else 3,
          est_duration_ms = if (a.kind == "image") 0L else n * 8)
    }
  }

  /** Bilinear-scaled luma grid of a decodable image (bomb-capped like
    * [[decodeImage]]): the raw material of the perceptual-hash family.
    * Row-major, ITU-R 601 luma. None for undecodable payloads.
    */
  private[operators] def lumaGrid(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Float]] =
    decodeImage(bytes)
      .filter { case (w, h, _) => w.toLong * h.toLong <= MaxFullDecodePixels }
      .flatMap { _ =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(gw, gh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, gw, gh, null)
          } finally g.dispose()
          val luma = new Array[Float](gw * gh)
          var i = 0
          while (i < luma.length) {
            val rgb = out.getRGB(i % gw, i / gw)
            luma(i) = 0.299f * ((rgb >> 16) & 0xff) +
              0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
            i += 1
          }
          Some(luma)
        }
      } catch { case _: Throwable => None }
    }

  /** dHash (difference hash): 9×8 luma grid, bit r*8+c set when
    * luma(r,c) < luma(r,c+1) — the standard 64-bit perceptual fingerprint,
    * robust to uniform brightness/contrast shifts (only the horizontal
    * ORDER of neighboring cells matters). None for undecodable payloads.
    */
  private[operators] def dhash64(bytes: Array[Byte]): Option[Long] =
    lumaGrid(bytes, 9, 8).map { g =>
      var h = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (g(r * 9 + c) < g(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      h
    }

  case class PerceptualHash(asset_id: Long, dhash: Long, decoded: Boolean)

  /** Per-asset perceptual fingerprint: REAL dHash for decodable images;
    * undecodable payloads fall back to a deterministic md5-derived 64-bit
    * stand-in (flagged `decoded = false`) so the operator stays total.
    */
  def perceptualHashes(assets: Dataset[MediaAsset]): Dataset[PerceptualHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val bytes = Option(a.payload).getOrElse(Array.emptyByteArray)
      dhash64(bytes) match {
        case Some(h) => PerceptualHash(a.asset_id, h, decoded = true)
        case None =>
          val m = md5Bytes(bytes)
          val h = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (m(i) & 0xffL))
          PerceptualHash(a.asset_id, h, decoded = false)
      }
    })
  }

  /** Image near-dup pairs by banded hamming over dHash — the visual
    * counterpart of [[Dedup]]'s SimHash path. The 64-bit hash splits into
    * 8 one-byte bands; two hashes within hamming distance `maxDist` < 8
    * agree on at least one band (pigeonhole), so candidates come from 8
    * shuffle-partitioned equi-joins on (band, byte) — never an all-pairs
    * scan — and `bit_count(xor)` verifies exactly. At corpus scale the
    * candidate volume is governed by band-collision rates exactly like
    * MinHash LSH banding.
    */
  def imageNearDups(hashes: Dataset[PerceptualHash], maxDist: Int = 6): DataFrame = {
    require(maxDist >= 0 && maxDist < 8,
      "imageNearDups: the 8-band pigeonhole guarantee needs maxDist < 8")
    import org.apache.spark.sql.functions.{bit_count, col, explode, expr, sequence, lit}
    val banded = hashes.toDF()
      .select(col("asset_id"), col("dhash"),
        explode(sequence(lit(0), lit(7))).as("band"))
      // & 255, not % 256: Spark's % keeps the dividend's sign, so band 0
      // (shift 0) would key a negative dhash's low byte differently from a
      // positive one's and break the pigeonhole guarantee at maxDist = 7
      .withColumn("bkey", expr("shiftrightunsigned(dhash, band * 8) & 255"))
    // shuffle_hash on both sides: AQE's broadcast conversion would stop
    // ReuseExchange from collapsing the two identical decode+hash subtrees
    // (the pairStatsFromArr pattern) — without it every image is decoded
    // and hashed twice
    AdaptiveGate.hashHinted(banded.as("a")).join(AdaptiveGate.hashHinted(banded.as("b")),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Cap on PCM bytes pulled for the envelope: a multi-hour WAV costs at
    * most this much memory per row (the tail is simply not windowed).
    */
  private[operators] val MaxEnvelopeBytes: Int = 16 * 1024 * 1024

  /** REAL audio features for decodable 16-bit PCM containers: the
    * RMS-energy envelope over `dim` equal time windows (channel-mixed,
    * unit-norm) — the classic energy fingerprint (silence detection,
    * loudness near-dup). Reads at most [[MaxEnvelopeBytes]] of samples.
    * None for undecodable payloads or non-16-bit encodings.
    */
  private[operators] def audioRmsEnvelope(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeAudio(bytes).flatMap { _ =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
          else {
            val pcm = ais.readNBytes(MaxEnvelopeBytes)
            val ch = fmt.getChannels
            val big = fmt.isBigEndian
            val nSamples = pcm.length / 2 / ch // mono-mixed sample count
            if (nSamples < dim) None
            else {
              val env = new Array[Float](dim)
              var w = 0
              while (w < dim) {
                val from = (w.toLong * nSamples / dim).toInt
                val until = ((w + 1).toLong * nSamples / dim).toInt
                var acc = 0.0
                var i = from
                while (i < until) {
                  var mix = 0.0
                  var c = 0
                  while (c < ch) {
                    val o = (i * ch + c) * 2
                    val s = if (big) (pcm(o) << 8) | (pcm(o + 1) & 0xff)
                            else (pcm(o + 1) << 8) | (pcm(o) & 0xff)
                    mix += s / 32768.0
                    c += 1
                  }
                  mix /= ch
                  acc += mix * mix
                  i += 1
                }
                env(w) = math.sqrt(acc / math.max(until - from, 1)).toFloat
                w += 1
              }
              val norm = math.sqrt(env.map(x => x.toDouble * x).sum).toFloat
              Some(if (norm > 0f) env.map(_ / norm) else env)
            }
          }
        } finally ais.close()
      } catch { case _: Throwable => None }
    }

  /** `payloadMd5`: the payload's md5, when the caller already computed it
    * ([[profile]] threads decodeOne's hash through so the fused pass
    * really does hash each payload ONCE — its documented contract); the
    * hash-chain stand-in recomputes it otherwise.
    */
  private def featuresOne(a: MediaAsset, dim: Int,
                          payloadMd5: Option[Array[Byte]] = None): Array[Float] = {
    val bytes = Option(a.payload).getOrElse(Array.emptyByteArray)
    // REAL audio features for decodable PCM: the RMS-energy envelope
    if (a.kind == "audio") {
      audioRmsEnvelope(bytes, dim) match {
        case Some(env) => return env
        case None => // fall through to the image probe / stand-in below
      }
    }
    // REAL perceptual features for decodable images: zero-mean, unit-norm
    // bilinear luma grid (the pHash family's embedding) — directly
    // consumable by Similarity / embeddingNearDups. The magic-byte gate
    // inside decodeImage keeps non-image payloads off the decoder.
    lumaGrid(bytes, 8, (dim + 7) / 8).map { g =>
      val take = g.take(dim).padTo(dim, 0.0f)
      val mean = take.sum / dim
      val centered = take.map(_ - mean)
      val norm = math.sqrt(centered.map(x => x.toDouble * x).sum).toFloat
      if (norm > 0f) centered.map(_ / norm) else centered
    }.getOrElse {
      // deterministic hash-chain stand-in keeps the operator total
      val emb = new Array[Float](dim)
      var h = payloadMd5.getOrElse(md5Bytes(bytes))
      var i = 0
      while (i < dim) {
        if (i % 16 == 0 && i > 0) h = md5Bytes(h)
        emb(i) = ((h(i % 16) & 0xff) - 128) / 128.0f
        i += 1
      }
      emb
    }
  }

  def decodeMeta(assets: Dataset[MediaAsset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    // per-partition init cost lives in mapPartitions (codec contexts)
    assets.mapPartitions(_.map(decodeOne))
  }

  /** The COLUMNAR spelling of [[decodeMeta]] over a raw table: identical
    * rows (MultimodalSpec pins parity on real PNG/JPEG/WAV/MP4 fixtures
    * and on undecodable carriers), but evaluated as builtins
    * (`octet_length`, `md5`) plus ONE codegen'd static call
    * ([[MediaHeaderMeta]]) inside a single WholeStageCodegen span — no
    * typed-Dataset encoder round-trip, and the payload is hashed once
    * (decodeOne + the feature stand-in hash twice). This is the scale
    * path for metadata-only profiling (the ingest census over a 100 TB
    * mixed corpus); [[decodeMeta]]/[[extractFeaturesWith]] remain the
    * shape for kernels needing per-partition codec/session state.
    */
  def decodeMetaColumns(df: DataFrame, idCol: String, payloadCol: String,
                        kind: String): DataFrame = {
    import org.apache.spark.sql.GraftShims.{column, expression}
    // decodeOne maps a null payload to the empty byte array — same here,
    // before hashing, so fingerprints agree
    val payload = coalesce(col(payloadCol).cast("binary"),
      lit(Array.emptyByteArray))
    val h = md5(payload)
    val meta = column(MediaHeaderMeta(
      expression(payload), expression(lit(kind)), expression(h)))
    df.select(col(idCol).cast("long").as("asset_id"),
      lit(kind).as("kind"),
      octet_length(payload).cast("long").as("n_bytes"),
      h.as("content_hash"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      meta.getField("channels").as("channels"),
      meta.getField("est_duration_ms").as("est_duration_ms"))
  }

  /** Pluggable model-forward seam: a real encoder (ONNX session, JNI
    * weights, an RPC to a GPU sidecar) implements `encodeBatch`; the
    * engine owns everything around it — partition plumbing, BOUNDED
    * batching (rows AND payload bytes, so one partition of 4 MB images
    * can't assemble a 2 GB batch), per-partition warmup, and the
    * deterministic fallback. `open()` runs once per partition (session /
    * weight load), `close()` on partition end.
    */
  trait MediaModel extends Serializable {
    def name: String
    /** embedding width this model produces */
    def dim: Int
    /** batch caps: flush when EITHER is reached */
    def maxBatchRows: Int = 64
    def maxBatchBytes: Long = 64L << 20
    /** once-per-partition lifecycle (load weights / open session) */
    def open(): Unit = ()
    def close(): Unit = ()
    /** one output row per input row, same order */
    def encodeBatch(batch: Seq[MediaAsset]): Seq[Array[Float]]
  }

  /** The deterministic stand-in as a [[MediaModel]]: batches delegate to
    * the per-asset kernels ([[featuresOne]] — real luma/RMS features for
    * decodable payloads, hash-chain otherwise). The default model, so
    * `extractFeatures` == `extractFeaturesWith(standInModel(dim))`.
    */
  def standInModel(dim0: Int): MediaModel = new MediaModel {
    def name = "stand-in"
    def dim: Int = dim0
    def encodeBatch(batch: Seq[MediaAsset]): Seq[Array[Float]] =
      batch.map(a => featuresOne(a, dim0))
  }

  /** [[extractFeatures]] through an arbitrary [[MediaModel]]. Batches
    * are assembled lazily per partition (never materializing the
    * partition), flushed on either cap, and the model is opened/closed
    * once per partition — the mapPartitions shape a real encoder needs
    * for amortized session reuse. Row order and count are preserved.
    */
  def extractFeaturesWith(assets: Dataset[MediaAsset],
                          model: MediaModel): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      model.open()
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; model.close() }
      // close on task completion/failure too: an early-terminating
      // consumer (limit/take) never drains the iterator, and a task that
      // dies mid-batch never reaches hasNext=false — either would leak
      // the encoder session (GPU memory, an ONNX session, an RPC channel)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val batches = new Iterator[Seq[MediaAsset]] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) closeOnce(); h }
        def next(): Seq[MediaAsset] = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[MediaAsset]
          var bytes = 0L
          while (it.hasNext && buf.size < model.maxBatchRows &&
              bytes < model.maxBatchBytes) {
            val a = it.next()
            buf += a
            bytes += Option(a.payload).map(_.length.toLong).getOrElse(0L)
          }
          buf.toSeq
        }
      }
      batches.flatMap { b =>
        val out = model.encodeBatch(b)
        require(out.size == b.size,
          s"MediaModel ${model.name}: ${out.size} outputs for ${b.size} inputs")
        b.zip(out).map { case (a, e) => MediaFeatures(a.asset_id, e) }
      }
    }
  }

  /** Feature extraction: REAL for decodable images (zero-mean unit-norm
    * bilinear luma grid — the pHash family's perceptual embedding);
    * audio/video and undecodable payloads keep the deterministic
    * hash-chain stand-in (a model forward pass needs weights a bare JVM
    * does not ship). Output feeds [[Similarity]] /
    * [[Dedup.embeddingNearDups]] unchanged.
    */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => MediaFeatures(a.asset_id, featuresOne(a, dim))))
  }

  /** STUB frame sampling: every video yields `n` evenly-spaced "frames"
    * (hash-sliced); images yield one. Output is exploded — one row per
    * frame — the shape a caption/OCR stage consumes.
    */
  def sampleFrames(assets: Dataset[MediaAsset], n: Int = 4): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val bytes = Option(a.payload).getOrElse(Array.emptyByteArray)
      val frames = if (a.kind == "video") n else 1
      (0 until frames).map { i =>
        val slice = bytes.slice(i * bytes.length / math.max(frames, 1),
          (i + 1) * bytes.length / math.max(frames, 1))
        FrameSample(a.asset_id, i, hex(md5Bytes(slice)))
      }
    }
  }

  /** Full image resize, JDK-only: ImageIO decode (behind the same magic
    * gate and declared-pixel bomb cap as [[decodeImage]] — the full-pixel
    * decode only happens AFTER the header passes the cap), bilinear
    * `Graphics2D` scale to fit `maxDim` on the longest side, PNG
    * re-encode. Any failure degrades to None, never a stage failure.
    */
  private[operators] def resizeImageBytes(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    decodeImage(bytes)
      .filter { case (w, h, _) => w.toLong * h.toLong <= MaxFullDecodePixels }
      .flatMap { case (w0, h0, _) =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val scale = math.min(1.0, maxDim.toDouble / math.max(w0, h0))
          val w = math.max(1, math.round(w0 * scale).toInt)
          val h = math.max(1, math.round(h0 * scale).toInt)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Throwable => None }
    }

  /** Resize kernel: REAL for decodable images (ImageIO decode → bilinear
    * scale to fit `maxDim` → PNG re-encode, bomb-capped like
    * [[decodeImage]]); audio/video and undecodable payloads keep the
    * documented deterministic stand-in (byte truncation) — a bare JVM
    * ships no audio/video transcoder, and the Spark shape (typed map over
    * the asset envelope) is identical either way. `maxBytes` is a hard
    * payload bound on EVERY output row: a re-encoded PNG that still exceeds
    * it (tiny `maxBytes`, incompressible pixels) falls back to truncation
    * rather than shipping an over-budget blob to the downstream store.
    */
  def resize(assets: Dataset[MediaAsset], maxBytes: Int = 4096,
             maxDim: Int = 64): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val bytes = Option(a.payload).getOrElse(Array.emptyByteArray)
      a.copy(payload = resizeImageBytes(bytes, maxDim)
        .filter(_.length <= maxBytes)
        .getOrElse(bytes.take(maxBytes)))
    }
  }

  case class MediaProfile(asset_id: Long, kind: String, n_bytes: Long,
                          content_hash: String, width: Int, height: Int,
                          channels: Int, est_duration_ms: Long,
                          embedding: Array[Float])

  /** Full multimodal profile (meta + features) in ONE pass over the
    * payload bytes — a join of [[decodeMeta]] and [[extractFeatures]]
    * would scan and hash every asset twice and shuffle both sides on
    * asset_id for the equi-join; at corpus scale the payload pass IS the
    * cost, so the kernels are fused per partition instead.
    */
  def profile(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): DataFrame = {
    val assets = asAssets(df, idCol, payloadCol, kind)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val m = decodeOne(a)
        // re-derive the raw hash bytes from decodeOne's hex fingerprint
        // (32 hex chars) instead of hashing the payload a second time —
        // the fused pass's whole point is ONE pass over the bytes
        val hBytes = m.content_hash.sliding(2, 2)
          .map(Integer.parseInt(_, 16).toByte).toArray
        MediaProfile(m.asset_id, m.kind, m.n_bytes, m.content_hash, m.width,
          m.height, m.channels, m.est_duration_ms,
          featuresOne(a, 64, Some(hBytes)))
      }
    }.toDF()
  }
}
