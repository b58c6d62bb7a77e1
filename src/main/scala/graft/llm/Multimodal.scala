package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches.
  *
  * Decode is REAL for every codec the JVM ships: images (PNG/JPEG/GIF via
  * javax.imageio — [[decodeImage]]) and audio (WAV/AIFF/AU via
  * javax.sound.sampled — [[decodeAudio]]). Only video remains a
  * clearly-marked deterministic STUB (`stubDecode` — no JVM video codec
  * exists); everything around it (schema, batching, partitioning, the
  * per-partition iterator shape a real JNI/FFI decoder would plug into) is
  * real and tested.
  */
object Multimodal {

  /** Extracted feature record a real decoder would produce per media item. */
  final case class MediaFeatures(id: Long, n_bytes: Int, format: String,
                                 checksum: Long, head: Array[Byte])

  /** Decoded-image record: real dimensions + mean luma from an actual codec. */
  final case class ImageFeatures(id: Long, format: String, width: Int,
                                 height: Int, meanLuma: Double)

  /** Container sniff from magic bytes (PNG/JPEG/GIF — the formats the JVM
    * decodes natively).
    */
  def sniffFormat(payload: Array[Byte]): Option[String] =
    if (payload.length >= 8 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' &&
        payload(3) == 'G') Some("image/png")
    else if (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff) Some("image/jpeg")
    else if (payload.length >= 6 && payload(0) == 'G' && payload(1) == 'I' &&
        payload(2) == 'F') Some("image/gif")
    else None

  /** Sniff-gated codec decode shared by every image operator. Try: a
    * payload that passes the magic-byte sniff can still be truncated or
    * corrupt (common in real corpora) — the codec throws IIOException
    * mid-decode and that must mean "drop the row", not "fail the whole
    * job".
    */
  private def decodeBuffered(payload: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] =
    sniffFormat(payload).flatMap { fmt =>
      scala.util.Try(
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .toOption.flatMap(Option(_)).map(fmt -> _)
    }

  /** REAL image decode for the containers the JVM ships codecs for
    * (PNG/JPEG/GIF via javax.imageio — no external library): dimensions +
    * mean 8-bit luma. Non-image payloads return None (callers fall back to
    * [[stubDecode]] — the remaining stub is only for video, the one codec
    * the JVM lacks).
    */
  def decodeImage(id: Long, payload: Array[Byte]): Option[ImageFeatures] =
    decodeBuffered(payload).flatMap { case (fmt, i) =>
      scala.util.Try {
        var sum = 0.0
        var y = 0
        while (y < i.getHeight) {
          var x = 0
          while (x < i.getWidth) {
            val rgb = i.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        ImageFeatures(id, fmt, i.getWidth, i.getHeight,
          sum / (i.getWidth.toLong * i.getHeight))
      }.toOption
    }

  /** Partition-batched REAL image decode — same mapPartitions plumbing as
    * [[decodeFeatures]]; rows whose payload is not a decodable image are
    * dropped (filter-then-decode is the production shape: sniff is cheap,
    * the codec only runs on matching containers).
    */
  def decodeImages(df: DataFrame, idCol: String): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    // codec decode is exactly the per-row-dominant work fanOut exists for:
    // a single-row-group corpus would otherwise decode serially on one core
    graft.Core.fanOut(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) => decodeImage(id, payload) })
  }

  /** Decoded-audio record: container facts + signal RMS from a real codec. */
  final case class AudioFeatures(id: Long, format: String, sampleRate: Double,
                                 channels: Int, nFrames: Long,
                                 durationS: Double, rms: Double)

  /** Container sniff for the audio formats the JVM decodes natively
    * (WAV = RIFF….WAVE, AIFF/AIFC = FORM….AIF?, AU = .snd).
    */
  def sniffAudioFormat(payload: Array[Byte]): Option[String] = {
    def ascii(off: Int, s: String): Boolean =
      payload.length >= off + s.length &&
        s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("audio/wav")
    else if (ascii(0, "FORM") && (ascii(8, "AIFF") || ascii(8, "AIFC"))) Some("audio/aiff")
    else if (ascii(0, ".snd")) Some("audio/basic")
    else None
  }

  /** REAL audio decode for the containers the JVM ships codecs for
    * (WAV/AIFF/AU via javax.sound.sampled — no external library): sample
    * rate, channel count, frame count, duration, and full-signal RMS on the
    * [-1, 1] scale (8/16-bit PCM, both endiannesses, signed or unsigned —
    * what the JVM's WAV/AIFF readers emit). Corrupt or truncated payloads
    * that pass the magic sniff drop the row, not the job, exactly like
    * [[decodeImage]].
    */
  def decodeAudio(id: Long, payload: Array[Byte]): Option[AudioFeatures] =
    decodeAudioImpl(id, payload, keepSamples = false).map(_._1)

  /** Full decode: aggregate features PLUS the normalized [-1, 1] sample
    * array (channel-interleaved) — the input [[audioFingerprint64]] hashes.
    */
  def decodeAudioSamples(id: Long,
                         payload: Array[Byte]): Option[(AudioFeatures, Array[Double])] =
    decodeAudioImpl(id, payload, keepSamples = true)

  /** One streaming decode core: features are always computed with O(1)
    * extra memory; the sample array (4-8x the payload size) is allocated
    * ONLY when the caller needs it — features-only decode over a large
    * corpus must not materialize-and-discard every clip.
    */
  private def decodeAudioImpl(id: Long, payload: Array[Byte],
                              keepSamples: Boolean): Option[(AudioFeatures, Array[Double])] =
    sniffAudioFormat(payload).flatMap { fmt =>
      scala.util.Try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          val enc = f.getEncoding
          val bits = f.getSampleSizeInBits
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          require((signed || unsigned) && (bits == 8 || bits == 16),
            s"unsupported PCM shape: $enc/$bits-bit")
          val bytes = ais.readAllBytes()
          val step = bits / 8
          val samples =
            if (keepSamples) new Array[Double](bytes.length / step) else null
          var sumSq = 0.0
          var n = 0
          var i = 0
          while (i + step <= bytes.length) {
            val raw =
              if (bits == 8) {
                if (signed) bytes(i).toDouble else (bytes(i) & 0xff) - 128.0
              } else {
                val u =
                  if (f.isBigEndian) ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
                  else ((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)
                // unsigned 16-bit centers at 0x8000, not two's complement —
                // decoding it as signed would report full-scale RMS for silence
                if (signed) u.toShort.toDouble else u - 32768.0
              }
            val s = raw / (if (bits == 8) 128.0 else 32768.0)
            if (keepSamples) samples(n) = s
            sumSq += s * s
            n += 1
            i += step
          }
          val frames = ais.getFrameLength
          (AudioFeatures(id, fmt, f.getSampleRate.toDouble, f.getChannels,
            frames, frames / f.getFrameRate.toDouble,
            if (n > 0) math.sqrt(sumSq / n) else 0.0),
           if (keepSamples) samples else Array.emptyDoubleArray)
        } finally ais.close()
      }.toOption
    }

  /** Partition-batched REAL audio decode — same mapPartitions plumbing (and
    * the same [[graft.Core.fanOut]] floor) as [[decodeImages]]; rows whose
    * payload is not decodable audio are dropped.
    */
  def decodeAudios(df: DataFrame, idCol: String): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Core.fanOut(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) => decodeAudio(id, payload) })
  }

  /** 64-bit average-hash perceptual fingerprint of a decoded image: luma
    * stride-sampled to an 8x8 grid, each cell 1 iff above the grid mean.
    * Near-identical images (recompression, mild noise, small crops) land
    * within a few bits; unrelated images differ in ~32. The image analogue
    * of [[graft.llm.Dedup.simhash16]].
    */
  def phash64(img: java.awt.image.BufferedImage): Long = {
    val cells = new Array[Double](64)
    val w = img.getWidth
    val h = img.getHeight
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        // mean luma over the cell's pixel block (stride-free exact mean so
        // the hash is deterministic across JVMs — no Graphics2D scaler)
        val x0 = gx * w / 8; val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
        val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        cells(gy * 8 + gx) = sum / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    val mean = cells.sum / 64
    cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > mean) acc | (1L << i) else acc
    }
  }

  final case class ImageHash(id: Long, phash: Long)

  /** Partition-batched decode → perceptual hash (same plumbing and fanOut
    * floor as [[decodeImages]]); undecodable payloads drop.
    */
  def imageHashes(df: DataFrame, idCol: String): Dataset[ImageHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Core.fanOut(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        // Try around the pixel loop too: a corrupt-but-readable image can
        // throw mid-getRGB — drop the row, never the job (decodeImage's rule)
        decodeBuffered(payload).flatMap { case (_, img) =>
          scala.util.Try(ImageHash(id, phash64(img))).toOption
        }
      })
  }

  /** Near-dup pairs over any 64-bit perceptual hash column: candidates
    * from 16-bit hash BANDS (two hashes within `maxHamming` ≤ 3 bits always
    * share at least one intact band by pigeonhole at 4 bands), exact
    * Hamming verify on candidates only — never an all-pairs comparison,
    * the same LSH-banding discipline as the minhash dedup. Returns
    * (id_a, id_b, hamming) with id_a < id_b.
    *
    * Hot (band, key) buckets are capped at `maxBucket` members, mirroring
    * [[Dedup.jaccardPairs]]'s maxDf guard: DEGENERATE hashes are common, not
    * pathological — every flat/solid image and every silent/steady-tone clip
    * hashes to 0 ([[phash64]]/[[audioFingerprint64]] set a bit only above the
    * cell mean / envelope median, which a constant signal never exceeds), so
    * all such rows share all four band keys and the band self-join would go
    * QUADRATIC in their count. Over-populated buckets are dropped from the
    * candidate stage instead; the recall consequence is that members of a
    * bucket past the cap (degenerate media, or > maxBucket exact copies of
    * one hash) report no pairs here — route those through exact dedup
    * ([[Dedup]] on the payload digest), where identical content belongs.
    */
  def nearDupByHash64(hashes: DataFrame, hashCol: String,
                      maxHamming: Int, idCol: String = "id",
                      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming < 4, "4 x 16-bit bands guarantee recall only for hamming <= 3")
    // materialize before the self-join: both sides share the upstream
    // decode+hash lineage, which Spark would otherwise execute TWICE —
    // the same trap Dedup's candidate subtree documents (measured +50%)
    val mat = hashes.localCheckpoint()
    // the cap is a count window PARTITIONED BY the band key: its exchange is
    // exactly the hash distribution the self-join needs next (same move as
    // Dedup.jaccardPairs' df cap riding the inverted-index shuffle)
    val banded = mat.select(col(idCol).as("id"), col(hashCol).as("h"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col(hashCol), i * 16).bitwiseAND(0xffff).as("key"))): _*)).as("b"))
      .select(col("id"), col("h"), col("b.band"), col("b.key"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("key"))))
      .filter(col("__n") <= maxBucket).drop("__n")
    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.h").as("ha"), col("r.h").as("hb"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Image near-dup pairs by [[phash64]] (see [[nearDupByHash64]], including
    * the `maxBucket` hot-bucket cap and its recall trade for degenerate /
    * massively-duplicated hashes — exposed here so wrapper callers can
    * raise it rather than silently losing the most-duplicated clusters).
    */
  def nearDupImages(hashes: DataFrame, maxHamming: Int = 3,
                    maxBucket: Int = 1000): DataFrame =
    nearDupByHash64(hashes, "phash", maxHamming, maxBucket = maxBucket)

  /** 64-bit audio fingerprint: the signal's RMS ENVELOPE over 64 equal
    * windows, bit i set iff window i's RMS exceeds the envelope median —
    * robust to mild noise/requantization, sensitive to rhythm/amplitude
    * structure. (Flat-envelope signals — steady tones, silence — hash
    * degenerately; envelope structure is the feature, as with any
    * energy-based fingerprint.)
    */
  def audioFingerprint64(samples: Array[Double]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val rms = Array.tabulate(64) { w =>
      // Long window math: w*n overflows Int past ~34M samples (minutes of
      // 44.1 kHz audio) and a negative index would fail the whole task
      val a = (w.toLong * n / 64).toInt
      val b = math.max(a + 1, math.min(n, ((w + 1).toLong * n / 64).toInt))
      var s = 0.0
      var i = a
      while (i < b) { s += samples(i) * samples(i); i += 1 }
      math.sqrt(s / (b - a))
    }
    val median = rms.sorted.apply(32)
    rms.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > median) acc | (1L << i) else acc
    }
  }

  final case class AudioHash(id: Long, afp: Long)

  /** Partition-batched decode → audio fingerprint (same plumbing and
    * fanOut floor as [[decodeAudios]]); undecodable payloads drop.
    */
  def audioHashes(df: DataFrame, idCol: String): Dataset[AudioHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Core.fanOut(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeAudioSamples(id, payload).map { case (_, samples) =>
          AudioHash(id, audioFingerprint64(samples))
        }
      })
  }

  /** Audio near-dup pairs by [[audioFingerprint64]] (see [[nearDupByHash64]];
    * `maxBucket` exposed as in [[nearDupImages]]).
    */
  def nearDupAudio(hashes: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 1000): DataFrame =
    nearDupByHash64(hashes, "afp", maxHamming, maxBucket = maxBucket)

  /** Attach a binary payload + typed metadata struct to a text corpus
    * (here the payload is the UTF-8 content itself; in production it is the
    * image/audio blob read from object storage).
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(col(textCol)).as("n_bytes"),
        lit("text/plain").as("mime"),
        lit(1).as("version")).as("media_meta"))

  /** STUB for media the JVM has no codec for (video — images and audio now
    * decode for real via [[decodeImage]]/[[decodeAudio]]). Deterministic
    * fake: checksum = byte sum, head = first 8 bytes. A real implementation
    * would call the codec here — one call per item, batched per partition,
    * nothing else changes.
    */
  def stubDecode(id: Long, payload: Array[Byte]): MediaFeatures = {
    // ??? <- real decoder (libjpeg/ffmpeg/...) goes here; stubbed:
    val checksum = payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    MediaFeatures(id, payload.length, "text/plain", checksum,
      payload.take(8))
  }

  /** Partition-batched decode: the Spark-side plumbing for expensive per-item
    * decoders — `mapPartitions` so codec/context initialization amortizes over
    * the whole batch (the Scala analogue of a pandas-batch UDF). Input stays
    * partitioned; no shuffle, no driver round-trip.
    */
  def decodeFeatures(df: DataFrame, idCol: String): Dataset[MediaFeatures] =
    decodeFeaturesWith(df, idCol)(() => (id, payload) => Some(stubDecode(id, payload)))

  /** The same plumbing with an INJECTABLE codec. `mkCodec` runs exactly once
    * per partition — the decoder/context init that motivates mapPartitions
    * over a per-row UDF — and a codec returning None drops that row without
    * failing the job (the image/audio decoders' corrupt-payload rule). This
    * is the seam a real video codec would plug into; the fake-codec spec in
    * LlmSpec drives the whole path (per-partition init count, drop-the-row,
    * batch shape) without one existing on the JVM.
    */
  def decodeFeaturesWith(df: DataFrame, idCol: String)
      (mkCodec: () => (Long, Array[Byte]) => Option[MediaFeatures]): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Core.fanOut(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val codec = mkCodec() // per-partition decoder/context init
        batch.flatMap { case (id, payload) => codec(id, payload) }
      }
  }

  final case class ResizedMedia(id: Long, w: Int, h: Int, pixels: Array[Byte])

  /** STUB for a real image scaler: treat the payload as a w0×h0 byte raster
    * and nearest-neighbor stride-sample it to w×h. Deterministic; a real
    * implementation swaps the sampling loop for the codec's scaler and
    * nothing else changes (same signature, same batching).
    */
  def resizeStub(payload: Array[Byte], w0: Int, h0: Int, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      // ??? <- real scaler (libjpeg/swscale/...) goes here; stubbed:
      val idx = (i / w) * h0 / h * w0 + (i % w) * w0 / w
      if (idx < payload.length) payload(idx) else 0
    }

  /** Partition-batched resize — the same mapPartitions plumbing as
    * [[decodeFeatures]]: per-partition scaler init, no shuffle, input stays
    * partitioned.
    */
  def resizeFeatures(df: DataFrame, idCol: String, w0: Int, h0: Int,
                     w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Core.fanOut(df).select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        ResizedMedia(id, w, h, resizeStub(payload, w0, h0, w, h))
      })
  }

  /** Audio-style overlapped window sampling as pure column expressions:
    * fixed `size` windows every `stride` positions (short payloads yield the
    * single truncated window). Engine-mirrorable — no UDF, no shuffle.
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   size: Int = 64, stride: Int = 48): DataFrame = {
    val text = col(textCol)
    val n = length(text)
    val starts = when(n >= size,
        sequence(lit(1), n - (size - 1), lit(stride)))
      .otherwise(array(lit(1)))
    // the chunk array stages into its own projection (the Dedup.shingles
    // lambda rule): three consumers of an inlined transform would build
    // the window array three times per row
    val chunks = transform(starts, s => text.substr(s, lit(size)))
    df.select(col(idCol), chunks.as("__chunks"))
      .select(col(idCol),
        org.apache.spark.sql.functions.size(col("__chunks")).as("n_chunks"),
        element_at(col("__chunks"), 1).as("chunk_first"),
        element_at(col("__chunks"), -1).as("chunk_last"))
  }

  /** Frame-sampling stub as pure column expressions (start / middle / end
    * windows of the payload) — the shape of thumbnail/frame extraction,
    * engine-mirrorable for the oracle.
    */
  def frameSamples(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val n = length(text)
    df.select(
      col(idCol),
      n.as("n_bytes"),
      md5(text).as("content_hash"),
      substring(text, 1, 8).as("frame_head"),
      // `div` (not cast-of-/) so the midpoint floors identically across engines
      expr(s"substring($textCol, greatest(1, length($textCol) div 2), 8)").as("frame_mid"),
      expr(s"substring($textCol, greatest(1, length($textCol) - 7), 8)").as("frame_tail"))
  }
}
