package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (LLM-data-pipeline surface): image/audio
  * payloads as opaque `BinaryType` columns with typed metadata, processed
  * in batches via `mapPartitions`.
  *
  * The Spark side — schema, binary column handling, per-partition batch
  * processing, metadata propagation — is real and tested. The GRFT
  * codec here is a STUB (a deterministic 16-byte header + payload
  * standing in for formats whose libraries this environment lacks);
  * the formats the JDK itself ships are decoded FOR REAL in
  * [[MediaCodecQueries]] (PNG via javax.imageio, WAV via
  * javax.sound.sampled) with the identical data-flow contracts, so
  * swapping this stub for any other real decoder is mechanical.
  */
object MultimodalQueries {

  /** Deterministic fake media payload: 16-byte header (magic `GRFT`,
    * width, height, format code) + 256 content bytes. Stands in for real
    * image bytes. All fields are CLOSED-FORM in `doc_id`
    * (`content(i) = (doc_id*31 + i*17 + 7) mod 256`), so the DuckDB
    * oracles re-derive the whole decode → feature → resize chain from
    * `range()` — the stub's "pixels" are synthetic either way, and exact
    * arithmetic buys end-to-end verification of the plumbing.
    */
  private def synthMedia(docId: Long): Array[Byte] = {
    val width = 64 + (docId % 64).toInt * 8
    val height = 64 + ((docId * 7 + 3) % 64).toInt * 4
    val format = (docId % 3).toInt // 0=rgb8, 1=gray8, 2=rgba8
    val header = java.nio.ByteBuffer.allocate(16)
    header.put('G'.toByte).put('R'.toByte).put('F'.toByte).put('T'.toByte)
    header.putInt(width).putInt(height).putInt(format)
    val content = new Array[Byte](256)
    var i = 0
    while (i < content.length) {
      content(i) = ((docId * 31 + i * 17 + 7) % 256).toByte
      i += 1
    }
    header.array() ++ content
  }

  /** Distribute a CPU-bound per-doc payload stage across the cluster:
    * the documents scan is KB-per-row, so `maxPartitionBytes` hands a
    * whole SF's doc ids to a HANDFUL of tasks — and every core but
    * those sits idle through the synth + container-decode work that
    * dominates these queries (measured r14: q_media_wav_decode ran its
    * 500k decodes in ONE task at sf10 — 109 s, 22× the sf1 wall on 10×
    * docs). One explicit exchange of the slim (doc_id, …) projection
    * BEFORE the payload UDF restores decode parallelism at every SF;
    * at real scale the same holds — a CPU-bound decode wants
    * max-parallel distribution regardless of scan granularity.
    */
  private[queries] def decodeParallel(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** The media table: binary payload + typed metadata columns. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    val synth = udf { (docId: Long) => synthMedia(docId) }
    decodeParallel(
      Tables
        .documents(s, dir)
        .select(col("doc_id"), col("source")))
      .select(
        col("doc_id"),
        col("source"),
        synth(col("doc_id")).as("media"),
        lit("image/grft").as("mime"))
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("mean_byte", DoubleType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode: real header parse; "pixel statistics" and the feature
    * vector are deterministic functions of the payload bytes standing in
    * for a real decode → embed step.
    */
  private def decodeStub(docId: Long, media: Array[Byte]): Row = {
    val buf = java.nio.ByteBuffer.wrap(media)
    require(buf.get() == 'G' && buf.get() == 'R' && buf.get() == 'F' && buf.get() == 'T',
      s"bad magic for doc $docId")
    val width = buf.getInt
    val height = buf.getInt
    val format = buf.getInt match {
      case 0 => "rgb8"
      case 1 => "gray8"
      case _ => "rgba8"
    }
    val content = media.drop(16)
    val mean = content.map(b => (b & 0xff).toDouble).sum / content.length
    // exact dyadic (n/1024): float32 and double representations are both
    // exact, so the oracle's double arithmetic matches bit for bit
    val feature = Array.tabulate(8) { i =>
      (content.slice(i * 32, (i + 1) * 32).map(b => (b & 0xff).toLong).sum % 1024L) / 1024.0f
    }
    Row(docId, width, height, format, media.length, mean, feature.toSeq)
  }

  /** Decode + feature-extract in partition batches — the distributed
    * shape real media pipelines use (one decoder instance per partition,
    * rows streamed through it; no per-row setup cost, no shuffle).
    */
  def mediaFeaturesRaw(s: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(s, dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec init, model load)
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  /** Harness-facing projection: the feature vector reduced to a scalar
    * digest (the driver compare can't hash array cells). Downstream
    * consumers use [[mediaFeaturesRaw]] for the full `Array[Float]`.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    mediaFeaturesRaw(s, dir)
      .withColumn(
        "feature_sum",
        round(aggregate(col("feature"), lit(0.0), (a, x) => a + x.cast("double")), 6))
      .drop("feature")

  /** DuckDB oracle for [[mediaFeatures]]: header fields, byte mean
    * (exact: /256), and the dyadic feature digest re-derived from the
    * closed-form payload — the synth → binary → mapPartitions decode →
    * feature chain is hash-checked end to end.
    */
  val mediaFeaturesSql: String =
    """WITH b AS (
         SELECT doc_id, i, ((doc_id*31 + i*17 + 7) % 256) AS v
         FROM documents, range(256) r(i)
       ), agg AS (
         SELECT doc_id, sum(v)/256.0 AS mean_byte FROM b GROUP BY doc_id
       ), sl AS (
         SELECT doc_id, (i // 32) AS k, sum(v) AS s FROM b GROUP BY doc_id, (i // 32)
       ), feat AS (
         SELECT doc_id, round(sum((s % 1024)/1024.0), 6) AS feature_sum
         FROM sl GROUP BY doc_id
       )
       SELECT d.doc_id,
              (64 + (d.doc_id % 64)*8)::INT AS width,
              (64 + ((d.doc_id*7 + 3) % 64)*4)::INT AS height,
              CASE (d.doc_id % 3) WHEN 0 THEN 'rgb8' WHEN 1 THEN 'gray8'
                ELSE 'rgba8' END AS format,
              272::INT AS n_bytes, a.mean_byte, f.feature_sum
       FROM documents d JOIN agg a USING (doc_id) JOIN feat f USING (doc_id)"""

  /** STUB frame-sample: the payload is treated as a rolled "video" — the
    * 16-byte header followed by fixed 32-byte frames; every `stride`-th
    * frame becomes its own output row. This is the one-binary-to-
    * many-rows shape real video pipelines use: the decoder iterates
    * INSIDE one partition pass (one decoder instance per partition, rows
    * streamed through it), the row explosion happens executor-side, and
    * the per-frame schema is typed. A real codec replaces the fixed
    * split; every Spark contract stays identical.
    */
  def mediaFrameSample(s: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_index", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("mean_byte", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    val frameBytes = 32
    mediaTable(s, dir)
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val docId = r.getLong(0)
          val body = r.getAs[Array[Byte]](1).drop(16)
          val nFrames = body.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            var sum = 0.0
            var i = f * frameBytes
            while (i < (f + 1) * frameBytes) { sum += (body(i) & 0xff); i += 1 }
            Row(docId, f, nFrames, sum / frameBytes)
          }
        }
      }(enc)
  }

  /** DuckDB oracle for [[mediaFrameSample]]: every 4th 32-byte frame's
    * exact mean (/32) from the closed-form payload.
    */
  val mediaFrameSampleSql: String =
    """WITH b AS (
         SELECT doc_id, i, ((doc_id*31 + i*17 + 7) % 256) AS v
         FROM documents, range(256) r(i)
       ), fr AS (
         SELECT doc_id, (i // 32) AS f, sum(v) AS s
         FROM b GROUP BY doc_id, (i // 32)
       )
       SELECT doc_id, f::INT AS frame_index, 8::INT AS n_frames,
              s/32.0 AS mean_byte
       FROM fr WHERE f % 4 = 0"""

  /** 56-bit perceptual dHash of the media payload, computed the way a
    * real image pipeline would: bytes → downsample → gradient bits. The
    * 256 content bytes are read as a 16×16 grid, averaged into 8×8
    * blocks (kept as integer 2×2-block SUMS — no division, so every
    * step is exact in both engines), then hashed as the classic dHash
    * row-gradient: bit(r,j) = block(r,j) < block(r,j+1), 7 comparisons
    * × 8 rows = 56 bits (fits a positive BIGINT in the oracle).
    *
    * Because the synthetic payload is closed-form in doc_id mod 256,
    * payload-identical documents exist but byte-level *near*-dups do
    * not — so, as with the PII fixture, a deterministic "re-encode"
    * perturbation nudges one byte (position and delta shift with
    * doc_id ÷ 256) before hashing: payload-equal pairs become hamming
    * 0–4 apart, exercising the near-dup path, and the oracle re-derives
    * the identical variant.
    */
  private[graft] def dhash56(docId: Long, media: Array[Byte]): Long = {
    val content = new Array[Int](256)
    var i = 0
    while (i < 256) { content(i) = media(16 + i) & 0xff; i += 1 }
    val pos = (docId * 13 + docId / 256) % 256
    val delta = (docId / 3) % 251
    content(pos.toInt) = ((content(pos.toInt) + delta) % 256).toInt
    def block(r: Int, j: Int): Int =
      content(2 * r * 16 + 2 * j) + content(2 * r * 16 + 2 * j + 1) +
        content((2 * r + 1) * 16 + 2 * j) + content((2 * r + 1) * 16 + 2 * j + 1)
    var hash = 0L
    var r = 0
    while (r < 8) {
      var j = 0
      while (j < 7) {
        if (block(r, j) < block(r, j + 1)) hash |= 1L << (r * 7 + j)
        j += 1
      }
      r += 1
    }
    hash
  }

  /** Byte-level nearest-neighbor resize of one payload. The 256 content
    * bytes are the pixel buffer — a 16×16 grid standing in for the full
    * `width`×`height` raster (the synthetic fixture stores a fixed-size
    * thumbnail; a real decoder would hand over `width*height` samples,
    * and every step below is side-length-agnostic). The logical resize
    * scales (`width`,`height`) down to fit `maxDim` (aspect preserved,
    * never upscaled); the pixel grid shrinks by the same ratio via
    * classic nearest-neighbor index mapping — `src = (dst * srcSide) /
    * dstSide`, all integer arithmetic, so DuckDB re-derives the output
    * bytes exactly. The result is a fresh payload: re-written header
    * carrying the new dims + the resampled grid.
    */
  private[graft] def resizePayload(media: Array[Byte], maxDim: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.wrap(media)
    require(buf.get() == 'G' && buf.get() == 'R' && buf.get() == 'F' && buf.get() == 'T',
      "bad magic")
    val w = buf.getInt
    val h = buf.getInt
    val fmt = buf.getInt
    val grid = 16 // source pixel-grid side: 256 content bytes
    // IEEE double op order matches the oracle: one divide, one multiply,
    // truncate (positive, so floor ≡ Spark's double→int cast)
    val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
    val outW = (w * scale).toInt
    val outH = (h * scale).toInt
    val gw = math.max(1, grid * outW / w)
    val gh = math.max(1, grid * outH / h)
    val out = java.nio.ByteBuffer.allocate(16 + gh * gw)
    out.put('G'.toByte).put('R'.toByte).put('F'.toByte).put('T'.toByte)
    out.putInt(outW).putInt(outH).putInt(fmt)
    var r = 0
    while (r < gh) {
      val srcR = r * grid / gh
      var c = 0
      while (c < gw) {
        val srcC = c * grid / gw
        out.put(media(16 + srcR * grid + srcC))
        c += 1
      }
      r += 1
    }
    out.array()
  }

  /** Resize as the pipeline runs it: per-partition pass re-encoding each
    * payload (one "codec" per partition, no shuffle), emitting the
    * transformed binary plus old/new dims and integer digests of the
    * output bytes (`byte_sum`, and `wsum` — a position-weighted checksum
    * that pins every byte to its offset, so a permuted or misplaced
    * pixel changes it).
    */
  def mediaResizeRaw(s: SparkSession, dir: String, maxDim: Int = 128): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("out_width", IntegerType),
      StructField("out_height", IntegerType),
      StructField("format", StringType),
      StructField("out_n_bytes", IntegerType),
      StructField("byte_sum", LongType),
      StructField("wsum", LongType),
      StructField("media", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    mediaTable(s, dir)
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { row =>
          val docId = row.getLong(0)
          val media = row.getAs[Array[Byte]](1)
          val in = java.nio.ByteBuffer.wrap(media)
          in.position(4)
          val w = in.getInt
          val h = in.getInt
          val format = in.getInt match {
            case 0 => "rgb8"
            case 1 => "gray8"
            case _ => "rgba8"
          }
          val resized = resizePayload(media, maxDim)
          val outB = java.nio.ByteBuffer.wrap(resized)
          outB.position(4)
          val outW = outB.getInt
          val outH = outB.getInt
          var byteSum = 0L
          var wsum = 0L
          var i = 16
          while (i < resized.length) {
            val v = resized(i) & 0xff
            byteSum += v
            wsum += v.toLong * (i - 16 + 1)
            i += 1
          }
          Row(docId, w, h, outW, outH, format, resized.length, byteSum, wsum, resized)
        }
      }(enc)
  }

  /** Harness-facing projection of [[mediaResizeRaw]] (the driver compare
    * can't hash binary cells): new dims + output-payload digests, all
    * re-derived exactly by the oracle.
    */
  def mediaResize(s: SparkSession, dir: String, maxDim: Int = 128): DataFrame =
    mediaResizeRaw(s, dir, maxDim).drop("media")

  /** Channel mixdown: the payload read as 128 interleaved stereo sample
    * pairs, each pair folded to one mono value — kept as the integer
    * pair SUM (like the dHash block sums: no division, every step exact
    * in both engines). The audio-shaped member of the multimodal family:
    * same per-partition decoder pass as the others, one row per doc
    * with the mixed stream's digest (position-weighted checksum pins
    * every sample to its offset), peak, and exact mean (dyadic /256).
    */
  def mediaMixdown(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_pairs", IntegerType),
      StructField("mix_checksum", LongType),
      StructField("mix_peak", IntegerType),
      StructField("mix_mean", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    mediaTable(s, dir)
      .select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val docId = r.getLong(0)
          val body = r.getAs[Array[Byte]](1).drop(16)
          val nPairs = body.length / 2
          var checksum = 0L
          var peak = 0
          var total = 0L
          var i = 0
          while (i < nPairs) {
            val mono = (body(2 * i) & 0xff) + (body(2 * i + 1) & 0xff)
            checksum += mono.toLong * (i + 1)
            if (mono > peak) peak = mono
            total += mono
            i += 1
          }
          // /256 is dyadic: exact in double on both engines
          Row(docId, nPairs, checksum, peak, total.toDouble / 256.0)
        }
      }(enc)
  }

  /** DuckDB oracle for [[mediaMixdown]]: pair sums regenerated from the
    * closed-form payload, digests over the same positions.
    */
  val mediaMixdownSql: String =
    """WITH p AS (
         SELECT doc_id, i,
                ((doc_id*31 + (2*i)*17 + 7) % 256)
                  + ((doc_id*31 + (2*i+1)*17 + 7) % 256) AS mono
         FROM documents, range(128) r(i)
       )
       SELECT doc_id, 128::INT AS n_pairs,
              sum(mono * (i + 1))::BIGINT AS mix_checksum,
              max(mono)::INT AS mix_peak,
              sum(mono)/256.0 AS mix_mean
       FROM p GROUP BY doc_id"""

  /** DuckDB oracle for [[mediaResize]]: the resampled grid regenerated
    * from the closed-form payload — same IEEE double op order for the
    * dims (one division, one multiply, floor ≡ Spark's positive
    * double→int truncate), same integer nearest-neighbor index map for
    * the bytes, digests summed over the SAME output positions.
    */
  val mediaResizeSql: String =
    """WITH d AS (
         SELECT doc_id,
                (64 + (doc_id % 64)*8)::INT AS width,
                (64 + ((doc_id*7 + 3) % 64)*4)::INT AS height,
                CASE (doc_id % 3) WHEN 0 THEN 'rgb8' WHEN 1 THEN 'gray8'
                  ELSE 'rgba8' END AS format
         FROM documents
       ), s AS (
         SELECT doc_id, width, height, format,
                floor(width * least(1.0, 128.0/greatest(width, height)))::INT AS out_width,
                floor(height * least(1.0, 128.0/greatest(width, height)))::INT AS out_height
         FROM d
       ), g AS (
         SELECT *,
                greatest(1, (16*out_width)//width) AS gw,
                greatest(1, (16*out_height)//height) AS gh
         FROM s
       ), px AS (
         SELECT doc_id, gw, gh, rr.r AS r, cc.c AS c,
                ((doc_id*31 + (((rr.r*16)//gh)*16 + ((cc.c*16)//gw))*17 + 7) % 256) AS v
         FROM g, range(16) rr(r), range(16) cc(c)
         WHERE rr.r < gh AND cc.c < gw
       ), dig AS (
         SELECT doc_id,
                sum(v)::BIGINT AS byte_sum,
                sum(v * (r*gw + c + 1))::BIGINT AS wsum
         FROM px GROUP BY doc_id
       )
       SELECT g.doc_id, g.width, g.height, g.out_width, g.out_height, g.format,
              (16 + g.gw*g.gh)::INT AS out_n_bytes, dig.byte_sum, dig.wsum
       FROM g JOIN dig USING (doc_id)"""
}

/** REAL media codec paths over the formats the JDK itself ships — PNG
  * via `javax.imageio` and WAV/PCM via `javax.sound.sampled`. These
  * close the "media codecs are stubbed" gap for the two baseline
  * formats with ZERO external dependencies: the fixture encodes a
  * closed-form raster/sample grid through the REAL encoder, the
  * operator decodes through the REAL decoder in partition batches, and
  * the DuckDB oracle re-derives the expected statistics from the
  * closed form alone — so a broken encoder, decoder, color-channel
  * order, or endianness shows up as a hash mismatch, not a silent
  * pass-through (PNG and WAV/PCM are lossless, so decode∘encode must
  * reproduce the grid exactly).
  */
object MediaCodecQueries {
  import graft.Tables
  import org.apache.spark.sql.functions._

  /** Mod-prime for the position-weighted raster digests (2³¹ − 1). */
  private val P = 2147483647L

  /** ImageIO defaults to a DISK-backed stream cache — a temp file
    * created and deleted per encode/decode call, which dominates the
    * wall for small rasters (measured 1.6× at sf0.1). Flipped off
    * inside the task path (not the driver) so executors on a real
    * cluster get it too; idempotent, so the per-row check is free.
    */
  private def imageIOHeapOnly(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  private[queries] def pngFor(docId: Long): Array[Byte] = {
    imageIOHeapOnly()
    val w = 32 + (docId % 8).toInt * 4
    val h = 24 + ((docId * 3) % 8).toInt * 4
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId + x * 3 + y * 5) % 256).toInt
        val g = ((docId * 2 + x * 7 + y * 11) % 256).toInt
        val b = ((docId * 3 + x * 13 + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG writer in this JDK")
    bos.toByteArray
  }

  /** PNG decode in partition batches: real `ImageIO` decode of real PNG
    * bytes; per-image channel sums (exact longs) and a position-weighted
    * digest over the decoded raster.
    */
  def pngDecode(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType),
      StructField("wdigest", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val synth = udf { (docId: Long) => pngFor(docId) }
    MultimodalQueries.decodeParallel(
      Tables.documents(s, dir).select(col("doc_id")))
      .select(col("doc_id"), synth(col("doc_id")).as("png"))
      .mapPartitions { rows =>
        imageIOHeapOnly()
        rows.map { row =>
          val docId = row.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
          val (w, h) = (img.getWidth, img.getHeight)
          // bulk raster read: one color-model conversion per image, not
          // one per PIXEL (getRGB(x, y) re-enters the color model every
          // call)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var (sr, sg, sb, wd) = (0L, 0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sr += r; sg += g; sb += b
            wd = (wd + (r + 2L * g + 3L * b) * (1L + i)) % P
            i += 1
          }
          Row(docId, w, h, sr, sg, sb, wd)
        }
      }(enc)
  }

  /** DuckDB oracle for [[pngDecode]]: the closed-form raster re-derived
    * with correlated `generate_series` grids — valid because PNG is
    * lossless, so the decoded raster MUST equal the generated one.
    */
  val pngDecodeSql: String =
    s"""WITH d AS (
         SELECT doc_id,
                (32 + (doc_id % 8) * 4)::INT AS w,
                (24 + ((doc_id * 3) % 8) * 4)::INT AS h
         FROM documents
       ), px AS (
         SELECT doc_id, w, h, x, y,
                (doc_id + x * 3 + y * 5) % 256 AS r,
                (doc_id * 2 + x * 7 + y * 11) % 256 AS g,
                (doc_id * 3 + x * 13 + y) % 256 AS b
         FROM d,
              unnest(generate_series(0, w - 1)) gx(x),
              unnest(generate_series(0, h - 1)) gy(y)
       )
       SELECT doc_id, max(w) AS width, max(h) AS height,
              CAST(sum(r) AS BIGINT) AS sum_r,
              CAST(sum(g) AS BIGINT) AS sum_g,
              CAST(sum(b) AS BIGINT) AS sum_b,
              CAST(sum((r + 2 * g + 3 * b) * (1 + x + y * w)) % $P AS BIGINT) AS wdigest
       FROM px GROUP BY 1"""

  private val WavSamples = 256
  private val WavRate = 8000f

  /** Cached `javax.sound.sampled.spi` providers, materialized ONCE per
    * JVM. Every `AudioSystem.write`/`getAudioInputStream` call goes
    * through the JDK's `JDK13Services.getProviders` — a STATIC
    * SYNCHRONIZED provider lookup — so under 32 decode tasks the whole
    * stage convoys on one global lock: measured r14 at sf10, the
    * repartition fix that gave PNG its 4× did NOTHING for WAV (≈107 s
    * before and after; per-doc cost 2× its single-thread wall — the
    * signature of a lock convoy). Resolving the providers once through
    * the public SPI and running the same try-each-reader loop
    * `AudioSystem` runs keeps behavior identical and makes the stage
    * actually parallel (sf10: 106.7 → measured below in SCALE.md).
    */
  private lazy val wavReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
  }
  private lazy val wavWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toList
      .filter(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }

  /** The WAVE-capable reader, resolved ONCE per JVM against a fixed
    * canonical WAVE probe (like `wavWriters` filters on file type —
    * `AudioFileReader` has no `isFileTypeSupported`, so the probe is
    * the filter). Resolution is order-INDEPENDENT: the winner depends
    * only on the fixed probe bytes, never on prior workload inputs —
    * the r14 mutable last-successful-reader cache could, in principle,
    * pick different lenient readers for the same bytes depending on
    * what was decoded earlier (ADVICE r14). The workload is WAVE-only;
    * bytes the resolved reader rejects fall back to the JDK's own
    * fixed provider order below.
    */
  private lazy val waveReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    val probe = wavFor(0L)
    wavReaders.find { r =>
      try {
        r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
        true
      } catch { case _: Exception => false }
    }
  }

  /** `AudioSystem.getAudioInputStream` minus the global provider lock:
    * the pre-resolved WAVE reader is tried first (the jstack of the
    * first fix attempt showed all 32 tasks still convoyed — the
    * fixed-order loop reached `SoftMidiAudioFileReader` before the
    * WAVE reader, and that reader's REJECTION path itself takes the
    * same global `JSSecurityManager` lock, `MidiSystem.getSequence` →
    * `JDK13Services.getProviders`); non-WAVE bytes fall back to the
    * JDK's own fixed provider order, so acceptance matches
    * `AudioSystem.java`'s loop deterministically.
    */
  private[queries] def readWav(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    waveReader.foreach { r =>
      try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    val it = wavReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (!waveReader.contains(r)) {
        try return r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no cached provider accepted the stream")
  }

  private[queries] def wavFor(docId: Long): Array[Byte] = {
    val pcm = new Array[Byte](WavSamples * 2)
    var i = 0
    while (i < WavSamples) {
      val v = (((docId * 37 + i.toLong * 91) % 65536) - 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(WavRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, WavSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    // cached SPI writer — AudioSystem.write pays the global provider
    // lock per call (see wavReaders)
    wavWriters.head.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAV decode in partition batches: real `AudioSystem` container parse
    * of real WAVE bytes; per-clip exact sample statistics (sum, min,
    * max, zero crossings).
    */
  def wavDecode(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType),
      StructField("sum_samples", LongType),
      StructField("min_sample", IntegerType),
      StructField("max_sample", IntegerType),
      StructField("zero_crossings", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val synth = udf { (docId: Long) => wavFor(docId) }
    MultimodalQueries.decodeParallel(
      Tables.documents(s, dir).select(col("doc_id")))
      .select(col("doc_id"), synth(col("doc_id")).as("wav"))
      .mapPartitions { rows =>
        rows.map { row =>
          val docId = row.getLong(0)
          val ais = MediaCodecQueries.readWav(row.getAs[Array[Byte]](1))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"unexpected decoded format $fmt")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var (sum, zc) = (0L, 0L)
          var (mn, mx) = (Int.MaxValue, Int.MinValue)
          var prev = 0
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            if (i > 0 && ((v >= 0) != (prev >= 0))) zc += 1
            prev = v
            i += 1
          }
          Row(docId, n.toLong, sum, mn, mx, zc)
        }
      }(enc)
  }

  /** DuckDB oracle for [[wavDecode]]: the closed-form PCM samples
    * re-derived; zero crossings via a per-doc lag window over the
    * bounded 256-sample grid.
    */
  val wavDecodeSql: String =
    s"""WITH s AS (
         SELECT doc_id, i,
                ((doc_id * 37 + i * 91) % 65536) - 32768 AS v
         FROM documents, unnest(generate_series(0, ${WavSamples - 1})) g(i)
       ), f AS (
         SELECT doc_id, i, v,
                lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         FROM s
       )
       SELECT doc_id,
              count(*) AS n_samples,
              CAST(sum(v) AS BIGINT) AS sum_samples,
              CAST(min(v) AS INT) AS min_sample,
              CAST(max(v) AS INT) AS max_sample,
              CAST(sum(CASE WHEN pv IS NOT NULL
                             AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END) AS BIGINT)
                AS zero_crossings
       FROM f GROUP BY 1"""
}
