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
  * processing, metadata propagation — is real and tested. The actual
  * media codecs are STUBBED (no image/audio libraries in this
  * environment): `decodeStub` parses the deterministic 16-byte header
  * (magic, width, height, format) that the fixture synthesiser writes and
  * derives "pixel statistics" from the payload bytes. Swapping the stub
  * body for a real decoder keeps every data-flow contract identical.
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

  /** The media table: binary payload + typed metadata columns. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    val synth = udf { (docId: Long) => synthMedia(docId) }
    Tables
      .documents(s, dir)
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

  /** STUB resize: metadata-level transform demonstrating payload-preserving
    * column surgery (a real implementation re-encodes `media`).
    */
  def mediaResize(s: SparkSession, dir: String, maxDim: Int = 128): DataFrame =
    mediaFeatures(s, dir)
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .select(
        col("doc_id"),
        col("width"),
        col("height"),
        (col("width") * col("scale")).cast("int").as("out_width"),
        (col("height") * col("scale")).cast("int").as("out_height"),
        col("format"))

  /** DuckDB oracle for [[mediaResize]]: identical IEEE double op order
    * (one division, one multiply, floor — Spark's double→int cast
    * truncates, so the SQL floors explicitly).
    */
  val mediaResizeSql: String =
    """WITH d AS (
         SELECT doc_id,
                (64 + (doc_id % 64)*8)::INT AS width,
                (64 + ((doc_id*7 + 3) % 64)*4)::INT AS height,
                CASE (doc_id % 3) WHEN 0 THEN 'rgb8' WHEN 1 THEN 'gray8'
                  ELSE 'rgba8' END AS format
         FROM documents
       )
       SELECT doc_id, width, height,
              floor(width * least(1.0, 128.0/greatest(width, height)))::INT AS out_width,
              floor(height * least(1.0, 128.0/greatest(width, height)))::INT AS out_height,
              format
       FROM d"""
}
