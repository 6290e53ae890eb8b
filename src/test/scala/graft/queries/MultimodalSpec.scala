package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts of the multimodal surface. Cross-engine values
  * are checked by the DuckDB oracles (q_media_features / q_media_resize /
  * q_media_frame_sample); these lock the payload bytes themselves —
  * the part no column-digest compare can see.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("multimodal-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private def payloads: Map[Long, Array[Byte]] =
    MultimodalQueries
      .mediaTable(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media"))
      .toMap

  /** Independent nearest-neighbor reference: recomputes the expected
    * output payload from the source payload with its own arithmetic
    * (header re-read, per-pixel map), not by calling the operator.
    */
  private def expectedResize(media: Array[Byte], maxDim: Int): Array[Byte] = {
    val in = java.nio.ByteBuffer.wrap(media)
    in.position(4)
    val w = in.getInt
    val h = in.getInt
    val fmt = in.getInt
    val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
    val outW = (w * scale).toInt
    val outH = (h * scale).toInt
    val gw = math.max(1, 16 * outW / w)
    val gh = math.max(1, 16 * outH / h)
    val content =
      for (r <- 0 until gh; c <- 0 until gw)
        yield media(16 + (r * 16 / gh) * 16 + (c * 16 / gw))
    val header = java.nio.ByteBuffer.allocate(16)
    header.put('G'.toByte).put('R'.toByte).put('F'.toByte).put('T'.toByte)
    header.putInt(outW).putInt(outH).putInt(fmt)
    header.array() ++ content
  }

  test("mediaResizeRaw emits the byte-exact nearest-neighbor payload") {
    val src = payloads
    val got = MultimodalQueries
      .mediaResizeRaw(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Array[Byte]]("media"), r.getAs[Int]("out_width"),
          r.getAs[Int]("out_height"), r.getAs[Long]("byte_sum")))
      .toMap
    assert(got.keySet === src.keySet)
    got.foreach { case (docId, (media, outW, outH, byteSum)) =>
      val expected = expectedResize(src(docId), 128)
      assert(media.toSeq === expected.toSeq, s"doc $docId payload bytes differ")
      // header round-trips the new dims
      val buf = java.nio.ByteBuffer.wrap(media)
      buf.position(4)
      assert(buf.getInt === outW && buf.getInt === outH)
      assert(byteSum === media.drop(16).map(b => (b & 0xff).toLong).sum)
    }
  }

  test("resize is identity for payloads already within maxDim, downscale otherwise") {
    val src = payloads
    val outputs = src.map { case (docId, media) =>
      docId -> MultimodalQueries.resizePayload(media, 128)
    }
    val in = src.map { case (d, m) =>
      val b = java.nio.ByteBuffer.wrap(m); b.position(4); d -> (b.getInt, b.getInt)
    }
    val identity = in.filter { case (_, (w, h)) => math.max(w, h) <= 128 }.keys
    val shrunk = in.filter { case (_, (w, h)) => math.max(w, h) > 128 }.keys
    assert(identity.nonEmpty, "fixture must contain an already-small payload")
    assert(shrunk.nonEmpty, "fixture must contain a payload needing downscale")
    identity.foreach { d =>
      assert(outputs(d).toSeq === src(d).toSeq, s"doc $d: identity resize must not rewrite")
    }
    shrunk.foreach { d =>
      assert(outputs(d).length < src(d).length, s"doc $d: downscale must shrink the payload")
      // every output byte exists somewhere in the source grid (nearest
      // neighbor samples, never interpolates)
      val srcBytes = src(d).drop(16).toSet
      assert(outputs(d).drop(16).forall(srcBytes.contains))
    }
  }

  test("aspect ratio is preserved within integer truncation") {
    MultimodalQueries.mediaResize(spark, dir).collect().foreach { r =>
      val w = r.getAs[Int]("width").toDouble
      val h = r.getAs[Int]("height").toDouble
      val ow = r.getAs[Int]("out_width").toDouble
      val oh = r.getAs[Int]("out_height").toDouble
      assert(ow <= 128 && oh <= 128)
      assert(math.abs(ow / w - oh / h) < 0.02, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
