package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Multimodal binary-column plumbing: schema, batch shape, determinism.
  * The decode itself is a marked stub (no media libs in the image) — what
  * must be REAL is everything these tests pin down.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("mediaRecords: payload bytes are exactly the UTF-8 text") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, SparkFixture.sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val recs = Multimodal.mediaRecords(spark, SparkFixture.sfDir).collect()
    assert(recs.nonEmpty)
    recs.take(20).foreach { r =>
      assert(r.payload.toSeq == docs(r.media_id).getBytes("UTF-8").toSeq)
      assert(r.kind == "text/plain")
    }
  }

  test("decodeFeatures: typed output schema, one row per record, exact checksum") {
    val recs = Multimodal.mediaRecords(spark, SparkFixture.sfDir)
    val feats = Multimodal.decodeFeatures(recs)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "nbytes", "width", "height", "checksum"))
    val n = recs.count()
    assert(feats.count() == n)
    val byId = recs.collect().map(r => r.media_id -> r.payload).toMap
    feats.collect().take(20).foreach { f =>
      val payload = byId(f.media_id)
      assert(f.nbytes == payload.length.toLong)
      assert(f.checksum == payload.map(b => (b & 0xff).toLong).sum)
      assert(f.width >= 64 && f.width < 128 && f.height >= 64 && f.height < 128)
    }
  }

  test("decode stub is deterministic") {
    val p = "some payload bytes".getBytes("UTF-8")
    assert(Multimodal.MediaCodec.decodeStub(p) == Multimodal.MediaCodec.decodeStub(p))
    assert(Multimodal.MediaCodec.checksum(p) == p.map(b => (b & 0xff).toLong).sum)
  }

  test("decode runs per-partition (no driver-side collect in the path)") {
    // repartition to many partitions; mapPartitions must preserve rows
    val recs = Multimodal.mediaRecords(spark, SparkFixture.sfDir).repartition(7)
    assert(Multimodal.decodeFeatures(recs).count() == recs.count())
  }

  test("resizeAll: deterministic byte subsample with the target sizing") {
    val recs = Multimodal.mediaRecords(spark, SparkFixture.sfDir)
    val resized = Multimodal.resizeAll(recs, 64, 64)
    assert(resized.count() == recs.count())
    val a = resized.collect().sortBy(_.media_id).take(5).map(_.payload.toSeq)
    val b = Multimodal.resizeAll(recs, 64, 64).collect().sortBy(_.media_id).take(5).map(_.payload.toSeq)
    assert(a.toSeq == b.toSeq, "resize stub not deterministic")
    resized.collect().foreach(r => assert(r.payload.length <= 64 * 64 / 64))
  }

  test("sampleFramesAll: every n-th fixed-size frame with correct offsets") {
    import spark.implicits._
    val payload = Array.tabulate(100)(_.toByte)
    val one = Seq(Multimodal.MediaRecord(7L, "video/fake", payload)).toDS()
    val frames = Multimodal.sampleFramesAll(one, frameSize = 10, everyN = 3).collect()
      .sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 3, 6, 9))
    frames.foreach { f =>
      assert(f.offset == f.frame_no.toLong * 10)
      assert(f.frame.toSeq == payload.slice(f.offset.toInt, f.offset.toInt + 10).toSeq)
    }
  }

  test("chunkAudioAll: overlapping windows share exactly window−hop bytes; short payload vanishes") {
    import spark.implicits._
    val payload = Array.tabulate(100)(_.toByte)
    val ds = Seq(
      Multimodal.MediaRecord(1L, "audio/fake", payload),
      Multimodal.MediaRecord(2L, "audio/fake", payload.take(20)) // < one window
    ).toDS()
    val chunks = Multimodal.chunkAudioAll(ds, window = 40, hop = 25).collect()
      .sortBy(c => (c.media_id, c.chunk_no))
    // payload 100, window 40, hop 25 → starts 0, 25, 50 (75+40 > 100)
    assert(chunks.map(c => (c.media_id, c.chunk_no, c.start_byte)).toSeq ==
      Seq((1L, 0, 0L), (1L, 1, 25L), (1L, 2, 50L)))
    chunks.foreach { c =>
      assert(c.chunk.toSeq ==
        payload.slice(c.start_byte.toInt, c.start_byte.toInt + 40).toSeq)
    }
    // consecutive chunks overlap by window − hop = 15 identical bytes
    val overlap = chunks(0).chunk.takeRight(15).toSeq
    assert(overlap == chunks(1).chunk.take(15).toSeq)
  }

  test("MediaSniff: real magic rules — positives, truncations, and liars") {
    import Multimodal.MediaSniff._
    assert(sniff(JpegMagic ++ "body".getBytes) == "jpeg")
    assert(sniff(PngMagic ++ Array[Byte](1, 2, 3)) == "png")
    assert(sniff(WavHeader ++ "pcm".getBytes) == "wav")
    // truncated headers must not classify
    assert(sniff(JpegMagic.take(2)) == "unknown")
    assert(sniff(PngMagic.take(7)) == "unknown")
    assert(sniff(WavHeader.take(11)) == "unknown")
    // RIFF container that is NOT WAVE (e.g. AVI) must not classify as wav
    val avi = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "AVI ".getBytes
    assert(sniff(avi) == "unknown")
    // a stale/garbage RIFF size field must not matter
    val staleSize = "RIFF".getBytes ++ Array[Byte](-1, -1, -1, -1) ++ "WAVE".getBytes
    assert(sniff(staleSize) == "wav")
    assert(sniff(Array.empty[Byte]) == "unknown")
    // headerFor covers all three containers and sniffs back to the rule
    (0L to 5L).foreach { id =>
      val expect = Seq("jpeg", "png", "wav")((id % 3).toInt)
      assert(sniff(headerFor(id) ++ "x".getBytes) == expect)
    }
  }

  test("WavCodec: parse(build) roundtrips, unknown chunks skip, malformed throws") {
    import Multimodal.WavCodec
    val pcm = "0123456789abcdef".getBytes("ISO-8859-1")
    val m = WavCodec.parse(WavCodec.build(16000, 2, 16, pcm))
    assert(m.rate == 16000 && m.channels == 2 && m.bits == 16)
    assert(m.byteRate == 16000L * 2 * 2 && m.dataBytes == pcm.length.toLong)
    // exact integer microseconds: 16 bytes / 64000 B/s = 250 µs
    assert(m.durationUs == pcm.length * 1000000L / 64000L)
    // an unknown LIST chunk between fmt and data is legal RIFF — skipped,
    // including the odd-size word-alignment pad
    val built = WavCodec.build(8000, 1, 16, pcm)
    val (head, rest) = built.splitAt(36) // through fmt; "data" starts at 36
    val list = "LIST".getBytes("ISO-8859-1") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("ISO-8859-1") ++ Array[Byte](0)
    val withList = head ++ list ++ rest
    val m2 = WavCodec.parse(withList)
    assert(m2.rate == 8000 && m2.dataBytes == pcm.length.toLong)
    // malformed inputs throw loudly, never guess
    intercept[IllegalArgumentException](WavCodec.parse("RIFFxxxxAVI ".getBytes("ISO-8859-1")))
    intercept[IllegalArgumentException](
      WavCodec.parse("RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes))
    intercept[IllegalArgumentException](WavCodec.parse(Array.empty[Byte]))
  }

  test("GifCodec: parse(build) roundtrips both versions, sub-blocks sum, malformed throws") {
    import Multimodal.GifCodec
    val payload = ("fox " * 200).getBytes("UTF-8") // 800 bytes → 4 sub-blocks
    val m = GifCodec.parse(GifCodec.build(version89 = true, 320, 200, 5, payload))
    assert(m.version89 && m.width == 320 && m.height == 200)
    assert(m.gctEntries == 64, s"2^(5+1) expected, got ${m.gctEntries}")
    assert(m.dataBytes == payload.length.toLong, "sub-block lengths must sum to the payload")
    // 87a variant and the empty-payload edge (zero sub-blocks)
    val m87 = GifCodec.parse(GifCodec.build(version89 = false, 1, 1, 0, Array.empty))
    assert(!m87.version89 && m87.gctEntries == 2 && m87.dataBytes == 0L)
    // loud-throw discipline: bad signature, bad params
    intercept[IllegalArgumentException](GifCodec.parse("NOTGIF".getBytes ++ new Array[Byte](20)))
    intercept[IllegalArgumentException](GifCodec.build(version89 = true, 0, 1, 0, Array.empty))
    intercept[IllegalArgumentException](GifCodec.build(version89 = true, 1, 1, 8, Array.empty))
    // corrupting the image descriptor's width fails the LSD cross-check
    val good = GifCodec.build(version89 = true, 300, 100, 2, payload)
    val gctEnd = 13 + 3 * 8
    val corrupt = good.clone()
    corrupt(gctEnd + 5) = 0x01 // image-descriptor width LSB: 300 → 257
    intercept[IllegalArgumentException](GifCodec.parse(corrupt))
  }

  test("Mp4Codec: parse(build) roundtrips, largesize escape and v1 mvhd parse, malformed throws") {
    import Multimodal.Mp4Codec
    val payload = ("box " * 100).getBytes("UTF-8")
    val m = Mp4Codec.parse(Mp4Codec.build("mp42", 90000L, 123456L, payload))
    assert(m.brand == "mp42" && m.timescale == 90000L && m.duration == 123456L)
    assert(m.mdatBytes == payload.length.toLong && m.nBoxes == 3L)
    // 64-bit largesize escape: append a second mdat encoded as
    // size=1 + u64 largesize; the walk must take the 16-byte header path
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val extra = "tail-bytes".getBytes("UTF-8")
    val large = be32(1L) ++ "mdat".getBytes("ISO-8859-1") ++
      be64(16L + extra.length) ++ extra
    val m2 = Mp4Codec.parse(Mp4Codec.build("isom", 600L, 42L, payload) ++ large)
    assert(m2.mdatBytes == payload.length.toLong + extra.length && m2.nBoxes == 4L)
    // version-1 mvhd (u64 times, timescale at +28, u64 duration at +32)
    val mvhd1body = Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(1000L) ++ be64(5000000000L) ++ new Array[Byte](80)
    val mvhd1 = be32(8L + mvhd1body.length) ++ "mvhd".getBytes("ISO-8859-1") ++ mvhd1body
    val moov1 = be32(8L + mvhd1.length) ++ "moov".getBytes("ISO-8859-1") ++ mvhd1
    val ftyp = be32(16L) ++ "ftyp".getBytes("ISO-8859-1") ++
      "isom".getBytes("ISO-8859-1") ++ be32(0)
    val m3 = Mp4Codec.parse(ftyp ++ moov1)
    assert(m3.timescale == 1000L && m3.duration == 5000000000L,
      "v1 mvhd must read the u64 duration past the 32-bit boundary")
    // unknown top-level boxes (free/skip) are walked past, not fatal
    val free = be32(12L) ++ "free".getBytes("ISO-8859-1") ++ be32(0)
    assert(Mp4Codec.parse(Mp4Codec.build("isom", 600L, 1L, payload) ++ free).nBoxes == 4L)
    // loud-throw discipline
    intercept[IllegalArgumentException](
      Mp4Codec.parse(be32(99999L) ++ "mdat".getBytes("ISO-8859-1"))) // size past end
    intercept[IllegalArgumentException](Mp4Codec.parse(ftyp)) // no mvhd
    intercept[IllegalArgumentException](Mp4Codec.parse(moov1)) // no ftyp
    intercept[IllegalArgumentException](Mp4Codec.build("toolong", 600L, 1L, payload))
  }

  test("JpegCodec: parse(build) roundtrips, COM cap enforced, any SOF0-15 accepted, malformed throws") {
    import Multimodal.JpegCodec
    val payload = ("marker " * 64).getBytes("UTF-8")
    val m = JpegCodec.parse(JpegCodec.build(640, 480, 3, payload))
    assert(m.precision == 8 && m.width == 640 && m.height == 480 && m.nComp == 3)
    assert(m.comBytes == payload.length.toLong && m.nSegments == 3L)
    // grayscale single-component variant
    val g = JpegCodec.parse(JpegCodec.build(65535, 1, 1, Array.empty))
    assert(g.width == 65535 && g.height == 1 && g.nComp == 1 && g.comBytes == 0L)
    // u16 COM cap: an oversized payload is truncated at build, so the
    // segment length stays within the marker format's 2-byte field
    val big = new Array[Byte](70000)
    assert(JpegCodec.parse(JpegCodec.build(100, 100, 3, big)).comBytes ==
      JpegCodec.ComCap.toLong)
    // progressive SOF2 is still a dimension carrier: flip the SOF0 marker
    val built = JpegCodec.build(320, 200, 3, payload)
    val sofAt = (0 until built.length - 1).find(i =>
      (built(i) & 0xff) == 0xff && (built(i + 1) & 0xff) == 0xc0).get
    val prog = built.clone(); prog(sofAt + 1) = 0xc2.toByte
    val p = JpegCodec.parse(prog)
    assert(p.width == 320 && p.height == 200, "SOF2 must parse like SOF0")
    // DHT (0xc4) in the SOF range is NOT a frame header: flipping to it
    // removes the only SOF → loud throw, not garbage dimensions
    val noSof = built.clone(); noSof(sofAt + 1) = 0xc4.toByte
    intercept[IllegalArgumentException](JpegCodec.parse(noSof))
    intercept[IllegalArgumentException](
      JpegCodec.parse(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
    intercept[IllegalArgumentException](JpegCodec.parse("nope".getBytes))
    intercept[IllegalArgumentException](JpegCodec.build(1, 1, 2, payload))
    // lost marker sync (a stray non-FF where a marker must start)
    val lost = built.clone(); lost(2) = 0x00
    intercept[IllegalArgumentException](JpegCodec.parse(lost))
  }

  test("DHash: identical payloads collide, single-byte edits stay near, packing stays in 56 bits") {
    import Multimodal.DHash.dHash
    val base = ("the quick brown fox jumps over the lazy dog " * 12).getBytes("UTF-8")
    assert(base.length > 449, "fixture must exercise the 449-byte truncation")
    // determinism + self-identity
    assert(dHash(base) == dHash(base.clone()))
    // 56-bit budget: bits 56..63 never set (sign bit stays clear)
    assert((dHash(base) >>> 56) == 0L)
    // trailing edits beyond byte 449 are invisible (the length-normalization
    // property the sampler exists for)
    val tail = base.clone(); tail(base.length - 1) = 'X'.toByte
    assert(dHash(tail) == dHash(base))
    // a single sampled-byte edit flips at most 2 bits (its two comparisons)
    val mid = base.clone(); mid(7 * 13) = 0x7e.toByte
    val ham = java.lang.Long.bitCount(dHash(mid) ^ dHash(base))
    assert(ham >= 1 && ham <= 2, s"single sample edit moved $ham bits")
    // an unsampled byte (not a multiple of 7 below 449) changes nothing
    val off = base.clone(); off(12) = 'Z'.toByte
    assert(dHash(off) == dHash(base))
    // empty payload is defined, not a crash
    assert(dHash(Array.empty[Byte]) == 0L)
  }
}
