package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck roundtrips for the SQLite codec pair: whatever the writer
  * half emits, the reader half must decode identically — varints over
  * the full nonnegative range, and records over arbitrary value rows
  * (null / Long / Double / UTF-8 String / bytes). This is the property
  * the a1c oracle row exercises end-to-end at fixed data; here the
  * input space is adversarial.
  */
object GpkgCodecSpec extends Properties("GpkgCodec") {

  private val genNonNeg: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, 127L),                       // 1-byte varints
    Gen.choose(128L, 1L << 14),                 // 2-byte boundary
    Gen.choose(1L << 14, 1L << 28),
    Gen.choose(1L << 28, 1L << 56),
    Gen.choose(1L << 56, Long.MaxValue))        // 9-byte tail

  property("varint roundtrip over the full nonnegative range") =
    Prop.forAll(genNonNeg) { v =>
      val bytes = GeoPackage.wVarint(v)
      val (back, n) = GeoPackage.varint(bytes, 0)
      back == v && n == bytes.length && bytes.length <= 9
    }

  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.choose(Long.MinValue, Long.MaxValue).map(v => v: Any),
    Gen.choose(-1e300, 1e300).map(v => v: Any),
    Gen.asciiPrintableStr.map(v => v: Any),
    Gen.oneOf("", "täxt ünïcode", "a\nb\tc", "z" * 5000).map(v => v: Any),
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray: Any))

  property("record roundtrip over arbitrary value rows") =
    Prop.forAll(Gen.listOfN(6, genValue)) { vals =>
      val rec = GeoPackage.wRecord(vals)
      val back = GeoPackage.record(rec)
      back.length == vals.length && back.zip(vals).forall {
        case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
        case (a, b) => a == b
      }
    }

  // sizes straddle every branch of the K/X split at 64 KiB pages:
  // in-local (maxLocal = 65501), the K ≤ X one-overflow-page window, the
  // K > X minLocal fallback, and multi-page chains (> 2·(U−4))
  private val genBlobSize: Gen[Int] = Gen.oneOf(
    Gen.choose(1, 1000), Gen.const(65501), Gen.const(65502),
    Gen.choose(65502, 131060), Gen.const(131061),
    Gen.choose(131061, 400000))

  property("writeGpkg/scanTable roundtrip spills big blobs to overflow chains") =
    Prop.forAll(genBlobSize, Gen.choose(0L, 1000000L)) { (size, seed) =>
      // deterministic pseudo-random payload: catches any page-splice
      // off-by-one a constant fill would alias away
      val blob = new Array[Byte](size)
      var x = seed * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < size) {
        blob(i) = (x >>> 56).toByte
        x = x * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      val small = GeoPackage.pointBlob(1.5, -2.5, 4326)
      val bytes = GeoPackage.writeGpkg("t", 4326,
        Seq((1L, "big", blob), (2L, "small", small)))
      val rows = GeoPackage.scanTable(bytes, "t").sortBy(_._1)
      rows.length == 2 &&
        rows(0)._2(1) == "big" &&
        java.util.Arrays.equals(rows(0)._2(2).asInstanceOf[Array[Byte]], blob) &&
        java.util.Arrays.equals(rows(1)._2(2).asInstanceOf[Array[Byte]], small)
    }

  property("a >64KiB polygon roundtrips through engine-written overflow pages") =
    Prop.forAll(Gen.choose(4200, 8000)) { nPts =>
      // a polygon ring of nPts points = 9 + 4 + 4 + 16·nPts WKB bytes —
      // past the 65501-byte local max from ~4100 points
      val ring = (0 until nPts).map { i =>
        val a = 2 * math.Pi * i / nPts
        (math.cos(a) * 10, math.sin(a) * 10)
      } :+ (10.0, 0.0)
      val wkb = graft.functions.Wkb.polygon(Seq(ring))
      val hdr = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put('G'.toByte).put('P'.toByte).put(0.toByte).put(1.toByte) // flags: LE, no envelope
        .putInt(4326).array()
      val blob = hdr ++ wkb
      val bytes = GeoPackage.writeGpkg("poly", 4326, Seq((7L, "ring", blob)))
      val back = GeoPackage.scanTable(bytes, "poly")
      val blobBack = back.head._2(2).asInstanceOf[Array[Byte]]
      val (srid, wkbBack) = GeoPackage.gpkgToWkb(blobBack)
      blob.length > 65501 && back.head._1 == 7L && srid == 4326 &&
        java.util.Arrays.equals(wkbBack, wkb)
    }
}
