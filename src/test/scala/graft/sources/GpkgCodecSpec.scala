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
}
