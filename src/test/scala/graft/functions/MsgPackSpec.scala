package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}

class MsgPackSpec extends AnyFunSuite {

  private val feat = Feature(
    "flood_mask", "f-001", Wkb.point(11.5, 48.1),
    Map("sensor" -> "S1", "cloud" -> "0.12", "nil" -> null),
    1700000000000000L, "dlr", 1)

  test("pack→unpack is identity on a representative feature") {
    val back = MsgPack.unpack(MsgPack.pack(feat))
    assert(back.layer == feat.layer)
    assert(back.feature_id == feat.feature_id)
    assert(back.geom_wkb.toSeq == feat.geom_wkb.toSeq)
    assert(back.props == feat.props)
    assert(back.event_ts_us == feat.event_ts_us)
    assert(back.source == feat.source)
    assert(back.fmt_version == feat.fmt_version)
  }

  test("pack is byte-deterministic (sorted keys)") {
    val a = MsgPack.pack(feat)
    val b = MsgPack.pack(feat.copy(props = Map("nil" -> null, "cloud" -> "0.12", "sensor" -> "S1")))
    assert(a.toSeq == b.toSeq)
  }

  test("nulls survive the roundtrip") {
    val f = Feature(null, null, null, null, 0L, null, 0)
    val back = MsgPack.unpack(MsgPack.pack(f))
    assert(back == f)
  }

  test("unknown envelope keys are skipped (forward compatibility)") {
    // hand-encoded map: {"layer": "x", "zz_future": [1, true, "s"], "fmt_version": 2}
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x83)
    def str(s: String): Unit = { out.write(0xa0 | s.length); out.write(s.getBytes("UTF-8")) }
    str("layer"); str("x")
    str("zz_future"); out.write(0x93); out.write(1); out.write(0xc3); str("s")
    str("fmt_version"); out.write(2)
    val f = MsgPack.unpack(out.toByteArray)
    assert(f.layer == "x")
    assert(f.fmt_version == 2)
    assert(f.feature_id == null && f.props == null && f.geom_wkb == null)
  }

  test("large strings and binaries cross the str8/str16/bin16 size breaks") {
    val big = "ü" * 40000 // 80k UTF-8 bytes → str32 path
    val bin = Array.tabulate[Byte](70000)(i => (i % 251).toByte)
    val f = feat.copy(feature_id = big, geom_wkb = bin)
    val back = MsgPack.unpack(MsgPack.pack(f))
    assert(back.feature_id == big)
    assert(back.geom_wkb.toSeq == bin.toSeq)
  }
  test("unpack skips unknown envelope keys (forward compat)") {
    // hand-encoded fixmap(3): layer:"roads", zzz_extra:[1,2], event_ts:42
    val out = new java.io.ByteArrayOutputStream()
    def s(str: String): Unit = { out.write(0xa0 | str.length); out.write(str.getBytes("UTF-8")) }
    out.write(0x83)
    s("layer"); s("roads")
    s("zzz_extra"); out.write(0x92); out.write(1); out.write(2) // fixarray [1,2]
    s("event_ts"); out.write(42)
    val f = MsgPack.unpack(out.toByteArray)
    assert(f.layer == "roads")
    assert(f.event_ts_us == 42L)
    assert(f.feature_id == null && f.props == null && f.geom_wkb == null)
  }

  test("unpack rejects malformed input with an exception, never hangs") {
    val good = MsgPack.pack(Feature("l", "f", Array[Byte](1), Map("k" -> "v"), 1L, "s", 1))
    intercept[Exception](MsgPack.unpack(good.take(good.length / 2))) // truncated
    intercept[Exception](MsgPack.unpack(Array[Byte](0x92.toByte, 1, 2))) // root not a map
    intercept[Exception](MsgPack.unpack(Array[Byte](0xc1.toByte))) // reserved type byte
  }
}

/** ScalaCheck: roundtrip identity over arbitrary envelopes (SURVEY.md §5). */
object MsgPackProps extends Properties("MsgPack") {
  private val genProps: Gen[Map[String, String]] = Gen.mapOf(for {
    k <- Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("ключ"), Gen.const("键"))
    v <- Gen.oneOf(Gen.alphaNumStr, Gen.const(null: String), Gen.const("Ünïcode✓"))
  } yield (k, v))

  private val genFeature: Gen[Feature] = for {
    layer <- Gen.oneOf("flood", "burn", "水域", "")
    fid <- Gen.alphaNumStr
    wkb <- Gen.oneOf(
      Gen.const(null: Array[Byte]),
      Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    props <- genProps
    ts <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    src <- Gen.alphaNumStr
    ver <- Gen.chooseNum(-1000, 1000)
  } yield Feature(layer, fid, wkb, props, ts, src, ver)

  property("unpack(pack(f)) == f") = Prop.forAll(genFeature) { f =>
    val back = MsgPack.unpack(MsgPack.pack(f))
    back.layer == f.layer && back.feature_id == f.feature_id &&
      ((back.geom_wkb == null && f.geom_wkb == null) || back.geom_wkb.toSeq == f.geom_wkb.toSeq) &&
      back.props == f.props && back.event_ts_us == f.event_ts_us &&
      back.source == f.source && back.fmt_version == f.fmt_version
  }

}
