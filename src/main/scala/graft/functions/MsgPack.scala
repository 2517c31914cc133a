package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Canonical feature envelope traveling the wire (SURVEY.md §1.3).
  *
  * `event_ts_us` is epoch microseconds (Spark's native timestamp precision);
  * convert with `timestamp_micros`/`unix_micros` at the DataFrame boundary.
  */
final case class Feature(
    layer: String,
    feature_id: String,
    geom_wkb: Array[Byte],
    props: Map[String, String],
    event_ts_us: Long,
    source: String,
    fmt_version: Int
)

/** Pure-Scala msgpack-subset codec for the feature envelope (SURVEY.md §2
  * A2/A3). The reference frames each feature as a msgpack map of envelope
  * fields + WKB geometry [UPSTREAM-UNVERIFIED — /root/reference is empty,
  * see SURVEY.md §0]; this is an original implementation of the msgpack
  * spec subset needed for that shape: fixmap/map16/map32, fixstr/str8/16/32,
  * bin8/16/32, nil, bool, fixint/int8..64/uint8..32, float64.
  *
  * Determinism: map keys are written in sorted order so `pack` is a pure
  * function of the feature value (required for idempotent sinks and for
  * hash-stable declared queries). The decoder is tolerant: unknown keys are
  * skipped (forward compat), missing keys default.
  */
object MsgPack {

  // ---------------------------------------------------------------- writer

  private def writeStr(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val n = b.length
    if (n < 32) out.write(0xa0 | n)
    else if (n < 256) { out.write(0xd9); out.write(n) }
    else if (n < 65536) { out.write(0xda); out.write(n >> 8); out.write(n) }
    else {
      out.write(0xdb)
      out.write(n >>> 24); out.write(n >>> 16); out.write(n >>> 8); out.write(n)
    }
    out.write(b, 0, n)
  }

  private def writeBin(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    val n = b.length
    if (n < 256) { out.write(0xc4); out.write(n) }
    else if (n < 65536) { out.write(0xc5); out.write(n >> 8); out.write(n) }
    else {
      out.write(0xc6)
      out.write(n >>> 24); out.write(n >>> 16); out.write(n >>> 8); out.write(n)
    }
    out.write(b, 0, n)
  }

  private def writeLong(out: ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0 && v < 128) out.write(v.toInt)
    else if (v >= -32 && v < 0) out.write(0xe0 | (v.toInt & 0x1f))
    else if (v >= Int.MinValue && v <= Int.MaxValue) {
      out.write(0xd2)
      val i = v.toInt
      out.write(i >>> 24); out.write(i >>> 16); out.write(i >>> 8); out.write(i)
    } else {
      out.write(0xd3)
      var sh = 56
      while (sh >= 0) { out.write((v >>> sh).toInt); sh -= 8 }
    }
  }

  private def writeNil(out: ByteArrayOutputStream): Unit = out.write(0xc0)

  private def writeMapHeader(out: ByteArrayOutputStream, n: Int): Unit = {
    if (n < 16) out.write(0x80 | n)
    else if (n < 65536) { out.write(0xde); out.write(n >> 8); out.write(n) }
    else {
      out.write(0xdf)
      out.write(n >>> 24); out.write(n >>> 16); out.write(n >>> 8); out.write(n)
    }
  }

  /** Feature → wire bytes. Envelope keys sorted; props keys sorted. */
  def pack(f: Feature): Array[Byte] = {
    val out = new ByteArrayOutputStream(128)
    writeMapHeader(out, 7)
    // keys in sorted order for byte-determinism
    writeStr(out, "event_ts"); writeLong(out, f.event_ts_us)
    writeStr(out, "feature_id")
    if (f.feature_id == null) writeNil(out) else writeStr(out, f.feature_id)
    writeStr(out, "fmt_version"); writeLong(out, f.fmt_version.toLong)
    writeStr(out, "geom_wkb")
    if (f.geom_wkb == null) writeNil(out) else writeBin(out, f.geom_wkb)
    writeStr(out, "layer")
    if (f.layer == null) writeNil(out) else writeStr(out, f.layer)
    writeStr(out, "props")
    if (f.props == null) writeNil(out)
    else {
      val keys = f.props.keys.toArray.sorted
      writeMapHeader(out, keys.length)
      keys.foreach { k =>
        writeStr(out, k)
        val v = f.props(k)
        if (v == null) writeNil(out) else writeStr(out, v)
      }
    }
    writeStr(out, "source")
    if (f.source == null) writeNil(out) else writeStr(out, f.source)
    out.toByteArray
  }

  // ---------------------------------------------------------------- reader

  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    private def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    private def u16(): Int = (u8() << 8) | u8()
    private def u32(): Int = (u16() << 16) | u16()
    private def i64(): Long = ((u32().toLong & 0xffffffffL) << 32) | (u32().toLong & 0xffffffffL)

    private def takeBytes(n: Int): Array[Byte] = {
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
    private def takeStr(n: Int): String =
      new String(takeBytes(n), StandardCharsets.UTF_8)

    def readAny(): Any = {
      val t = u8()
      if (t < 0x80) t.toLong // positive fixint
      else if (t >= 0xe0) (t - 256).toLong // negative fixint
      else if ((t & 0xf0) == 0x80) readMapBody(t & 0x0f)
      else if ((t & 0xf0) == 0x90) readArrBody(t & 0x0f)
      else if ((t & 0xe0) == 0xa0) takeStr(t & 0x1f)
      else t match {
        case 0xc0 => null
        case 0xc2 => false
        case 0xc3 => true
        case 0xc4 => takeBytes(u8())
        case 0xc5 => takeBytes(u16())
        case 0xc6 => takeBytes(u32())
        case 0xca => java.lang.Float.intBitsToFloat(u32()).toDouble
        case 0xcb => java.lang.Double.longBitsToDouble(i64())
        case 0xcc => u8().toLong
        case 0xcd => u16().toLong
        case 0xce => u32().toLong & 0xffffffffL
        case 0xcf => i64() // uint64 best-effort
        case 0xd0 => u8().toByte.toLong
        case 0xd1 => u16().toShort.toLong
        case 0xd2 => u32().toLong
        case 0xd3 => i64()
        case 0xd9 => takeStr(u8())
        case 0xda => takeStr(u16())
        case 0xdb => takeStr(u32())
        case 0xdc => readArrBody(u16())
        case 0xdd => readArrBody(u32())
        case 0xde => readMapBody(u16())
        case 0xdf => readMapBody(u32())
        case other => throw new IllegalArgumentException(f"msgpack: unsupported type byte 0x$other%02x")
      }
    }

    private def readMapBody(n: Int): Map[Any, Any] =
      (0 until n).map(_ => (readAny(), readAny())).toMap
    private def readArrBody(n: Int): Seq[Any] =
      (0 until n).map(_ => readAny())
  }

  /** Wire bytes → Feature. Unknown envelope keys are ignored; missing keys
    * get null/zero defaults (format-version tolerance, SURVEY.md §2 A3).
    */
  def unpack(bytes: Array[Byte]): Feature = {
    val root = new Reader(bytes).readAny() match {
      case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]]
      case other => throw new IllegalArgumentException(s"msgpack: feature root must be a map, got $other")
    }
    def str(k: String): String = root.get(k).orNull match {
      case s: String => s
      case _ => null
    }
    val propsVal = root.get("props").orNull match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[Any, Any]].map { case (k, v) =>
          (String.valueOf(k), if (v == null) null else String.valueOf(v))
        }
      case _ => null
    }
    val ts = root.get("event_ts").orNull match {
      case l: Long => l
      case _ => 0L
    }
    val ver = root.get("fmt_version").orNull match {
      case l: Long => l.toInt
      case _ => 0
    }
    val wkb = root.get("geom_wkb").orNull match {
      case b: Array[Byte] => b
      case _ => null
    }
    Feature(str("layer"), str("feature_id"), wkb, propsVal, ts, str("source"), ver)
  }
}
