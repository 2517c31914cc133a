package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-Scala WKB (Well-Known Binary) codec (SURVEY.md §2 A11).
  *
  * The reference transports geometries as opaque WKB bytes inside each
  * feature message [UPSTREAM-UNVERIFIED — empty checkout, SURVEY.md §0];
  * the engine keeps them opaque `BinaryType` columns and offers scalar
  * helpers (`geomType`, `bbox`, `bboxIntersects`) implemented here. No
  * JTS/Sedona jar exists in this image, so the codec is written from the
  * public OGC WKB spec: byte order flag, uint32 geometry type, coordinate
  * doubles. Supported: Point(1), LineString(2), Polygon(3) with any number
  * of rings, MultiPoint(4), MultiLineString(5), MultiPolygon(6) and
  * GeometryCollection(7) (recursive — every member carries its own byte
  * order flag per spec), both endiannesses, in three type-word dialects:
  * plain 2D, EWKB (PostGIS: Z/M/SRID flag bits in the high byte, 4-byte
  * SRID consumed when flagged), and ISO (base + 1000·Z + 2000·M). Z/M
  * ordinates are skipped — decoded envelopes are always the XY bbox.
  * Unrecognized type words throw rather than misparse.
  */
object Wkb {

  final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  def point(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    bb.array()
  }

  def lineString(pts: Seq[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 16 * pts.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(2).putInt(pts.length)
    pts.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    bb.array()
  }

  /** Single- or multi-ring polygon; each ring must be closed by the caller. */
  def polygon(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val n = rings.map(_.length).sum
    // header = order(1) + type(4) + numRings(4); trailing slack bytes would
    // desynchronize the reader when this value is embedded in a collection
    val bb = ByteBuffer.allocate(9 + 4 * rings.length + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(3).putInt(rings.length)
    rings.foreach { ring =>
      bb.putInt(ring.length)
      ring.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    }
    bb.array()
  }

  /** A multi-geometry / collection envelope: each member is a complete
    * WKB value (own byte-order flag), per the OGC spec.
    */
  def multi(gtype: Int, members: Seq[Array[Byte]]): Array[Byte] = {
    require(gtype >= 4 && gtype <= 7, s"not a collection type: $gtype")
    multiIso(gtype, hasZ = false, hasM = false, members)
  }

  /** ISO type word: Z = +1000, M = +2000, ZM = +3000. */
  private def isoWord(base: Int, hasZ: Boolean, hasM: Boolean): Int =
    base + (if (hasZ) 1000 else 0) + (if (hasM) 2000 else 0)

  private def ordLen(hasZ: Boolean, hasM: Boolean): Int =
    2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)

  /** ISO-typed writers for higher-dimension geometry (XYZ / XYM / XYZM):
    * each coordinate is an ordinate row of exactly 2 + Z? + M? doubles in
    * X, Y, [Z], [M] order. Every reader in this module already consumes
    * ISO/EWKB dims (XY ops skip the extra ordinates); these writers
    * close the loop for sources that CARRY Z/M — shapefile types
    * 11/13/15/21/23/25, GeoJSON 3-position coordinates.
    */
  def pointIso(ords: IndexedSeq[Double], hasZ: Boolean, hasM: Boolean): Array[Byte] = {
    val d = ordLen(hasZ, hasM)
    require(ords.length == d, s"pointIso: ${ords.length} ordinates, need $d")
    val bb = ByteBuffer.allocate(5 + 8 * d).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(isoWord(1, hasZ, hasM))
    ords.foreach(bb.putDouble)
    bb.array()
  }

  def lineStringIso(pts: Seq[IndexedSeq[Double]], hasZ: Boolean,
      hasM: Boolean): Array[Byte] = {
    val d = ordLen(hasZ, hasM)
    pts.foreach(p => require(p.length == d,
      s"lineStringIso: ${p.length} ordinates, need $d"))
    val bb = ByteBuffer.allocate(9 + 8 * d * pts.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(isoWord(2, hasZ, hasM)).putInt(pts.length)
    pts.foreach(_.foreach(bb.putDouble))
    bb.array()
  }

  def polygonIso(rings: Seq[Seq[IndexedSeq[Double]]], hasZ: Boolean,
      hasM: Boolean): Array[Byte] = {
    val d = ordLen(hasZ, hasM)
    rings.foreach(_.foreach(p => require(p.length == d,
      s"polygonIso: ${p.length} ordinates, need $d")))
    val n = rings.map(_.length).sum
    val bb = ByteBuffer.allocate(9 + 4 * rings.length + 8 * d * n)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(isoWord(3, hasZ, hasM)).putInt(rings.length)
    rings.foreach { ring =>
      bb.putInt(ring.length)
      ring.foreach(_.foreach(bb.putDouble))
    }
    bb.array()
  }

  def multiIso(gtype: Int, hasZ: Boolean, hasM: Boolean,
      members: Seq[Array[Byte]]): Array[Byte] = {
    require(gtype >= 4 && gtype <= 7, s"not a collection type: $gtype")
    val bb = ByteBuffer.allocate(9 + members.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(isoWord(gtype, hasZ, hasM)).putInt(members.length)
    members.foreach(bb.put)
    bb.array()
  }

  /** Decoded WKB header: base 2D geometry type plus the number of doubles
    * per coordinate (2 for XY, 3 for XYZ/XYM, 4 for XYZM).
    */
  private final case class Header(base: Int, dims: Int, hasZ: Boolean = false)

  // EWKB (PostGIS) type-word flag bits
  private val FlagZ = 0x80000000
  private val FlagM = 0x40000000
  private val FlagSrid = 0x20000000

  /** Reads the byte-order flag and the FULL uint32 type word, setting bb's
    * order, consuming the 4-byte SRID when the EWKB SRID flag is set, and
    * deriving the coordinate stride from both dialects' dimension markers:
    * EWKB high bits (0x80000000 = Z, 0x40000000 = M) and ISO 1000-offset
    * types (1000s = Z, 2000s = M, 3000s = ZM). Anything else in the
    * thousands range is rejected loudly — never silently misparsed.
    */
  private def header(bb: ByteBuffer): Header = {
    bb.order(if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val raw = bb.getInt
    val ewkbZ = (raw & FlagZ) != 0
    val ewkbM = (raw & FlagM) != 0
    val flagless = raw & ~(FlagZ | FlagM | FlagSrid)
    val isoDim = flagless / 1000
    if (isoDim < 0 || isoDim > 3)
      throw new IllegalArgumentException(s"wkb: unsupported ISO type word $flagless")
    val isoZ = isoDim == 1 || isoDim == 3
    val isoM = isoDim == 2 || isoDim == 3
    if ((raw & FlagSrid) != 0) bb.getInt // consume the EWKB SRID word
    val dims = 2 + (if (ewkbZ || isoZ) 1 else 0) + (if (ewkbM || isoM) 1 else 0)
    Header(flagless % 1000, dims, ewkbZ || isoZ)
  }

  /** SRID from the top-level EWKB header (the PostGIS extension word), or
    * 0 for plain WKB / ISO values, which carry none — matching PostGIS's
    * "unknown" SRID. Only the top-level header is consulted; PostGIS never
    * flags nested member headers.
    */
  def srid(wkb: Array[Byte]): Int = {
    val bb = ByteBuffer.wrap(wkb)
    bb.order(if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val raw = bb.getInt
    if ((raw & FlagSrid) != 0) bb.getInt else 0
  }

  /** Re-headers the value as EWKB carrying `newSrid` (srid = 0 strips the
    * flag back to plain WKB). Top-level header only, per the PostGIS
    * convention; the geometry body bytes pass through untouched, so every
    * coordinate stays bit-identical.
    */
  def setSrid(wkb: Array[Byte], newSrid: Int): Array[Byte] = {
    val bb = ByteBuffer.wrap(wkb)
    val orderByte = bb.get()
    bb.order(if (orderByte == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val raw = bb.getInt
    if ((raw & FlagSrid) != 0) bb.getInt // drop the old SRID word
    val body = new Array[Byte](bb.remaining())
    bb.get(body)
    val out = ByteBuffer.allocate(1 + 4 + (if (newSrid != 0) 4 else 0) + body.length)
      .order(bb.order())
    out.put(orderByte)
    out.putInt(if (newSrid != 0) raw | FlagSrid else raw & ~FlagSrid)
    if (newSrid != 0) out.putInt(newSrid)
    out.put(body)
    out.array()
  }

  /** Rewrites every XY coordinate through `f`, structure and byte order
    * untouched (Z/M ordinates pass through, each collection member keeps
    * its own endianness). The walk mirrors [[bbox]]; writes are absolute
    * puts back into a copy of the input, so everything outside the
    * coordinate doubles stays bit-identical.
    */
  def mapCoords(wkb: Array[Byte], f: (Double, Double) => (Double, Double)): Array[Byte] = {
    val out = wkb.clone()
    val bb = ByteBuffer.wrap(out)
    def coords(n: Int, dims: Int): Unit = {
      var i = 0
      while (i < n) {
        val at = bb.position()
        val x = bb.getDouble; val y = bb.getDouble
        val (nx, ny) = f(x, y)
        bb.putDouble(at, nx)
        bb.putDouble(at + 8, ny)
        var d = 2
        while (d < dims) { bb.getDouble; d += 1 }
        i += 1
      }
    }
    def geom(): Unit = {
      val h = header(bb)
      h.base match {
        case 1 => coords(1, h.dims)
        case 2 => coords(bb.getInt, h.dims)
        case 3 =>
          val rings = bb.getInt
          var r = 0
          while (r < rings) { coords(bb.getInt, h.dims); r += 1 }
        case t if t >= 4 && t <= 7 =>
          val n = bb.getInt
          var i = 0
          while (i < n) { geom(); i += 1 }
        case t => throw new IllegalArgumentException(s"wkb: unsupported geometry type $t")
      }
    }
    geom()
    out
  }

  /** Spherical-Mercator earth radius (EPSG:3857), meters. */
  private val MercatorR = 6378137.0

  /** WGS84 lon/lat degrees → EPSG:3857 meters (spherical Mercator). The
    * op chains are written term-by-term (no library toRadians, whose
    * divide-then-multiply order differs) so an oracle replaying
    * `lon * pi() / 180 * R` and `ln(tan(pi()/4 + lat*pi()/360)) * R`
    * matches the x chain bit-for-bit; y's ln/tan may differ by a last-ulp
    * across libms, so oracle-checked outputs quantize y coarsely. Domain:
    * |lat| < 90 (the projection diverges at the poles; EPSG:3857 itself
    * cuts off at ±85.051129°).
    */
  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) =
    (lon * math.Pi / 180.0 * MercatorR,
      math.log(math.tan(math.Pi / 4 + lat * math.Pi / 360.0)) * MercatorR)

  /** EPSG:3857 meters → WGS84 lon/lat degrees (inverse spherical
    * Mercator).
    */
  def mercatorToLonLat(x: Double, y: Double): (Double, Double) =
    (x / MercatorR * 180.0 / math.Pi,
      (math.atan(math.exp(y / MercatorR)) * 2 - math.Pi / 2) * 180.0 / math.Pi)

  // ---- WGS84 / UTM (EPSG 326zz north, 327zz south) -------------------
  // Transverse-Mercator via the Krüger series in Karney's formulation
  // (arXiv:1002.1417, public-domain formulas), truncated at n⁴: with
  // n ≈ 0.00168 for WGS84 the truncation error is ~a·n⁵ ≈ 8e-8 m, and
  // the forward∘inverse roundtrip lands well inside 1e-9°. Both EPSG
  // sides are WGS84, so NO datum shift is involved (that is what keeps
  // this implementable offline; national grids on other datums stay
  // loudly rejected).
  private val WgsF = 1.0 / 298.257223563
  private val UtmK0 = 0.9996
  private val KrN = WgsF / (2.0 - WgsF)
  private val KrN2 = KrN * KrN
  private val KrN3 = KrN2 * KrN
  private val KrN4 = KrN2 * KrN2
  private val KrA =
    MercatorR / (1.0 + KrN) * (1.0 + KrN2 / 4.0 + KrN4 / 64.0)
  private val KrK0A = UtmK0 * KrA
  /** 2√n/(1+n): the conformal-latitude eccentricity-like constant. */
  private val KrE2p = 2.0 * math.sqrt(KrN) / (1.0 + KrN)
  private val Al1 = KrN / 2.0 - 2.0 * KrN2 / 3.0 + 5.0 * KrN3 / 16.0 + 41.0 * KrN4 / 180.0
  private val Al2 = 13.0 * KrN2 / 48.0 - 3.0 * KrN3 / 5.0 + 557.0 * KrN4 / 1440.0
  private val Al3 = 61.0 * KrN3 / 240.0 - 103.0 * KrN4 / 140.0
  private val Al4 = 49561.0 * KrN4 / 161280.0
  private val Be1 = KrN / 2.0 - 2.0 * KrN2 / 3.0 + 37.0 * KrN3 / 96.0 - KrN4 / 360.0
  private val Be2 = KrN2 / 48.0 + KrN3 / 15.0 - 437.0 * KrN4 / 1440.0
  private val Be3 = 17.0 * KrN3 / 480.0 - 37.0 * KrN4 / 840.0
  private val Be4 = 4397.0 * KrN4 / 161280.0
  private val De1 = 2.0 * KrN - 2.0 * KrN2 / 3.0 - 2.0 * KrN3 + 116.0 * KrN4 / 45.0
  private val De2 = 7.0 * KrN2 / 3.0 - 8.0 * KrN3 / 5.0 - 227.0 * KrN4 / 45.0
  private val De3 = 56.0 * KrN3 / 15.0 - 136.0 * KrN4 / 35.0
  private val De4 = 4279.0 * KrN4 / 630.0

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinhD(x: Double): Double = math.log(x + math.sqrt(x * x + 1.0))

  /** Oracle-replay constants for the generated UTM SQL (a11s pattern):
    * (k0·A, 2√n/(1+n), Seq(α1..α4)) as full-precision doubles.
    */
  private[graft] def utmConstants: (Double, Double, Seq[Double]) =
    (KrK0A, KrE2p, Seq(Al1, Al2, Al3, Al4))

  private[graft] def utmZoneOf(srid: Int): Int = srid % 100
  private[graft] def isUtmSrid(srid: Int): Boolean = {
    val z = utmZoneOf(srid)
    (srid >= 32601 && srid <= 32660 || srid >= 32701 && srid <= 32760) &&
      z >= 1 && z <= 60
  }
  private def utmLon0Deg(zone: Int): Double = zone * 6.0 - 183.0

  /** WGS84 lon/lat degrees → UTM zone easting/northing meters. Exact
    * anchors: the central meridian maps to E = 500000 and the equator to
    * N = 0 (north) / 10000000 (south) with zero floating-point residue
    * (every series term carries a sin/sinh of an exact 0).
    */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val phi = lat * math.Pi / 180.0
    val lam = (lon - utmLon0Deg(zone)) * math.Pi / 180.0
    val sphi = math.sin(phi)
    val t = math.sinh(atanh(sphi) - KrE2p * atanh(KrE2p * sphi))
    val cl = math.cos(lam)
    val xip = math.atan2(t, cl)
    val etap = asinhD(math.sin(lam) / math.sqrt(t * t + cl * cl))
    val xi = xip +
      Al1 * math.sin(2 * xip) * math.cosh(2 * etap) +
      Al2 * math.sin(4 * xip) * math.cosh(4 * etap) +
      Al3 * math.sin(6 * xip) * math.cosh(6 * etap) +
      Al4 * math.sin(8 * xip) * math.cosh(8 * etap)
    val eta = etap +
      Al1 * math.cos(2 * xip) * math.sinh(2 * etap) +
      Al2 * math.cos(4 * xip) * math.sinh(4 * etap) +
      Al3 * math.cos(6 * xip) * math.sinh(6 * etap) +
      Al4 * math.cos(8 * xip) * math.sinh(8 * etap)
    val n0 = KrK0A * xi
    (500000.0 + KrK0A * eta, if (south) n0 + 10000000.0 else n0)
  }

  /** UTM easting/northing meters → WGS84 lon/lat degrees (inverse
    * series + the conformal→geodetic latitude expansion).
    */
  def utmToLonLat(e: Double, n: Double, zone: Int, south: Boolean): (Double, Double) = {
    val xi = (if (south) n - 10000000.0 else n) / KrK0A
    val eta = (e - 500000.0) / KrK0A
    val xip = xi -
      (Be1 * math.sin(2 * xi) * math.cosh(2 * eta) +
        Be2 * math.sin(4 * xi) * math.cosh(4 * eta) +
        Be3 * math.sin(6 * xi) * math.cosh(6 * eta) +
        Be4 * math.sin(8 * xi) * math.cosh(8 * eta))
    val etap = eta -
      (Be1 * math.cos(2 * xi) * math.sinh(2 * eta) +
        Be2 * math.cos(4 * xi) * math.sinh(4 * eta) +
        Be3 * math.cos(6 * xi) * math.sinh(6 * eta) +
        Be4 * math.cos(8 * xi) * math.sinh(8 * eta))
    val chi = math.atan2(math.sin(xip),
      math.sqrt(math.sinh(etap) * math.sinh(etap) + math.cos(xip) * math.cos(xip)))
    val phi = chi + De1 * math.sin(2 * chi) + De2 * math.sin(4 * chi) +
      De3 * math.sin(6 * chi) + De4 * math.sin(8 * chi)
    val lam = math.atan2(math.sinh(etap), math.cos(xip))
    (lam * 180.0 / math.Pi + utmLon0Deg(zone), phi * 180.0 / math.Pi)
  }

  // ---- WGS84 geodesic distance (Vincenty inverse, fixed iterations) --
  // Vincenty's inverse formulas (T. Vincenty, "Direct and Inverse
  // Solutions of Geodesics on the Ellipsoid", Survey Review XXIII(176),
  // 1975 — public formulas). The λ-iteration runs a FIXED count
  // ([[GeodIters]]) instead of to-convergence: convergence for
  // non-antipodal pairs is ~1e-12 within 4-6 rounds, and a fixed count
  // makes the computation a pure function of the inputs — replayable
  // op-for-op by an oracle (the a11s discipline). Outside that
  // convergent region (near-antipodal pairs, where classic Vincenty
  // diverges or crawls) [[geodesicMeters]] now THROWS instead of
  // returning a deterministic-but-wrong value — never silently wrong —
  // and [[geodesicMetersRobust]] offers the iterate-to-convergence
  // variant for callers whose separations approach 180°.
  private val GeodIters = 6
  // λ still moving more than this (radians) after the fixed rounds ⇒ the
  // iteration has not converged. 1e-11 rad of longitude is ~0.06 mm at
  // the equator — far below the mm the series itself is good for.
  private val GeodTol = 1e-11
  private val WgsB = MercatorR * (1.0 - WgsF)

  /** Oracle-replay constants: (a, b, f, iteration count). */
  private[graft] def geodConstants: (Double, Double, Double, Int) =
    (MercatorR, WgsB, WgsF, GeodIters)

  /** Core Vincenty-inverse λ iteration: runs `iters` rounds exactly
    * (no early exit when `replay` — the op-for-op oracle contract), or
    * exits early on convergence when `!replay`. Returns
    * (distance_m, |Δλ| of the LAST round taken) — the delta is the
    * convergence evidence the callers' guards act on.
    */
  private def geodesicCore(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double, iters: Int, replay: Boolean): (Double, Double) = {
    val rad = math.Pi / 180.0
    val bigL = (lon2 - lon1) * rad
    val u1 = math.atan((1.0 - WgsF) * math.tan(lat1 * rad))
    val u2 = math.atan((1.0 - WgsF) * math.tan(lat2 * rad))
    val sU1 = math.sin(u1); val cU1 = math.cos(u1)
    val sU2 = math.sin(u2); val cU2 = math.cos(u2)
    // λ iteration: each round recomputes the intermediates from the
    // current λ and updates λ only (the shape the generated oracle SQL
    // mirrors stage-for-stage in replay mode)
    var lam = bigL
    var delta = 0.0
    var i = 0
    var done = false
    while (i < iters && !done) {
      val sl = math.sin(lam); val cl = math.cos(lam)
      val sinsig = math.sqrt((cU2 * sl) * (cU2 * sl) +
        (cU1 * sU2 - sU1 * cU2 * cl) * (cU1 * sU2 - sU1 * cU2 * cl))
      val cossig = sU1 * sU2 + cU1 * cU2 * cl
      val sigma = math.atan2(sinsig, cossig)
      val sina = if (sinsig == 0.0) 0.0 else cU1 * cU2 * sl / sinsig
      val cos2a = 1.0 - sina * sina
      val cos2m = if (cos2a == 0.0) 0.0 else cossig - 2.0 * sU1 * sU2 / cos2a
      val c = WgsF / 16.0 * cos2a * (4.0 + WgsF * (4.0 - 3.0 * cos2a))
      val next = bigL + (1.0 - c) * WgsF * sina *
        (sigma + c * sinsig * (cos2m + c * cossig * (-1.0 + 2.0 * cos2m * cos2m)))
      delta = math.abs(next - lam)
      lam = next
      // early exit only off the replay path: a converged λ is a fixed
      // point to the last ulp or dithers below any tolerance we use, but
      // the oracle CTE chain runs EXACTLY GeodIters rounds, so the
      // replayed form must too
      if (!replay && delta < 1e-15) done = true
      i += 1
    }
    // final evaluation from the converged λ
    val sl = math.sin(lam); val cl = math.cos(lam)
    val sinsig = math.sqrt((cU2 * sl) * (cU2 * sl) +
      (cU1 * sU2 - sU1 * cU2 * cl) * (cU1 * sU2 - sU1 * cU2 * cl))
    val cossig = sU1 * sU2 + cU1 * cU2 * cl
    val sigma = math.atan2(sinsig, cossig)
    val sina = if (sinsig == 0.0) 0.0 else cU1 * cU2 * sl / sinsig
    val cos2a = 1.0 - sina * sina
    val cos2m = if (cos2a == 0.0) 0.0 else cossig - 2.0 * sU1 * sU2 / cos2a
    val u2sq = cos2a * (MercatorR * MercatorR - WgsB * WgsB) / (WgsB * WgsB)
    val aa = 1.0 + u2sq / 16384.0 *
      (4096.0 + u2sq * (-768.0 + u2sq * (320.0 - 175.0 * u2sq)))
    val bb = u2sq / 1024.0 * (256.0 + u2sq * (-128.0 + u2sq * (74.0 - 47.0 * u2sq)))
    val dsig = bb * sinsig * (cos2m + bb / 4.0 *
      (cossig * (-1.0 + 2.0 * cos2m * cos2m) -
        bb / 6.0 * cos2m * (-3.0 + 4.0 * sinsig * sinsig) *
          (-3.0 + 4.0 * cos2m * cos2m)))
    (WgsB * aa * (sigma - dsig), delta)
  }

  /** Geodesic distance in meters between two WGS84 lon/lat points.
    * Division guards use EXACT zero compares deliberately: sinσ is
    * exactly 0 only for coincident points (where both engines compute
    * the same bit pattern), so engine and oracle take the same branch.
    *
    * Antipodal guard: if λ is still moving more than [[GeodTol]] after
    * the fixed rounds (the classic Vincenty divergence region, pairs
    * within ~0.5° of antipodal — or slow convergence needing more
    * rounds), this THROWS rather than returning the deterministic-but-
    * inaccurate fixed-iteration value. Inside the convergent domain the
    * returned value is bit-identical to the pre-guard behavior (the
    * a11u oracle replay). Use [[geodesicMetersRobust]] for separations
    * approaching 180°. The negated compare (`!(delta <= tol)`) also
    * trips on NaN, so a degenerate input can never slip through.
    */
  def geodesicMeters(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double): Double = {
    val (d, delta) = geodesicCore(lon1, lat1, lon2, lat2, GeodIters, replay = true)
    if (!(delta <= GeodTol))
      throw new IllegalArgumentException(
        f"geodesicMeters: Vincenty λ-iteration did not converge for " +
          f"($lon1%.6f,$lat1%.6f)-($lon2%.6f,$lat2%.6f) (|Δλ|=$delta%.3e rad " +
          f"after $GeodIters rounds — near-antipodal pair); " +
          "use geodesicMetersRobust for separations approaching 180°")
    d
  }

  /** Iterate-to-convergence Vincenty inverse for callers whose pairs may
    * approach (but not reach) the antipodal region: up to `maxIters`
    * rounds with an early exit at |Δλ| < 1e-15 rad. Slow-converging
    * pairs (~179.5°+) that the fixed-round replay rejects resolve here;
    * truly antipodal pairs — where Vincenty's λ-iteration genuinely
    * diverges/oscillates — still throw rather than return garbage
    * (Vincenty's own antipodal continuation or Karney's method is the
    * complete treatment; the throw keeps this honest until then).
    */
  def geodesicMetersRobust(lon1: Double, lat1: Double,
      lon2: Double, lat2: Double, maxIters: Int = 200): Double = {
    val (d, delta) = geodesicCore(lon1, lat1, lon2, lat2, maxIters, replay = false)
    if (!(delta <= GeodTol))
      throw new IllegalArgumentException(
        f"geodesicMetersRobust: Vincenty λ-iteration diverged for " +
          f"($lon1%.6f,$lat1%.6f)-($lon2%.6f,$lat2%.6f) (|Δλ|=$delta%.3e rad " +
          f"after $maxIters rounds — antipodal pair, outside Vincenty's domain)")
    d
  }

  // ---- WGS84 geodesic direct (Vincenty direct, fixed iterations) -----
  // Vincenty's DIRECT formulas (same 1975 paper as the inverse above):
  // given a start point, an initial azimuth, and a distance, find the
  // destination. The σ-iteration runs a FIXED count — Δσ contracts by
  // ~B ≈ u²/1024 ≈ 1.7e-6 per round on WGS84, so 4 rounds land far
  // below double precision — making the computation a pure function of
  // the inputs, replayable op-for-op by an oracle (the a11u discipline).
  private val GeodDirectIters = 4

  /** Oracle-replay constants for the direct problem: (a, b, f, σ-iters). */
  private[graft] def geodDirectConstants: (Double, Double, Double, Int) =
    (MercatorR, WgsB, WgsF, GeodDirectIters)

  /** Vincenty direct: destination (lonDeg, latDeg) reached by travelling
    * `distM` ellipsoidal meters from (lon1, lat1) at initial azimuth
    * `azDeg` (clockwise from north). Every stage mirrors the published
    * equation order so the generated oracle SQL replays it literally.
    */
  def geodesicDirect(lon1: Double, lat1: Double,
      azDeg: Double, distM: Double): (Double, Double) = {
    val rad = math.Pi / 180.0
    val alpha1 = azDeg * rad
    val u1 = math.atan((1.0 - WgsF) * math.tan(lat1 * rad))
    val sU1 = math.sin(u1); val cU1 = math.cos(u1)
    val sA = math.sin(alpha1); val cA = math.cos(alpha1)
    val sig1 = math.atan2(math.tan(u1), cA)
    val sina = cU1 * sA
    val cos2a = 1.0 - sina * sina
    val u2sq = cos2a * (MercatorR * MercatorR - WgsB * WgsB) / (WgsB * WgsB)
    val aa = 1.0 + u2sq / 16384.0 *
      (4096.0 + u2sq * (-768.0 + u2sq * (320.0 - 175.0 * u2sq)))
    val bb = u2sq / 1024.0 * (256.0 + u2sq * (-128.0 + u2sq * (74.0 - 47.0 * u2sq)))
    val sOverBA = distM / (WgsB * aa)
    var sig = sOverBA
    var i = 0
    while (i < GeodDirectIters) {
      val c2m = math.cos(2.0 * sig1 + sig)
      val ss = math.sin(sig); val cs = math.cos(sig)
      val dsig = bb * ss * (c2m + bb / 4.0 *
        (cs * (-1.0 + 2.0 * c2m * c2m) -
          bb / 6.0 * c2m * (-3.0 + 4.0 * ss * ss) * (-3.0 + 4.0 * c2m * c2m)))
      sig = sOverBA + dsig
      i += 1
    }
    val ss = math.sin(sig); val cs = math.cos(sig)
    val c2m = math.cos(2.0 * sig1 + sig)
    val tmp = sU1 * ss - cU1 * cs * cA
    val phi2 = math.atan2(sU1 * cs + cU1 * ss * cA,
      (1.0 - WgsF) * math.sqrt(sina * sina + tmp * tmp))
    val lam = math.atan2(ss * sA, cU1 * cs - sU1 * ss * cA)
    val c = WgsF / 16.0 * cos2a * (4.0 + WgsF * (4.0 - 3.0 * cos2a))
    val bigL = lam - (1.0 - c) * WgsF * sina *
      (sig + c * ss * (c2m + c * cs * (-1.0 + 2.0 * c2m * c2m)))
    (lon1 + bigL / rad, phi2 / rad)
  }

  /** Meter-true geodesic buffer of a lon/lat POINT: a `segments`-vertex
    * polygon whose every vertex lies exactly `rMeters` ellipsoidal
    * meters from the center along its azimuth (Vincenty direct per
    * vertex, azimuths k·360/segments clockwise from north) — the
    * geography-mode ST_Buffer a user needs for "500 m around each
    * feature" on raw lon/lat, where [[bufferEuclidean]]'s planar-degree
    * radius would be ~111 km and latitude-skewed. Works anywhere the
    * direct problem does (all latitudes; the ring never spans a pole
    * for radii ≪ the polar distance). SRID/dialect of the input is
    * ignored — the caller asserts the datum, as with
    * [[geodesicDistance]].
    */
  def bufferGeodesicPoint(wkb: Array[Byte], rMeters: Double, segments: Int = 16): Array[Byte] = {
    require(segments >= 3, s"bufferGeodesicPoint: need >=3 segments, got $segments")
    val buf = ByteBuffer.wrap(wkb)
    val h = header(buf)
    require(h.base == 1, s"wkb: bufferGeodesicPoint expects POINT, got type ${h.base}")
    val cx = buf.getDouble; val cy = buf.getDouble
    val ring = (0 until segments).map { k =>
      geodesicDirect(cx, cy, k * 360.0 / segments, rMeters)
    }
    polygon(Seq(ring :+ ring.head))
  }

  /** Geodesic meters between two POINT geometries holding WGS84 lon/lat
    * degrees (any WKB dialect; SRID ignored — the caller asserts the
    * datum, as with [[pointDistance]]'s planar assumption).
    */
  def geodesicDistance(a: Array[Byte], b: Array[Byte]): Double = {
    def xy(wkb: Array[Byte]): (Double, Double) = {
      val buf = ByteBuffer.wrap(wkb)
      val h = header(buf)
      require(h.base == 1, s"wkb: geodesicDistance expects POINT, got type ${h.base}")
      (buf.getDouble, buf.getDouble)
    }
    val (ax, ay) = xy(a)
    val (bx, by) = xy(b)
    geodesicMeters(ax, ay, bx, by)
  }

  /** Reprojects between the CRSs a web-mapping / field-data PostGIS
    * habitat uses constantly: EPSG:4326 (WGS84 degrees) ↔ EPSG:3857
    * (spherical Mercator meters) ↔ nothing, and EPSG:4326 ↔ WGS84 UTM
    * zones (EPSG 326zz north / 327zz south — same datum, pure
    * Transverse-Mercator series, see [[lonLatToUtm]]). The source CRS is
    * read from the value's own EWKB SRID header — plain WKB (SRID 0) is
    * rejected loudly (tag with [[setSrid]] first) rather than guessed;
    * same-SRID is the identity. The result carries `toSrid` in its
    * header, so downstream mixed-SRID guards keep working. Any other
    * pair is rejected: cross-datum transforms need shift tables that
    * don't exist in this offline image, and a silently-wrong transform
    * is worse than a loud unsupported one (3857 ↔ UTM is also rejected —
    * chain through 4326 explicitly).
    */
  def reproject(wkb: Array[Byte], toSrid: Int): Array[Byte] = {
    val from = srid(wkb)
    require(from != 0,
      "reproject: source SRID unknown (plain WKB) — tag with geom_set_srid first")
    if (from == toSrid) wkb
    else {
      val f: (Double, Double) => (Double, Double) = (from, toSrid) match {
        case (4326, 3857) => lonLatToMercator
        case (3857, 4326) => mercatorToLonLat
        case (4326, z) if isUtmSrid(z) =>
          (lon, lat) => lonLatToUtm(lon, lat, utmZoneOf(z), z >= 32701)
        case (z, 4326) if isUtmSrid(z) =>
          (e, n) => utmToLonLat(e, n, utmZoneOf(z), z >= 32701)
        // parameterized registry (Lambert conformal conic + ETRS89 TM):
        // geocentric datums treated as WGS84-identical, see graft.functions.Crs
        case (4326, z) if Crs.forwardOf(z).isDefined => Crs.forwardOf(z).get
        case (z, 4326) if Crs.inverseOf(z).isDefined => Crs.inverseOf(z).get
        case _ => throw new IllegalArgumentException(
          s"reproject: unsupported $from -> $toSrid " +
            "(supported: 4326 <-> 3857, 4326 <-> 326xx/327xx WGS84 UTM, " +
            "4326 <-> registered LCC/TM/polar-stereo/sinusoidal grids — see graft.functions.Crs)")
      }
      setSrid(mapCoords(wkb, f), toSrid)
    }
  }

  def geomType(wkb: Array[Byte]): String = header(ByteBuffer.wrap(wkb)).base match {
    case 1 => "POINT"
    case 2 => "LINESTRING"
    case 3 => "POLYGON"
    case 4 => "MULTIPOINT"
    case 5 => "MULTILINESTRING"
    case 6 => "MULTIPOLYGON"
    case 7 => "GEOMETRYCOLLECTION"
    case t => s"UNKNOWN($t)"
  }

  def bbox(wkb: Array[Byte]): BBox = {
    val bb = ByteBuffer.wrap(wkb)
    var xmin = Double.PositiveInfinity
    var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity
    var ymax = Double.NegativeInfinity
    // dims > 2: Z/M ordinates are skipped — the bbox is the XY envelope
    def coords(n: Int, dims: Int): Unit = {
      var i = 0
      while (i < n) {
        val x = bb.getDouble; val y = bb.getDouble
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
        var d = 2
        while (d < dims) { bb.getDouble; d += 1 }
        i += 1
      }
    }
    def geom(): Unit = {
      val h = header(bb)
      h.base match {
        case 1 => coords(1, h.dims)
        case 2 => coords(bb.getInt, h.dims)
        case 3 =>
          val rings = bb.getInt
          var r = 0
          while (r < rings) { coords(bb.getInt, h.dims); r += 1 }
        case t if t >= 4 && t <= 7 =>
          // every collection member restates its own byte order
          val n = bb.getInt
          var i = 0
          while (i < n) { geom(); i += 1 }
        case t => throw new IllegalArgumentException(s"wkb: unsupported geometry type $t")
      }
    }
    geom()
    BBox(xmin, ymin, xmax, ymax)
  }

  /** Even-odd ray-cast point-in-polygon over POLYGON / MULTIPOLYGON (any
    * dialect, any ring count — holes fall out of the even-odd rule; for a
    * valid disjoint MultiPolygon the global crossing parity equals
    * "any member contains"). Half-open edge rule: a point exactly on a
    * boundary edge classifies by crossing parity, not inclusively — callers
    * needing closed-boundary semantics must test edges separately. At scale
    * this is the exact verify step behind a bbox prefilter
    * ([[bboxIntersects]] / a bbox-indexed join), mirroring the
    * filter-then-refine shape every spatial index uses.
    */
  def containsPoint(wkb: Array[Byte], px: Double, py: Double): Boolean = {
    val bb = ByteBuffer.wrap(wkb)
    var inside = false
    def edge(x1: Double, y1: Double, x2: Double, y2: Double): Unit =
      if (((y1 > py) != (y2 > py)) &&
          px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) inside = !inside
    def ring(n: Int, dims: Int): Unit = {
      var firstX = 0.0; var firstY = 0.0
      var x1 = 0.0; var y1 = 0.0
      var i = 0
      while (i < n) {
        val x2 = bb.getDouble; val y2 = bb.getDouble
        var d = 2
        while (d < dims) { bb.getDouble; d += 1 }
        if (i == 0) { firstX = x2; firstY = y2 } else edge(x1, y1, x2, y2)
        x1 = x2; y1 = y2
        i += 1
      }
      // WKB rings close by convention; tolerate an unclosed one
      if (n > 0 && (x1 != firstX || y1 != firstY)) edge(x1, y1, firstX, firstY)
    }
    def geom(): Unit = {
      val h = header(bb)
      h.base match {
        case 3 =>
          val rings = bb.getInt
          var r = 0
          while (r < rings) { ring(bb.getInt, h.dims); r += 1 }
        case 6 =>
          val n = bb.getInt
          var i = 0
          while (i < n) { geom(); i += 1 }
        case t => throw new IllegalArgumentException(
          s"wkb: containsPoint expects POLYGON or MULTIPOLYGON, got type $t")
      }
    }
    geom()
    inside
  }

  def bboxIntersects(wkb: Array[Byte], xmin: Double, ymin: Double, xmax: Double, ymax: Double): Boolean = {
    val b = bbox(wkb)
    b.xmin <= xmax && b.xmax >= xmin && b.ymin <= ymax && b.ymax >= ymin
  }

  /** All rings of a POLYGON / MULTIPOLYGON (outer rings and holes alike,
    * XY only, any dialect) as vertex loops.
    */
  private def areaRings(wkb: Array[Byte]): Seq[Array[(Double, Double)]] =
    areaRingsGrouped(wkb).flatten

  // sign of the cross product (q - p) × (r - p): orientation of r vs line pq
  private def orient(px: Double, py: Double, qx: Double, qy: Double,
      rx: Double, ry: Double): Int = {
    val v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
    if (v > 0) 1 else if (v < 0) -1 else 0
  }

  private def onSegment(px: Double, py: Double, qx: Double, qy: Double,
      rx: Double, ry: Double): Boolean =
    math.min(px, qx) <= rx && rx <= math.max(px, qx) &&
      math.min(py, qy) <= ry && ry <= math.max(py, qy)

  /** Proper + degenerate (collinear-overlap, endpoint-touch) segment
    * intersection — the standard orientation-sign test.
    */
  private def segmentsIntersect(
      ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 != o2 && o3 != o4) true
    else (o1 == 0 && onSegment(ax, ay, bx, by, cx, cy)) ||
      (o2 == 0 && onSegment(ax, ay, bx, by, dx, dy)) ||
      (o3 == 0 && onSegment(cx, cy, dx, dy, ax, ay)) ||
      (o4 == 0 && onSegment(cx, cy, dx, dy, bx, by))
  }

  /** Planar area of a POLYGON / MULTIPOLYGON: per the WKB ring convention,
    * ring 0 of each polygon is the outer boundary and later rings are
    * holes, so area = |shoelace(outer)| − Σ|shoelace(hole)| summed over
    * members. The shoelace accumulates terms x_i·y_{i+1} − x_{i+1}·y_i in
    * ring order, left-associated — an oracle replaying the same chain gets
    * the bit-identical IEEE result (same pattern as the c3 dot product).
    */
  def area(wkb: Array[Byte]): Double = {
    val rings = areaRingsGrouped(wkb)
    var total = 0.0
    rings.foreach { poly =>
      poly.zipWithIndex.foreach { case (ring, idx) =>
        var acc = 0.0
        var i = 0
        while (i < ring.length - 1) {
          acc += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
          i += 1
        }
        // tolerate an unclosed ring: close it implicitly
        if (ring.length > 1 && ring(ring.length - 1) != ring(0)) {
          val l = ring(ring.length - 1)
          acc += l._1 * ring(0)._2 - ring(0)._1 * l._2
        }
        val a = math.abs(acc) / 2
        total += (if (idx == 0) a else -a)
      }
    }
    total
  }

  /** Ring-winding normalization (the ST_MakeValid-lite a geodata ingest
    * runs before handing polygons to spatial SQL): POLYGON rings are
    * rewritten to the OGC right-hand-rule convention — outer ring
    * counterclockwise (positive signed shoelace), holes clockwise — and
    * unclosed rings are closed by repeating the first vertex. The SRID is
    * preserved. Returns (fixed EWKB, ringsRewound, ringsClosed).
    * Self-intersection repair is deliberately out of scope — the validity
    * audit (a11ae) detects those loudly rather than this module guessing
    * a decomposition. POLYGON only; normalize collections member-wise
    * upstream.
    */
  def makeValid(wkb: Array[Byte]): (Array[Byte], Int, Int) = {
    require(geomType(wkb) == "POLYGON",
      s"makeValid: ${geomType(wkb)} unsupported (POLYGON only)")
    val sridIn = srid(wkb)
    val rings = areaRingsGrouped(wkb).head
    // closure repairs counted against the RAW stored ring lengths (the
    // parser closes implicitly, so a length delta IS the repair)
    val rawCounts = ringVertexCounts(wkb)
    var rewound = 0
    var closed = 0
    val fixed = rings.zipWithIndex.map { case (ring, idx) =>
      if (rawCounts(idx) != ring.length) closed += 1
      var acc = 0.0
      var i = 0
      while (i < ring.length - 1) {
        acc += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
        i += 1
      }
      val wantCcw = idx == 0
      if ((wantCcw && acc < 0) || (!wantCcw && acc > 0)) {
        rewound += 1
        ring.reverse.toSeq
      } else ring.toSeq
    }
    val out = polygon(fixed)
    (if (sridIn != 0) setSrid(out, sridIn) else out, rewound, closed)
  }

  /** Outer ring of the first polygon member, as written (closed if the
    * writer closed it) — the decode side of the constructive-geometry ops.
    */
  def outerRing(wkb: Array[Byte]): Seq[(Double, Double)] =
    areaRingsGrouped(wkb).head.head.toSeq

  /** Ring count of a Polygon (outer + holes) or total rings of a
    * MultiPolygon — the structural evidence the OSM relation-assembly
    * oracle checks without decoding hole coordinates.
    */
  def numRings(wkb: Array[Byte]): Int = areaRingsGrouped(wkb).map(_.length).sum

  /** Ordered vertex path of a linear feature: a LineString's points, or a
    * Polygon's outer ring (closing vertex included) — the decode twin of
    * [[lineString]]/[[polygon]], used by the OSM way assembly checks to
    * prove coordinates survive the build bit-exact. Loud on any other
    * geometry type.
    */
  /** Every part's vertices for LineString/MultiLineString — the decode the
    * OSM route assembly gate rides (one inner seq per part, stored order).
    */
  def linePartsPoints(wkb: Array[Byte]): Seq[Seq[(Double, Double)]] = {
    val bb = ByteBuffer.wrap(wkb)
    def lineOf(h: Header): Seq[(Double, Double)] = {
      val n = bb.getInt
      (0 until n).map { _ =>
        val x = bb.getDouble; val y = bb.getDouble
        (0 until h.dims - 2).foreach(_ => bb.getDouble)
        (x, y)
      }
    }
    val h = header(bb)
    h.base match {
      case 2 => Seq(lineOf(h))
      case 5 =>
        val n = bb.getInt
        (0 until n).map { _ =>
          val mh = header(bb) // each member carries its own byte-order byte
          require(mh.base == 2, s"wkb: MultiLineString member type ${mh.base}")
          lineOf(mh)
        }
      case other =>
        throw new IllegalArgumentException(
          s"wkb: linePartsPoints expects LineString/MultiLineString, got type $other")
    }
  }

  def pathPoints(wkb: Array[Byte]): Seq[(Double, Double)] = {
    val bb = ByteBuffer.wrap(wkb)
    val h = header(bb)
    h.base match {
      case 2 => // LineString
        val n = bb.getInt
        (0 until n).map { _ =>
          val x = bb.getDouble; val y = bb.getDouble
          (0 until h.dims - 2).foreach(_ => bb.getDouble)
          (x, y)
        }
      case 3 => // Polygon — outer ring, closing vertex kept
        val nRings = bb.getInt
        require(nRings >= 1, "wkb: polygon with zero rings")
        val n = bb.getInt
        (0 until n).map { _ =>
          val x = bb.getDouble; val y = bb.getDouble
          (0 until h.dims - 2).foreach(_ => bb.getDouble)
          (x, y)
        }
      case other =>
        throw new IllegalArgumentException(
          s"wkb: pathPoints expects LineString/Polygon, got type $other")
    }
  }

  /** Constructive geometry: Sutherland–Hodgman clip of the polygon's outer
    * ring against the axis-aligned rectangle [x0,x1]×[y0,y1], producing a
    * NEW polygon WKB (the first geometry-producing op beyond hull/simplify
    * — closes the r10 verdict's "constructive geometry" gap). Null when
    * the intersection is empty.
    *
    * Determinism contract (oracle-replayable): stages run in the fixed
    * order left(x≥x0) → right(x≤x1) → bottom(y≥y0) → top(y≤y1); each
    * stage walks directed edges (v, w=cyclic next) emitting the boundary
    * crossing first (iff inside(v) ≠ inside(w)) and then w (iff w is
    * inside) — the classic SH order. Crossings use the literal IEEE
    * chains
    *   vertical  : (b, v.y + (b − v.x)/(w.x − v.x) · (w.y − v.y))
    *   horizontal: (v.x + (b − v.y)/(w.y − v.y) · (w.x − v.x), b)
    * which the a11x oracle writes out verbatim (the a11g shoelace replay
    * pattern), so every output vertex is bit-identical across engines.
    * The divisor is never zero: an edge can only cross a line it is not
    * parallel to. Scale: per-row map-side work, no state.
    */
  def clipPolygonRect(wkb: Array[Byte], x0: Double, y0: Double,
      x1: Double, y1: Double): Array[Byte] = {
    val ring0 = areaRingsGrouped(wkb).head.head
    var pts: IndexedSeq[(Double, Double)] =
      if (ring0.length > 1 && ring0(ring0.length - 1) == ring0(0))
        ring0.toIndexedSeq.dropRight(1)
      else ring0.toIndexedSeq
    def pass(in: IndexedSeq[(Double, Double)], vertical: Boolean,
        b: Double, keepGE: Boolean): IndexedSeq[(Double, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val n = in.length
      def inside(p: (Double, Double)): Boolean = {
        val c = if (vertical) p._1 else p._2
        if (keepGE) c >= b else c <= b
      }
      var i = 0
      while (i < n) {
        val v = in(i)
        val w = in((i + 1) % n)
        if (inside(v) != inside(w)) {
          if (vertical) out += ((b, v._2 + (b - v._1) / (w._1 - v._1) * (w._2 - v._2)))
          else out += ((v._1 + (b - v._2) / (w._2 - v._2) * (w._1 - v._1), b))
        }
        if (inside(w)) out += w
        i += 1
      }
      out.toIndexedSeq
    }
    pts = pass(pts, vertical = true, x0, keepGE = true)
    if (pts.nonEmpty) pts = pass(pts, vertical = true, x1, keepGE = false)
    if (pts.nonEmpty) pts = pass(pts, vertical = false, y0, keepGE = true)
    if (pts.nonEmpty) pts = pass(pts, vertical = false, y1, keepGE = false)
    if (pts.isEmpty) null else polygon(Seq(pts :+ pts.head))
  }

  /** Constructive geometry, concave edition: Weiler–Atherton clip of the
    * polygon's outer ring (CCW, may be CONCAVE) against the axis-aligned
    * rectangle [x0,x1]×[y0,y1], returning the list of CONNECTED PIECES as
    * separate polygon WKBs — what [[clipPolygonRect]]'s Sutherland–
    * Hodgman cannot express: SH welds a concave subject's disconnected
    * intersection components together with zero-area bridge edges along
    * the window boundary (area-correct, topology-wrong), while this
    * traversal emits each component as its own simple ring. Closes the
    * r11 verdict's "non-convex constructive geometry" gap.
    *
    * Algorithm (classic Weiler–Atherton, specialised to a convex window):
    *  1. every directed subject edge (v, w) is intersected with the four
    *     boundary LINES; a crossing counts only if it lies strictly on
    *     the boundary SEGMENT, and uses the pinned IEEE chains of
    *     [[clipPolygonRect]] — vertical: (b, v.y + (b−v.x)/(w.x−v.x)·
    *     (w.y−v.y)), horizontal: (v.x + (b−v.y)/(w.y−v.y)·(w.x−v.x), b)
    *     — so every emitted coordinate is bit-deterministic and every
    *     axis-crossing coordinate is EXACTLY the window bound;
    *  2. crossings are threaded into the subject's vertex cycle in edge/t
    *     order and classified entry/exit by alternation from the first
    *     vertex's insideness (a straight edge meets a convex boundary at
    *     most twice, so per-edge alternation is exact);
    *  3. the window cycle is the four corners plus all crossings, ordered
    *     by CCW perimeter parameter;
    *  4. each unused entry starts a piece: follow the subject cycle to
    *     the next crossing (an exit), switch to the window cycle
    *     (collecting any corners passed) to the next crossing (an
    *     entry), repeat until the walk returns to the start.
    * With both cycles CCW, every piece comes out CCW.
    *
    * Degeneracy contract (loud, not silent): subject vertices exactly ON
    * a boundary line, crossings exactly through a window corner, and
    * coincident crossing points (subject self-touch on the boundary) all
    * `require`-throw — the caller perturbs the window, exactly like
    * [[bufferSquare]]'s non-convex rejection. No-crossing cases are
    * handled exactly: subject inside window → the subject; window inside
    * subject ([[containsPoint]] on a corner) → the window; else empty.
    *
    * Scale: per-feature map-side work, no state — same 100 TB shape as
    * every a11 constructive op.
    */
  def clipPolygonRectWA(wkb: Array[Byte], x0: Double, y0: Double,
      x1: Double, y1: Double): Seq[Array[Byte]] = {
    val ring0 = areaRingsGrouped(wkb).head.head
    val ptsRaw: IndexedSeq[(Double, Double)] =
      if (ring0.length > 1 && ring0(ring0.length - 1) == ring0(0))
        ring0.toIndexedSeq.dropRight(1)
      else ring0.toIndexedSeq
    // the entry/exit alternation below needs a CCW subject; normalize a
    // CW ring instead of throwing (orientation is presentation, not shape)
    val signed2 = ptsRaw.indices.map { j =>
      val v = ptsRaw(j); val u = ptsRaw((j + 1) % ptsRaw.length)
      v._1 * u._2 - u._1 * v._2
    }.sum
    val pts = if (signed2 < 0) ptsRaw.reverse else ptsRaw
    val n = pts.length
    require(n >= 3, s"clipPolygonRectWA: ring needs >= 3 vertices, got $n")
    pts.foreach { p =>
      require(p._1 != x0 && p._1 != x1 && p._2 != y0 && p._2 != y1,
        s"clipPolygonRectWA: subject vertex exactly on a window boundary line at $p — " +
          "perturb the window (degenerate tangency is not supported)")
    }
    def inside(p: (Double, Double)): Boolean =
      p._1 > x0 && p._1 < x1 && p._2 > y0 && p._2 < y1
    val w = x1 - x0
    val h = y1 - y0
    // CCW perimeter parameter: bottom → right → top → left
    def perim(px: Double, py: Double): Double =
      if (py == y0) px - x0
      else if (px == x1) w + (py - y0)
      else if (py == y1) w + h + (x1 - px)
      else w + h + w + (y1 - py)

    final case class Cross(x: Double, y: Double, entry: Boolean, s: Double)
    val crosses = scala.collection.mutable.ArrayBuffer.empty[Cross]
    // subject cycle: (x, y, crossIdx); crossIdx = -1 for original vertices
    val subj = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int)]
    var curInside = inside(pts(0))
    var i = 0
    while (i < n) {
      val v = pts(i)
      val vw = pts((i + 1) % n)
      subj += ((v._1, v._2, -1))
      // candidate crossings of this edge with the four boundary segments
      var cand = List.empty[(Double, Double, Double)] // (t, x, y)
      def vert(b: Double): Unit =
        if ((v._1 < b) != (vw._1 < b)) {
          val t = (b - v._1) / (vw._1 - v._1)
          val cy = v._2 + (b - v._1) / (vw._1 - v._1) * (vw._2 - v._2)
          require(cy != y0 && cy != y1,
            s"clipPolygonRectWA: crossing exactly through a window corner at ($b, $cy)")
          if (cy > y0 && cy < y1) cand ::= ((t, b, cy))
        }
      def horiz(b: Double): Unit =
        if ((v._2 < b) != (vw._2 < b)) {
          val t = (b - v._2) / (vw._2 - v._2)
          val cx = v._1 + (b - v._2) / (vw._2 - v._2) * (vw._1 - v._1)
          require(cx != x0 && cx != x1,
            s"clipPolygonRectWA: crossing exactly through a window corner at ($cx, $b)")
          if (cx > x0 && cx < x1) cand ::= ((t, cx, b))
        }
      vert(x0); vert(x1); horiz(y0); horiz(y1)
      cand.sortBy(_._1).foreach { case (_, cx, cy) =>
        val entry = !curInside
        curInside = !curInside
        subj += ((cx, cy, crosses.length))
        crosses += Cross(cx, cy, entry, perim(cx, cy))
      }
      require(curInside == inside(vw),
        s"clipPolygonRectWA: inconsistent crossing parity on edge $v -> $vw")
      i += 1
    }

    def rectRing: IndexedSeq[(Double, Double)] =
      IndexedSeq((x0, y0), (x1, y0), (x1, y1), (x0, y1))
    if (crosses.isEmpty) {
      return if (inside(pts(0))) Seq(polygon(Seq(pts :+ pts.head)))
      else if (containsPoint(wkb, x0, y0)) Seq(polygon(Seq(rectRing :+ rectRing.head)))
      else Seq.empty
    }
    require(crosses.map(c => (c.x, c.y)).distinct.size == crosses.size,
      "clipPolygonRectWA: coincident boundary crossings (subject self-touch on the window edge)")

    // window cycle: corners + crossings by perimeter parameter
    val winNodes: IndexedSeq[(Double, Double, Int)] =
      (IndexedSeq((x0, y0, -1), (x1, y0, -1), (x1, y1, -1), (x0, y1, -1)).map(c =>
        (perim(c._1, c._2), c)) ++
        crosses.zipWithIndex.map { case (c, ci) => (c.s, (c.x, c.y, ci)) })
        .sortBy(_._1).map(_._2)
    val subjPosOf = new Array[Int](crosses.length)
    subj.zipWithIndex.foreach { case ((_, _, ci), pos) => if (ci >= 0) subjPosOf(ci) = pos }
    val winPosOf = new Array[Int](crosses.length)
    winNodes.zipWithIndex.foreach { case ((_, _, ci), pos) => if (ci >= 0) winPosOf(ci) = pos }

    val used = new Array[Boolean](crosses.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val maxSteps = 4 * (subj.length + winNodes.length) + 8
    var ci = 0
    while (ci < crosses.length) {
      if (crosses(ci).entry && !used(ci)) {
        val piece = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        used(ci) = true
        piece += ((crosses(ci).x, crosses(ci).y))
        var cur = ci
        var onSubject = true
        var closed = false
        var steps = 0
        var pos = subjPosOf(cur)
        while (!closed) {
          steps += 1
          require(steps <= maxSteps, "clipPolygonRectWA: traversal failed to close (degenerate input)")
          if (onSubject) {
            pos = (pos + 1) % subj.length
            val (px, py, pc) = subj(pos)
            if (pc >= 0) {
              require(!crosses(pc).entry,
                "clipPolygonRectWA: expected an exit crossing on the subject walk")
              piece += ((px, py))
              cur = pc
              onSubject = false
              pos = winPosOf(cur)
            } else piece += ((px, py))
          } else {
            pos = (pos + 1) % winNodes.length
            val (px, py, pc) = winNodes(pos)
            if (pc >= 0) {
              require(crosses(pc).entry,
                "clipPolygonRectWA: expected an entry crossing on the window walk")
              if (pc == ci) closed = true
              else {
                used(pc) = true
                piece += ((px, py))
                cur = pc
                onSubject = true
                pos = subjPosOf(cur)
              }
            } else piece += ((px, py))
          }
        }
        out += polygon(Seq(piece.toIndexedSeq :+ piece.head))
      }
      ci += 1
    }
    out.toSeq
  }

  /** Constructive geometry, general edition: the exact intersection of
    * TWO arbitrary simple polygons' outer rings — both may be CONCAVE —
    * returning the connected pieces as separate polygon WKBs. This is the
    * `ST_Intersection(poly, poly)` a PostGIS user reaches for most, and
    * the one case neither [[clipPolygonRectWA]] (rect window only) nor
    * [[clipPolygonConvex]] (convex clip only) covers: concave∩concave.
    *
    * Algorithm (Greiner–Hormann, intersection phase only — both operands
    * normalized CCW):
    *  1. every directed A-edge (v, w) is tested against every directed
    *     B-edge (p, q) via the parametric solve
    *       d = r×s,  t = (p−v)×s / d,  u = (p−v)×r / d   (r = w−v, s = q−p)
    *     — a crossing counts only when STRICTLY interior to both segments
    *     (0 < t < 1 and 0 < u < 1), and its coordinate is the single
    *     chain (v.x + t·r.x, v.y + t·r.y): bit-deterministic, computed
    *     once, shared by both cycles;
    *  2. crossings thread into A's vertex cycle in (edge, t) order and
    *     into B's in (edge, u) order; entry/exit classifies by
    *     alternation from A's first vertex's insideness in B, with the
    *     parity re-checked at EVERY original A-vertex ([[containsPoint]]
    *     — a violated check refuses rather than emitting garbage);
    *  3. each unused entry starts a piece: walk A's cycle to the next
    *     crossing (must be an exit), switch to B's cycle (collecting B
    *     vertices passed) to the next crossing (must be an entry), repeat
    *     until the walk returns to its start. Both cycles CCW → every
    *     piece CCW.
    *
    * Degeneracy contract (loud, not silent — the [[clipPolygonRectWA]]
    * discipline): a vertex of one polygon exactly ON the other's edge
    * (t or u lands exactly on {0,1} while the other parameter is in
    * range), collinear overlapping edges (d = 0 with zero cross and
    * overlapping spans), coincident crossing points, and inconsistent
    * crossing parity all `require`-throw — the caller perturbs an
    * operand. No-crossing cases are exact: A inside B → A; B inside A →
    * B; else empty.
    *
    * Scale: per-feature map-side work (O(|A|·|B|) edge pairs on rings of
    * tens of vertices), no state — the same 100 TB shape as every a11
    * constructive op; the operator composes with a bbox-join prefilter
    * exactly like [[containsPoint]]'s filter-then-refine note.
    */
  def intersectPolygons(aWkb: Array[Byte], bWkb: Array[Byte]): Seq[Array[Byte]] = {
    val ctx = overlayCtx(aWkb, bWkb, "intersectPolygons")
    if (ctx.crosses.isEmpty) {
      if (containsPoint(bWkb, ctx.a(0)._1, ctx.a(0)._2))
        Seq(polygon(Seq(ctx.a :+ ctx.a.head)))
      else if (containsPoint(aWkb, ctx.b(0)._1, ctx.b(0)._2))
        Seq(polygon(Seq(ctx.b :+ ctx.b.head)))
      else Seq.empty
    } else
      overlayWalk(ctx, "intersectPolygons", startEntry = true, bStep = 1)
        .map(r => polygon(Seq(r :+ r.head)))
  }

  /** Boolean overlay #2: the exact UNION of two simple polygons' outer
    * rings — same machinery as [[intersectPolygons]] (shared
    * [[overlayCtx]]), different walk: pieces start at EXIT crossings and
    * both boundaries are followed where they lie OUTSIDE the other
    * polygon. With crossings present the union of two overlapping simple
    * polygons is one connected region whose boundary cycles are the
    * single CCW outer ring plus zero or more CW cycles — the HOLES two
    * interlocking concave shapes enclose (teeth through rows trap empty
    * cells); the result is one polygon WKB with outer + hole rings (the
    * hole-CW convention [[area]] consumes). No-crossing arms: containment
    * collapses to the container, disjoint operands return a
    * MultiPolygon. Degeneracy contract identical to intersect.
    */
  def unionPolygons(aWkb: Array[Byte], bWkb: Array[Byte]): Array[Byte] = {
    val ctx = overlayCtx(aWkb, bWkb, "unionPolygons")
    if (ctx.crosses.isEmpty) {
      if (containsPoint(bWkb, ctx.a(0)._1, ctx.a(0)._2))
        polygon(Seq(ctx.b :+ ctx.b.head))
      else if (containsPoint(aWkb, ctx.b(0)._1, ctx.b(0)._2))
        polygon(Seq(ctx.a :+ ctx.a.head))
      else multi(6, Seq(polygon(Seq(ctx.a :+ ctx.a.head)),
        polygon(Seq(ctx.b :+ ctx.b.head))))
    } else {
      val rings = overlayWalk(ctx, "unionPolygons", startEntry = false, bStep = 1)
      val (outer, holes) = rings.partition(r => signed2Of(r) > 0)
      require(outer.length == 1,
        s"unionPolygons: ${outer.length} CCW cycles — a crossing union must " +
          "have exactly one connected outer boundary")
      polygon((outer.head :+ outer.head.head) +: holes.map(h => h :+ h.head))
    }
  }

  /** Boolean overlay #3: the exact DIFFERENCE A \\ B of two simple
    * polygons' outer rings — the walk starts at EXIT crossings, follows
    * A where it lies outside B, and follows B BACKWARD where it lies
    * inside A (the reversed clip orientation keeps the retained region
    * on the left, so every piece comes out a simple CCW ring). Pieces of
    * a simple-minus-simple difference never carry holes (that would need
    * a hole in B) — EXCEPT the no-crossing containment arm, where B
    * strictly inside A yields A with B (reversed) as its hole. A inside
    * B is empty; disjoint returns A unchanged. Degeneracy contract
    * identical to intersect.
    */
  def differencePolygons(aWkb: Array[Byte], bWkb: Array[Byte]): Seq[Array[Byte]] = {
    val ctx = overlayCtx(aWkb, bWkb, "differencePolygons")
    if (ctx.crosses.isEmpty) {
      if (containsPoint(bWkb, ctx.a(0)._1, ctx.a(0)._2)) Seq.empty
      else if (containsPoint(aWkb, ctx.b(0)._1, ctx.b(0)._2)) {
        val hole = ctx.b.reverse
        Seq(polygon(Seq(ctx.a :+ ctx.a.head, hole :+ hole.head)))
      } else Seq(polygon(Seq(ctx.a :+ ctx.a.head)))
    } else {
      val rings = overlayWalk(ctx, "differencePolygons", startEntry = false, bStep = -1)
      rings.foreach(r => require(signed2Of(r) > 0,
        "differencePolygons: CW cycle in a simple-minus-simple difference"))
      rings.map(r => polygon(Seq(r :+ r.head)))
    }
  }

  /** Boolean overlay #4: symmetric difference = (A \\ B) disjoint-union
    * (B \\ A) — the two difference walks cover it exactly, and their
    * pieces are disjoint by construction.
    */
  def symDifferencePolygons(aWkb: Array[Byte], bWkb: Array[Byte]): Seq[Array[Byte]] =
    differencePolygons(aWkb, bWkb) ++ differencePolygons(bWkb, aWkb)

  /** Doubled signed shoelace of an UNCLOSED ring (+ = CCW). */
  private def signed2Of(r: IndexedSeq[(Double, Double)]): Double =
    r.indices.map { j =>
      val v = r(j); val u = r((j + 1) % r.length)
      v._1 * u._2 - u._1 * v._2
    }.sum

  /** One overlay crossing on both cycles. */
  private final case class OverlayCross(x: Double, y: Double, entry: Boolean)

  /** Shared Greiner-Hormann context: both rings CCW-normalized, every
    * proper pairwise crossing computed once and threaded into BOTH
    * vertex cycles, entry/exit classified on A with per-vertex parity
    * re-checks. `crosses` empty = no boundary crossings (callers handle
    * the containment / disjoint arms).
    */
  private final case class OverlayCtx(
      a: IndexedSeq[(Double, Double)], b: IndexedSeq[(Double, Double)],
      crosses: IndexedSeq[OverlayCross],
      subj: IndexedSeq[(Double, Double, Int)],
      win: IndexedSeq[(Double, Double, Int)],
      subjPosOf: Array[Int], winPosOf: Array[Int])

  private def overlayCtx(aWkb: Array[Byte], bWkb: Array[Byte],
      op: String): OverlayCtx = {
    def baseRing(wkb: Array[Byte], name: String): IndexedSeq[(Double, Double)] = {
      // the walk operates on ONE simple ring per operand, but the
      // insideness tests ([[containsPoint]]) are even-odd over ALL rings
      // — a silently-dropped hole or extra member would make the two
      // disagree and misclassify entry/exit without any require firing.
      // Refuse loudly instead (decompose multis / subtract holes first).
      val grouped = areaRingsGrouped(wkb)
      require(grouped.length == 1 && grouped.head.length == 1,
        s"$op: $name has ${grouped.length} polygon member(s) with " +
          s"${grouped.map(_.length).sum} ring(s) — operands must be one " +
          "simple outer ring (no holes, no multi members)")
      val ring0 = grouped.head.head
      val raw: IndexedSeq[(Double, Double)] =
        if (ring0.length > 1 && ring0(ring0.length - 1) == ring0(0))
          ring0.toIndexedSeq.dropRight(1)
        else ring0.toIndexedSeq
      require(raw.length >= 3, s"$op: $name ring needs >= 3 vertices, got ${raw.length}")
      if (signed2Of(raw) < 0) raw.reverse else raw
    }
    val a = baseRing(aWkb, "A")
    val b = baseRing(bWkb, "B")
    val nA = a.length
    val nB = b.length

    // one crossing: coordinate + position on each cycle
    final case class Cross(x: Double, y: Double, aEdge: Int, t: Double,
        bEdge: Int, u: Double, entry: Boolean)
    // collect per-A-edge candidate crossings first (classification needs
    // them in t-order along the A walk)
    val perAEdge = Array.fill(nA)(
      scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Int, Double)])
    var i = 0
    while (i < nA) {
      val v = a(i); val w = a((i + 1) % nA)
      val rx = w._1 - v._1; val ry = w._2 - v._2
      var j = 0
      while (j < nB) {
        val p = b(j); val q = b((j + 1) % nB)
        val sx = q._1 - p._1; val sy = q._2 - p._2
        val d = rx * sy - ry * sx
        val ex = p._1 - v._1; val ey = p._2 - v._2
        if (d == 0.0) {
          // parallel; collinear + overlapping spans is a shared-edge
          // degeneracy this construction refuses
          if (ex * ry - ey * rx == 0.0) {
            val (alo, ahi) = if (rx != 0.0) (math.min(v._1, w._1), math.max(v._1, w._1))
              else (math.min(v._2, w._2), math.max(v._2, w._2))
            val (blo, bhi) = if (rx != 0.0) (math.min(p._1, q._1), math.max(p._1, q._1))
              else (math.min(p._2, q._2), math.max(p._2, q._2))
            require(ahi < blo || bhi < alo,
              s"$op: collinear overlapping edges A#$i / B#$j — " +
                "perturb an operand (shared boundary segments are not supported)")
          }
        } else {
          val t = (ex * sy - ey * sx) / d
          val u = (ex * ry - ey * rx) / d
          if (t > 0.0 && t < 1.0 && u > 0.0 && u < 1.0)
            perAEdge(i) += ((t, v._1 + t * rx, v._2 + t * ry, j, u))
          else require(
            !((t == 0.0 || t == 1.0) && u >= 0.0 && u <= 1.0) &&
              !((u == 0.0 || u == 1.0) && t >= 0.0 && t <= 1.0),
            s"$op: vertex-on-edge tangency at A#$i / B#$j " +
              s"(t=$t, u=$u) — perturb an operand")
        }
        j += 1
      }
      i += 1
    }

    def insideB(pt: (Double, Double)): Boolean = containsPoint(bWkb, pt._1, pt._2)
    val crosses = scala.collection.mutable.ArrayBuffer.empty[Cross]
    // A cycle: (x, y, crossIdx); crossIdx = -1 for original vertices
    val subj = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int)]
    var curInside = insideB(a(0))
    i = 0
    while (i < nA) {
      val v = a(i)
      subj += ((v._1, v._2, -1))
      perAEdge(i).sortBy(_._1).foreach { case (t, cx, cy, bEdge, u) =>
        val entry = !curInside
        curInside = !curInside
        subj += ((cx, cy, crosses.length))
        crosses += Cross(cx, cy, i, t, bEdge, u, entry)
      }
      require(curInside == insideB(a((i + 1) % nA)),
        s"$op: inconsistent crossing parity on A edge $i — " +
          "degenerate tangency; perturb an operand")
      i += 1
    }

    if (crosses.isEmpty)
      return OverlayCtx(a, b, IndexedSeq.empty, IndexedSeq.empty,
        IndexedSeq.empty, Array.empty, Array.empty)
    require(crosses.map(c => (c.x, c.y)).distinct.size == crosses.size,
      s"$op: coincident crossing points — perturb an operand")

    // B cycle: vertices + crossings in (edge, u) order
    val winNodes: IndexedSeq[(Double, Double, Int)] =
      (b.indices.map(j => ((j.toDouble, -1.0), (b(j)._1, b(j)._2, -1))) ++
        crosses.zipWithIndex.map { case (c, ci) =>
          ((c.bEdge.toDouble, c.u), (c.x, c.y, ci))
        }).sortBy(_._1).map(_._2)
    val subjArr = subj.toIndexedSeq
    val subjPosOf = new Array[Int](crosses.length)
    subjArr.zipWithIndex.foreach { case ((_, _, ci), pos) => if (ci >= 0) subjPosOf(ci) = pos }
    val winPosOf = new Array[Int](crosses.length)
    winNodes.zipWithIndex.foreach { case ((_, _, ci), pos) => if (ci >= 0) winPosOf(ci) = pos }
    OverlayCtx(a, b, crosses.map(c => OverlayCross(c.x, c.y, c.entry)).toIndexedSeq,
      subjArr, winNodes, subjPosOf, winPosOf)
  }

  /** The generic overlay traversal: pieces start at crossings whose
    * entry flag equals `startEntry` (intersection: entries; union and
    * difference: exits); the A cycle always walks forward, the B cycle
    * walks `bStep` = +1 (intersection/union) or −1 (difference, the
    * reversed clip). Each A walk must end at a `!startEntry` crossing
    * and each B walk at a `startEntry` crossing — violated expectations
    * refuse loudly. Returns UNCLOSED rings.
    */
  private def overlayWalk(ctx: OverlayCtx, op: String, startEntry: Boolean,
      bStep: Int): Seq[IndexedSeq[(Double, Double)]] = {
    val crosses = ctx.crosses
    val subj = ctx.subj
    val winNodes = ctx.win
    val used = new Array[Boolean](crosses.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[(Double, Double)]]
    val maxSteps = 4 * (subj.length + winNodes.length) + 8
    var ci = 0
    while (ci < crosses.length) {
      if (crosses(ci).entry == startEntry && !used(ci)) {
        val piece = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        used(ci) = true
        piece += ((crosses(ci).x, crosses(ci).y))
        var cur = ci
        var onSubject = true
        var closed = false
        var steps = 0
        var pos = ctx.subjPosOf(cur)
        while (!closed) {
          steps += 1
          require(steps <= maxSteps,
            s"$op: traversal failed to close (degenerate input)")
          if (onSubject) {
            pos = (pos + 1) % subj.length
            val (px, py, pc) = subj(pos)
            if (pc >= 0) {
              require(crosses(pc).entry == !startEntry,
                s"$op: unexpected crossing type on the A walk")
              piece += ((px, py))
              cur = pc
              onSubject = false
              pos = ctx.winPosOf(cur)
            } else piece += ((px, py))
          } else {
            pos = (pos + bStep + winNodes.length) % winNodes.length
            val (px, py, pc) = winNodes(pos)
            if (pc >= 0) {
              require(crosses(pc).entry == startEntry,
                s"$op: unexpected crossing type on the B walk")
              if (pc == ci) closed = true
              else {
                used(pc) = true
                piece += ((px, py))
                cur = pc
                onSubject = true
                pos = ctx.subjPosOf(cur)
              }
            } else piece += ((px, py))
          }
        }
        out += piece.toIndexedSeq
      }
      ci += 1
    }
    out.toSeq
  }

  /** Constructive geometry #3: Sutherland–Hodgman clip of the polygon's
    * outer ring against an arbitrary CONVEX clip polygon (CCW ring) —
    * convex∩convex and, by ring choice, convex∩simple intersection as a
    * NEW polygon WKB; null when empty. With the shoelace this also yields
    * boolean-op AREAS: area(A∪B) = area(A) + area(B) − area(A∩B), the
    * a11z oracle's inclusion–exclusion replay.
    *
    * [[clipPolygonRect]] stays separate on purpose: its axis-aligned
    * crossings pin the coordinate to the boundary EXACTLY (x = b), while
    * the general half-plane chain below computes both coordinates — the
    * two produce different (each internally bit-deterministic) IEEE
    * results on the shared rectangle case, and each oracle replays its
    * own chain verbatim.
    *
    * Determinism contract: edges are processed in clip-ring order; per
    * half-plane (e1 → e2, inside = cross ≥ 0) each directed subject edge
    * (v, w) emits the crossing first iff inside(v) ≠ inside(w), then w
    * iff inside(w), with the literal chains
    *   cv = ex·(v.y − e1.y) − ey·(v.x − e1.x)      (ex = e2.x − e1.x …)
    *   t  = cv / (cv − cw)                          (cw same chain for w)
    *   p  = (v.x + t·(w.x − v.x), v.y + t·(w.y − v.y))
    * replayed verbatim by the oracle. cv − cw ≠ 0 whenever the inside
    * flags differ (opposite signs, or one zero and one strict). Scale:
    * per-row map-side work, no state.
    */
  def clipPolygonConvex(wkb: Array[Byte],
      clip: IndexedSeq[(Double, Double)]): Array[Byte] = {
    require(clip.length >= 3, "clipPolygonConvex: clip ring needs >= 3 vertices")
    // loud convexity + orientation check on the clip constant (CCW, all
    // consecutive crosses >= 0) — a reflex clip ring would silently
    // produce garbage half-planes
    var i = 0
    while (i < clip.length) {
      val p = clip(i)
      val q = clip((i + 1) % clip.length)
      val s = clip((i + 2) % clip.length)
      val cr = (q._1 - p._1) * (s._2 - q._2) - (q._2 - p._2) * (s._1 - q._1)
      require(cr >= 0, s"clipPolygonConvex: clip ring reflex/CW at vertex ${(i + 1) % clip.length}")
      i += 1
    }
    val ring0 = areaRingsGrouped(wkb).head.head
    var pts: IndexedSeq[(Double, Double)] =
      if (ring0.length > 1 && ring0(ring0.length - 1) == ring0(0))
        ring0.toIndexedSeq.dropRight(1)
      else ring0.toIndexedSeq
    var k = 0
    while (k < clip.length && pts.nonEmpty) {
      val e1 = clip(k)
      val e2 = clip((k + 1) % clip.length)
      val ex = e2._1 - e1._1
      val ey = e2._2 - e1._2
      def cr(p: (Double, Double)): Double = ex * (p._2 - e1._2) - ey * (p._1 - e1._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val n = pts.length
      var j = 0
      while (j < n) {
        val v = pts(j)
        val w = pts((j + 1) % n)
        val cv = cr(v)
        val cw = cr(w)
        if ((cv >= 0) != (cw >= 0)) {
          val t = cv / (cv - cw)
          out += ((v._1 + t * (w._1 - v._1), v._2 + t * (w._2 - v._2)))
        }
        if (cw >= 0) out += w
        j += 1
      }
      pts = out.toIndexedSeq
      k += 1
    }
    if (pts.isEmpty) null else polygon(Seq(pts :+ pts.head))
  }

  /** Constructive geometry #2: the L∞ buffer — Minkowski sum of a CONVEX
    * polygon (or point) with the axis-aligned square [−r,r]², producing a
    * NEW polygon WKB. This is the exact-arithmetic member of the
    * ST_Buffer family: a Euclidean buffer needs arc discretization (an
    * approximation knob), while the square buffer's output vertices are
    * each ONE IEEE add of an input vertex and a square corner — so the
    * whole construction replays bit-for-bit in SQL (the a11y oracle
    * writes the same sums).
    *
    * Algorithm: classic convex Minkowski merge — both rings rotated to
    * start at their (min y, then min x) vertex, then edges merged in
    * polar-angle order via the cross-product test; each emitted vertex is
    * `a[i] + b[j]` (never an accumulated edge walk, which would compound
    * rounding). Equal-angle edges (cross = 0, e.g. an axis-aligned input
    * edge parallel to a square side) advance BOTH pointers, emitting the
    * combined edge once — minimal vertex count, deterministically.
    *
    * Input contract (loud, never silently wrong): the outer ring must be
    * convex — non-convex input throws (decompose first; the general
    * non-convex sum has holes/self-intersections this engine does not
    * construct). CW rings are normalized to CCW, so output orientation is
    * always CCW. Scale: per-row map-side work, no state.
    */
  /** POINT (1-vertex seq) or convex-POLYGON outer ring, CCW-normalized and
    * unclosed — the shared input contract of the buffer constructors.
    * `strict = true` additionally rejects collinear consecutive edges
    * (cross = 0): the Euclidean buffer's per-corner arc sweep is derived
    * from the edge-normal angle difference, and a zero-angle corner would
    * make the fp sweep sign ambiguous (a silently-wrong near-full-circle
    * arc) — never silently wrong.
    */
  private def convexCcwBase(
      wkb: Array[Byte], op: String, strict: Boolean): IndexedSeq[(Double, Double)] =
    header(ByteBuffer.wrap(wkb)).base match {
      case 1 =>
        val bb = ByteBuffer.wrap(wkb); header(bb)
        val x = bb.getDouble; val y = bb.getDouble
        IndexedSeq((x, y))
      case 3 =>
        val ring0 = areaRingsGrouped(wkb).head.head
        val open =
          if (ring0.length > 1 && ring0(ring0.length - 1) == ring0(0))
            ring0.toIndexedSeq.dropRight(1)
          else ring0.toIndexedSeq
        // normalize to CCW (positive doubled shoelace)
        var a2 = 0.0
        var i = 0
        while (i < open.length) {
          val v = open(i); val w = open((i + 1) % open.length)
          a2 += v._1 * w._2 - w._1 * v._2
          i += 1
        }
        val ccw = if (a2 < 0) open.reverse else open
        // convexity: every consecutive-edge cross must be >= 0 (> 0 strict)
        i = 0
        while (i < ccw.length) {
          val p = ccw(i)
          val q = ccw((i + 1) % ccw.length)
          val s = ccw((i + 2) % ccw.length)
          val cr = (q._1 - p._1) * (s._2 - q._2) - (q._2 - p._2) * (s._1 - q._1)
          if (cr < 0) throw new IllegalArgumentException(
            s"$op: non-convex outer ring (reflex at vertex ${(i + 1) % ccw.length}) — " +
              "decompose to convex parts first")
          if (strict && cr == 0) throw new IllegalArgumentException(
            s"$op: collinear consecutive edges at vertex ${(i + 1) % ccw.length} — " +
              "drop the redundant vertex first")
          i += 1
        }
        ccw
      case other => throw new IllegalArgumentException(
        s"$op: POINT or POLYGON required, got type $other")
    }

  def bufferSquare(wkb: Array[Byte], r: Double): Array[Byte] = {
    require(r > 0, s"bufferSquare: r must be positive, got $r")
    val square = IndexedSeq((-r, -r), (r, -r), (r, r), (-r, r))
    val base = convexCcwBase(wkb, "bufferSquare", strict = false)
    if (base.length == 1) {
      val (x, y) = base.head
      val ring = square.map { case (dx, dy) => (x + dx, y + dy) }
      return polygon(Seq(ring :+ ring.head))
    }
    val out = minkowskiConvex(base, square)
    polygon(Seq(out :+ out.head))
  }

  /** Constructive geometry #2b: the arc-discretized EUCLIDEAN buffer — the
    * PostGIS-ST_Buffer-shaped member of the family, closing the gap
    * between [[bufferSquare]] (exact but L∞) and the grid-measured a11ai
    * (Euclidean but no geometry out). Minkowski sum of a point or STRICTLY
    * convex polygon with the disc of radius r, the disc's corner arcs
    * discretized at a FIXED `segs` vertices per corner (PostGIS's
    * quad_segs knob, default 8): every output vertex is the closed-form
    * chain `v + r·(cos θ, sin θ)` with θ = θ_in + sweep·j/segs, θ_in/θ_out
    * the edge-normal angles `atan2(dy, dx) − π/2` of the corner's incoming
    * and outgoing edges — no accumulated walks, no iteration, so an oracle
    * replays the whole construction op-for-op from the same atan2/cos/sin
    * calls (the a11s libm discipline; quantized stats carry the last-ulp
    * flip risk ~1e-10/row). The inscribed-arc polygon UNDERestimates the
    * true buffer by the circular-segment deficit ≈ πr²·(1 − sinc(π/(2·segs)))
    * per full turn — the standard ST_Buffer approximation contract.
    *
    * A POINT buffers to the inscribed regular 4·segs-gon starting at
    * angle 0. Non-convex or collinear-vertex rings throw loudly
    * ([[convexCcwBase]] strict mode). CCW output, per-row map-side work.
    */
  def bufferEuclidean(wkb: Array[Byte], r: Double, segs: Int = 8): Array[Byte] = {
    require(r > 0, s"bufferEuclidean: r must be positive, got $r")
    require(segs >= 1 && segs <= 64, s"bufferEuclidean: segs in [1,64], got $segs")
    val base = convexCcwBase(wkb, "bufferEuclidean", strict = true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    if (base.length == 1) {
      val (x, y) = base.head
      val n = 4 * segs
      var k = 0
      while (k < n) {
        val ang = 2.0 * math.Pi * k / n
        out += ((x + r * math.cos(ang), y + r * math.sin(ang)))
        k += 1
      }
    } else {
      val n = base.length
      var i = 0
      while (i < n) {
        val prev = base((i + n - 1) % n)
        val p = base(i)
        val next = base((i + 1) % n)
        val thIn = math.atan2(p._2 - prev._2, p._1 - prev._1) - math.Pi / 2.0
        val thOut = math.atan2(next._2 - p._2, next._1 - p._1) - math.Pi / 2.0
        // strict convexity bounds the true sweep in (0, π); one conditional
        // 2π-add normalizes the fp difference into [0, 2π)
        var sweep = thOut - thIn
        if (sweep < 0) sweep += 2.0 * math.Pi
        var j = 0
        while (j <= segs) {
          val ang = thIn + sweep * j / segs
          out += ((p._1 + r * math.cos(ang), p._2 + r * math.sin(ang)))
          j += 1
        }
        i += 1
      }
    }
    polygon(Seq(out.toIndexedSeq :+ out.head))
  }

  /** Convex ⊕ convex Minkowski sum, both rings CCW; output CCW, open. */
  private def minkowskiConvex(a: IndexedSeq[(Double, Double)],
      b: IndexedSeq[(Double, Double)]): IndexedSeq[(Double, Double)] = {
    def lowest(p: IndexedSeq[(Double, Double)]): Int = {
      var best = 0
      var i = 1
      while (i < p.length) {
        if (p(i)._2 < p(best)._2 ||
          (p(i)._2 == p(best)._2 && p(i)._1 < p(best)._1)) best = i
        i += 1
      }
      best
    }
    val (n, m) = (a.length, b.length)
    val (ia0, ib0) = (lowest(a), lowest(b))
    def av(k: Int) = a((ia0 + k) % n)
    def bv(k: Int) = b((ib0 + k) % m)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    var j = 0
    while (i < n || j < m) {
      val pa = av(i % n)
      val pb = bv(j % m)
      out += ((pa._1 + pb._1, pa._2 + pb._2))
      if (j >= m) i += 1
      else if (i >= n) j += 1
      else {
        val ea = { val q = av(i + 1); (q._1 - pa._1, q._2 - pa._2) }
        val eb = { val q = bv(j + 1); (q._1 - pb._1, q._2 - pb._2) }
        val cr = ea._1 * eb._2 - ea._2 * eb._1
        if (cr > 0) i += 1 else if (cr < 0) j += 1 else { i += 1; j += 1 }
      }
    }
    out.toIndexedSeq
  }

  /** Rings grouped per polygon member (ring 0 = outer, rest = holes). */
  private def areaRingsGrouped(wkb: Array[Byte]): Seq[Seq[Array[(Double, Double)]]] = {
    val bb = ByteBuffer.wrap(wkb)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Array[(Double, Double)]]]
    def ring(n: Int, dims: Int): Array[(Double, Double)] = {
      val pts = new Array[(Double, Double)](n)
      var i = 0
      while (i < n) {
        val x = bb.getDouble; val y = bb.getDouble
        var d = 2
        while (d < dims) { bb.getDouble; d += 1 }
        pts(i) = (x, y)
        i += 1
      }
      // Normalize closure here, once, for every consumer: an unclosed ring
      // gets its first vertex appended so edge iteration p..p+1 always
      // covers the closing edge (area's explicit close-term then no-ops —
      // same left-associated IEEE chain either way).
      if (pts.length > 1 && pts(pts.length - 1) != pts(0)) pts :+ pts(0)
      else pts
    }
    def geom(): Unit = {
      val h = header(bb)
      h.base match {
        case 3 =>
          val n = bb.getInt
          out += (0 until n).map(_ => ring(bb.getInt, h.dims))
        case 6 =>
          val n = bb.getInt
          var i = 0
          while (i < n) { geom(); i += 1 }
        case t => throw new IllegalArgumentException(
          s"wkb: expected POLYGON or MULTIPOLYGON, got type $t")
      }
    }
    geom()
    out.toSeq
  }

  /** True iff two areal geometries (POLYGON / MULTIPOLYGON, holes
    * respected) share any material: a boundary edge pair crosses, or —
    * with no boundary crossings, so each loop lies entirely inside or
    * outside the other's material — one geometry's vertex sits in the
    * other's interior ([[containsPoint]]'s even-odd rule keeps a vertex
    * inside a hole from counting). Edge test is O(n·m) over vertex
    * counts; at scale callers block first (bbox grid, see
    * `operators.Spatial`) so n·m stays per-candidate-pair small.
    */
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ba = bbox(a)
    if (!bboxIntersects(b, ba.xmin, ba.ymin, ba.xmax, ba.ymax)) return false
    val ringsA = areaRings(a)
    val ringsB = areaRings(b)
    var i = 0
    while (i < ringsA.length) {
      val ra = ringsA(i)
      var j = 0
      while (j < ringsB.length) {
        val rb = ringsB(j)
        var p = 0
        while (p < ra.length - 1) {
          var q = 0
          while (q < rb.length - 1) {
            if (segmentsIntersect(ra(p)._1, ra(p)._2, ra(p + 1)._1, ra(p + 1)._2,
                rb(q)._1, rb(q)._2, rb(q + 1)._1, rb(q + 1)._2)) return true
            q += 1
          }
          p += 1
        }
        j += 1
      }
      i += 1
    }
    // No boundary crossing: each loop lies wholly inside or outside the
    // other's material, so any ring's first vertex decides for that loop.
    // Every ring is tested (multipolygon members are independent; a hole
    // ring's vertex borders its polygon's material, so it answers for it).
    ringsA.exists(r => r.nonEmpty && containsPoint(b, r(0)._1, r(0)._2)) ||
      ringsB.exists(r => r.nonEmpty && containsPoint(a, r(0)._1, r(0)._2))
  }

  // ------------------------------------------------------------- distance
  /** Euclidean distance between two POINT geometries (any dialect) as the
    * literal chain `sqrt(dx*dx + dy*dy)` — an oracle replaying the same
    * three ops on the same coordinates gets the bit-identical double
    * (each IEEE op is correctly rounded), the a11g/c3 replay pattern.
    */
  def pointDistance(a: Array[Byte], b: Array[Byte]): Double = {
    def xy(wkb: Array[Byte]): (Double, Double) = {
      val bb = ByteBuffer.wrap(wkb)
      val h = header(bb)
      require(h.base == 1, s"wkb: pointDistance expects POINT, got type ${h.base}")
      (bb.getDouble, bb.getDouble)
    }
    val (ax, ay) = xy(a)
    val (bx, by) = xy(b)
    val dx = ax - bx
    val dy = ay - by
    math.sqrt(dx * dx + dy * dy)
  }

  /** Distance from (px, py) to the closest point of segment (x1,y1)-(x2,y2). */
  private def pointSegDistance(px: Double, py: Double,
      x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dx = x2 - x1
    val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / len2))
    val cx = x1 + t * dx
    val cy = y1 + t * dy
    math.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
  }

  /** Minimum distance from (px, py) to the BOUNDARY of an areal geometry
    * (POLYGON / MULTIPOLYGON, holes included — a hole edge is boundary):
    * min over every ring edge's point-segment distance. 0 on the boundary
    * itself; an interior point still gets its (positive) distance to the
    * nearest edge — combine with [[containsPoint]] when "0 inside" is the
    * wanted semantics (see `operators.Spatial.nearestPolygonWithinR`).
    */
  def boundaryDistance(wkb: Array[Byte], px: Double, py: Double): Double =
    boundaryDistanceRings(areaRings(wkb), px, py)

  /** Decoded-ring forms of [[containsPoint]] / [[boundaryDistance]] for
    * callers probing MANY points against ONE geometry: decode once with
    * [[decodeAreaRings]], probe per point over the vertex arrays with the
    * IDENTICAL IEEE edge chains (same doubles in, same comparisons, same
    * edge set — rings come back closure-normalized), so results are
    * bit-for-bit the per-call decode's. Motivation (optimization guide
    * §1.2 step 2, per-task work): a grid-probe query like a11ai issues
    * ~56 probes per geometry; re-parsing the WKB byte array inside every
    * probe dominated the stage.
    */
  def decodeAreaRings(wkb: Array[Byte]): Seq[Array[(Double, Double)]] = areaRings(wkb)

  /** Even-odd ray cast over decoded rings — [[containsPoint]]'s exact
    * edge test (`(y1 > py) != (y2 > py)` then the division chain) walked
    * over the closed vertex loops; parity is order-free, so the result
    * matches the streaming walk bit-for-bit.
    */
  def containsPointRings(rings: Seq[Array[(Double, Double)]], px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      var p = 0
      while (p < r.length - 1) {
        val x1 = r(p)._1; val y1 = r(p)._2
        val x2 = r(p + 1)._1; val y2 = r(p + 1)._2
        if (((y1 > py) != (y2 > py)) &&
            px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) inside = !inside
        p += 1
      }
      i += 1
    }
    inside
  }

  def boundaryDistanceRings(rings: Seq[Array[(Double, Double)]],
      px: Double, py: Double): Double = {
    var best = Double.PositiveInfinity
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      var p = 0
      while (p < r.length - 1) {
        val d = pointSegDistance(px, py, r(p)._1, r(p)._2, r(p + 1)._1, r(p + 1)._2)
        if (d < best) best = d
        p += 1
      }
      // a single-vertex ring still contributes its point
      if (r.length == 1) {
        val d = pointSegDistance(px, py, r(0)._1, r(0)._2, r(0)._1, r(0)._2)
        if (d < best) best = d
      }
      i += 1
    }
    best
  }

  /** Planar length of a LINESTRING / MULTILINESTRING: segment norms
    * `sqrt(dx*dx + dy*dy)` accumulated left-to-right in vertex order — an
    * oracle replaying the same chain gets the bit-identical double (the
    * area/pointDistance replay pattern).
    */
  /** 3D cartesian length (ST_3DLength): like [[length]] but the Z
    * ordinate joins each segment's norm — `sqrt(dx² + dy² + dz²)` with
    * the dz term appended to the same left-associated chain, so the 2D
    * and 3D results agree exactly on Z-less input (dz = 0 adds nothing).
    * XYM input uses dz = 0 too (M is a measure, not a coordinate).
    */
  def length3d(wkb: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(wkb)
    var total = 0.0
    def lineBody(dims: Int, hasZ: Boolean): Unit = {
      val n = bb.getInt
      var x1 = 0.0; var y1 = 0.0; var z1 = 0.0
      var i = 0
      while (i < n) {
        val x2 = bb.getDouble; val y2 = bb.getDouble
        val z2 = if (hasZ) bb.getDouble else 0.0
        var d = if (hasZ) 3 else 2
        while (d < dims) { bb.getDouble; d += 1 }
        if (i > 0) {
          val dx = x2 - x1
          val dy = y2 - y1
          val dz = z2 - z1
          total += math.sqrt(dx * dx + dy * dy + dz * dz)
        }
        x1 = x2; y1 = y2; z1 = z2
        i += 1
      }
    }
    val h = header(bb)
    h.base match {
      case 2 => lineBody(h.dims, h.hasZ)
      case 5 =>
        val n = bb.getInt
        var i = 0
        while (i < n) {
          val mh = header(bb)
          require(mh.base == 2, s"wkb: length3d expects LINESTRING member, got ${mh.base}")
          lineBody(mh.dims, mh.hasZ)
          i += 1
        }
      case t => throw new IllegalArgumentException(
        s"wkb: length3d expects LINESTRING or MULTILINESTRING, got type $t")
    }
    total
  }

  def length(wkb: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(wkb)
    var total = 0.0
    def line(): Unit = {
      val h2 = header(bb)
      require(h2.base == 2, s"wkb: length expects LINESTRING member, got ${h2.base}")
      lineBody(h2.dims)
    }
    def lineBody(dims: Int): Unit = {
      val n = bb.getInt
      var x1 = 0.0; var y1 = 0.0
      var i = 0
      while (i < n) {
        val x2 = bb.getDouble; val y2 = bb.getDouble
        var d = 2
        while (d < dims) { bb.getDouble; d += 1 }
        if (i > 0) {
          val dx = x2 - x1
          val dy = y2 - y1
          total += math.sqrt(dx * dx + dy * dy)
        }
        x1 = x2; y1 = y2
        i += 1
      }
    }
    val h = header(bb)
    h.base match {
      case 2 => lineBody(h.dims)
      case 5 =>
        val n = bb.getInt
        var i = 0
        while (i < n) { line(); i += 1 }
      case t => throw new IllegalArgumentException(
        s"wkb: length expects LINESTRING or MULTILINESTRING, got type $t")
    }
    total
  }

  /** Vertex count of a LINESTRING (companion to [[simplify]]). */
  def pointCount(wkb: Array[Byte]): Int = {
    val bb = ByteBuffer.wrap(wkb)
    val h = header(bb)
    require(h.base == 2, s"wkb: pointCount expects LINESTRING, got type ${h.base}")
    bb.getInt
  }

  /** Per-ring vertex counts of a POLYGON — a structure probe: ring count
    * and each ring's vertex count must survive any coordinate-level
    * transform (e.g. [[reproject]]) unchanged.
    */
  def ringVertexCounts(wkb: Array[Byte]): Seq[Int] = {
    val bb = ByteBuffer.wrap(wkb)
    val h = header(bb)
    require(h.base == 3, s"wkb: ringVertexCounts expects POLYGON, got type ${h.base}")
    val rings = bb.getInt
    (0 until rings).map { _ =>
      val n = bb.getInt
      bb.position(bb.position() + n * h.dims * 8)
      n
    }
  }

  /** Douglas-Peucker polyline simplification of a LINESTRING: vertices
    * farther than `epsilon` (perpendicular distance) from the current
    * chord are kept recursively; endpoints always survive. Deterministic
    * (pure function of the vertex list), the standard pre-step before
    * serving vector tiles at a coarser zoom — at scale it runs map-side,
    * one document per row, no shuffle.
    */
  def simplify(wkb: Array[Byte], epsilon: Double): Array[Byte] = {
    val bb = ByteBuffer.wrap(wkb)
    val h = header(bb)
    require(h.base == 2, s"wkb: simplify expects LINESTRING, got type ${h.base}")
    val n = bb.getInt
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = bb.getDouble; ys(i) = bb.getDouble
      var d = 2
      while (d < h.dims) { bb.getDouble; d += 1 }
      i += 1
    }
    if (n < 3) return lineString(xs.zip(ys).toSeq)
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    def perpDist(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Double = {
      val dx = bx - ax; val dy = by - ay
      val len = math.sqrt(dx * dx + dy * dy)
      if (len == 0) math.sqrt((px - ax) * (px - ax) + (py - ay) * (py - ay))
      else math.abs(dx * (ay - py) - dy * (ax - px)) / len
    }
    def rec(lo: Int, hi: Int): Unit =
      if (hi > lo + 1) {
        var best = -1
        var bestD = epsilon
        var j = lo + 1
        while (j < hi) {
          val dd = perpDist(xs(j), ys(j), xs(lo), ys(lo), xs(hi), ys(hi))
          if (dd > bestD) { bestD = dd; best = j }
          j += 1
        }
        if (best >= 0) { keep(best) = true; rec(lo, best); rec(best, hi) }
      }
    rec(0, n - 1)
    lineString((0 until n).filter(keep).map(j => (xs(j), ys(j))))
  }

  /** Point at fraction `t` ∈ [0, 1] along a LINESTRING — the
    * ST_LineInterpolatePoint family member (route milestones, label
    * anchors). Walk: left-fold cumulative segment lengths with the SAME
    * sqrt chain as [[length]]; the target arc distance is `t·total`;
    * the covering segment is the first with cumulative ≥ target (an
    * exact-boundary tie lands on the EARLIER segment — both produce the
    * same point, but the branch must be pinned for bit replay); inside
    * it one lerp `x1 + frac·(x2−x1)` in fixed association. t outside
    * [0, 1] clamps to the endpoints (the PostGIS contract).
    */
  def lineInterpolate(wkb: Array[Byte], t: Double): (Double, Double) = {
    val bb = ByteBuffer.wrap(wkb)
    val h = header(bb)
    require(h.base == 2, s"wkb: lineInterpolate expects LINESTRING, got type ${h.base}")
    val n = bb.getInt
    require(n >= 1, "wkb: lineInterpolate needs at least one vertex")
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = bb.getDouble; ys(i) = bb.getDouble
      var d = 2
      while (d < h.dims) { bb.getDouble; d += 1 }
      i += 1
    }
    if (t <= 0.0 || n == 1) return (xs(0), ys(0))
    if (t >= 1.0) return (xs(n - 1), ys(n - 1))
    var total = 0.0
    i = 1
    while (i < n) {
      val dx = xs(i) - xs(i - 1)
      val dy = ys(i) - ys(i - 1)
      total += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    if (total == 0.0) return (xs(0), ys(0)) // all-coincident degenerate
    val target = t * total
    var cum = 0.0
    i = 1
    while (i < n) {
      val dx = xs(i) - xs(i - 1)
      val dy = ys(i) - ys(i - 1)
      val seg = math.sqrt(dx * dx + dy * dy)
      if (cum + seg >= target && seg > 0.0) {
        val frac = (target - cum) / seg
        return (xs(i - 1) + frac * dx, ys(i - 1) + frac * dy)
      }
      cum += seg
      i += 1
    }
    (xs(n - 1), ys(n - 1)) // fp-shortfall guard: cum < target by < 1 ulp
  }

  // ------------------------------------------------------------------ WKT
  /** Integral coordinates print without a decimal point; fractional ones
    * use the JVM's shortest-roundtrip repr, so `fromWkt(toWkt(g))`
    * re-parses to bit-identical doubles.
    */
  private def fmtNum(d: Double): String =
    if (d == 0.0) { if (java.lang.Double.doubleToRawLongBits(d) != 0L) "-0" else "0" }
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Canonical WKT text for a WKB value (any dialect, both endiannesses).
    * XY only — Z/M ordinates are skipped on read, matching every other
    * reader in this codec. Empty collections/lines/polygons print as
    * `TYPE EMPTY`.
    */
  def toWkt(wkb: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder
    writeWkt(ByteBuffer.wrap(wkb), sb)
    sb.toString
  }

  /** WKT dimensionality marker for a header: " Z", " M", " ZM", or "". */
  private def wktMarker(h: Header): String =
    if (h.dims == 4) " ZM"
    else if (h.dims == 3 && h.hasZ) " Z"
    else if (h.dims == 3) " M"
    else ""

  private def writeWkt(bb: ByteBuffer, sb: java.lang.StringBuilder): Unit = {
    val h = header(bb)
    // every ordinate the geometry carries is EMITTED (Z and M both have
    // WKT slots) — the codec is byte-lossless across dims, not XY-only
    def dimsCoord(dims: Int): Unit = {
      sb.append(fmtNum(bb.getDouble)).append(' ').append(fmtNum(bb.getDouble))
      var d = 2
      while (d < dims) { sb.append(' ').append(fmtNum(bb.getDouble)); d += 1 }
    }
    def coord(): Unit = dimsCoord(h.dims)
    def pointList(): Unit = {
      val n = bb.getInt
      sb.append('(')
      var i = 0
      while (i < n) { if (i > 0) sb.append(", "); coord(); i += 1 }
      sb.append(')')
    }
    def body(n: Int)(each: Int => Unit): Unit =
      if (n == 0) sb.append("EMPTY")
      else {
        sb.append('(')
        var i = 0
        while (i < n) { if (i > 0) sb.append(", "); each(i); i += 1 }
        sb.append(')')
      }
    val mk = wktMarker(h)
    h.base match {
      case 1 =>
        sb.append("POINT").append(mk).append(" (")
        coord()
        sb.append(')')
      case 2 =>
        sb.append("LINESTRING").append(mk).append(' ')
        val n = bb.getInt
        if (n == 0) sb.append("EMPTY")
        else { bb.position(bb.position() - 4); pointList() }
      case 3 =>
        sb.append("POLYGON").append(mk).append(' ')
        body(bb.getInt)(_ => pointList())
      case 4 =>
        sb.append("MULTIPOINT").append(mk).append(' ')
        body(bb.getInt) { _ =>
          val mh = header(bb)
          require(mh.base == 1, s"wkt: MULTIPOINT member of type ${mh.base}")
          sb.append('(')
          dimsCoord(mh.dims)
          sb.append(')')
        }
      case 5 =>
        sb.append("MULTILINESTRING").append(mk).append(' ')
        body(bb.getInt) { _ =>
          val mh = header(bb)
          require(mh.base == 2, s"wkt: MULTILINESTRING member of type ${mh.base}")
          val n = bb.getInt
          sb.append('(')
          var i = 0
          while (i < n) {
            if (i > 0) sb.append(", ")
            dimsCoord(mh.dims)
            i += 1
          }
          sb.append(')')
        }
      case 6 =>
        sb.append("MULTIPOLYGON").append(mk).append(' ')
        body(bb.getInt) { _ =>
          val mh = header(bb)
          require(mh.base == 3, s"wkt: MULTIPOLYGON member of type ${mh.base}")
          val rings = bb.getInt
          sb.append('(')
          var r = 0
          while (r < rings) {
            if (r > 0) sb.append(", ")
            val n = bb.getInt
            sb.append('(')
            var i = 0
            while (i < n) {
              if (i > 0) sb.append(", ")
              dimsCoord(mh.dims)
              i += 1
            }
            sb.append(')')
            r += 1
          }
          sb.append(')')
        }
      case 7 =>
        sb.append("GEOMETRYCOLLECTION").append(mk).append(' ')
        body(bb.getInt)(_ => writeWkt(bb, sb))
      case t => throw new IllegalArgumentException(s"wkt: unsupported geometry type $t")
    }
  }

  /** GeoJSON geometry object for a WKB value (any dialect; XY only, like
    * every reader here) — the write side of `sources.GeoJson.coordsToWkb`:
    * parsing the emitted `coordinates` back through the builders yields
    * byte-identical canonical WKB. Number formatting is [[fmtNum]], so
    * doubles survive the roundtrip bit-for-bit.
    */
  def toGeoJson(wkb: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder
    writeGeoJson(ByteBuffer.wrap(wkb), sb)
    sb.toString
  }

  private def writeGeoJson(bb: ByteBuffer, sb: java.lang.StringBuilder): Unit = {
    val h = header(bb)
    def coord(): Unit = {
      sb.append('[').append(fmtNum(bb.getDouble)).append(',').append(fmtNum(bb.getDouble))
      // GeoJSON's third position element is ALTITUDE: emit Z when the
      // geometry carries it; M has no GeoJSON slot and is skipped
      var d = 2
      if (h.hasZ) { sb.append(',').append(fmtNum(bb.getDouble)); d += 1 }
      while (d < h.dims) { bb.getDouble; d += 1 }
      sb.append(']')
    }
    def listOf(n: Int)(each: Int => Unit): Unit = {
      sb.append('[')
      var i = 0
      while (i < n) { if (i > 0) sb.append(','); each(i); i += 1 }
      sb.append(']')
    }
    def memberCoords(expectBase: Int, what: String): Unit = {
      val mh = header(bb)
      require(mh.base == expectBase, s"geojson: $what member of type ${mh.base}")
      def mcoord(): Unit = {
        sb.append('[').append(fmtNum(bb.getDouble)).append(',').append(fmtNum(bb.getDouble))
        var d = 2
        if (mh.hasZ) { sb.append(',').append(fmtNum(bb.getDouble)); d += 1 }
        while (d < mh.dims) { bb.getDouble; d += 1 }
        sb.append(']')
      }
      expectBase match {
        case 1 => mcoord()
        case 2 => listOf(bb.getInt)(_ => mcoord())
        case 3 => listOf(bb.getInt)(_ => listOf(bb.getInt)(_ => mcoord()))
        case _ => throw new IllegalArgumentException(s"geojson: bad member base $expectBase")
      }
    }
    def obj(gtype: String)(body: => Unit): Unit = {
      sb.append("{\"type\":\"").append(gtype).append("\",\"coordinates\":")
      body
      sb.append('}')
    }
    h.base match {
      case 1 => obj("Point")(coord())
      case 2 => obj("LineString")(listOf(bb.getInt)(_ => coord()))
      case 3 => obj("Polygon")(listOf(bb.getInt)(_ => listOf(bb.getInt)(_ => coord())))
      case 4 => obj("MultiPoint")(listOf(bb.getInt)(_ => memberCoords(1, "MULTIPOINT")))
      case 5 => obj("MultiLineString")(listOf(bb.getInt)(_ => memberCoords(2, "MULTILINESTRING")))
      case 6 => obj("MultiPolygon")(listOf(bb.getInt)(_ => memberCoords(3, "MULTIPOLYGON")))
      case 7 =>
        sb.append("{\"type\":\"GeometryCollection\",\"geometries\":")
        listOf(bb.getInt)(_ => writeGeoJson(bb, sb))
        sb.append('}')
      case t => throw new IllegalArgumentException(s"geojson: unsupported geometry type $t")
    }
  }

  /** WKT text → canonical little-endian XY WKB. Accepts the output of
    * [[toWkt]] plus the usual variations: arbitrary whitespace, unparenthesized
    * MULTIPOINT members, optional `Z`/`M`/`ZM` markers (their extra
    * ordinates are parsed and DROPPED — XY-only policy), and `EMPTY` for
    * anything but a POINT (which has no NaN-free WKB form and throws).
    */
  def fromWkt(wkt: String): Array[Byte] = {
    val p = new WktParser(wkt)
    val g = p.parseGeom()
    p.skipWs()
    require(p.eof, s"wkt: trailing content at offset ${p.pos}")
    g
  }

  private final class WktParser(s: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"wkt: expected $what at offset $i in '$s'")
    private def expect(c: Char): Unit = {
      skipWs()
      if (eof || s.charAt(i) != c) fail(s"'$c'")
      i += 1
    }
    private def peekIs(c: Char): Boolean = { skipWs(); !eof && s.charAt(i) == c }
    private def ident(): String = {
      skipWs()
      val start = i
      while (i < s.length && s.charAt(i).isLetter) i += 1
      if (i == start) fail("a keyword")
      s.substring(start, i).toUpperCase
    }
    private def number(): Double = {
      skipWs()
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("a number")
      java.lang.Double.parseDouble(s.substring(start, i))
    }
    /** x y [z [m]] — the marker's extra ordinates are CARRIED into the
      * geometry (ISO-typed WKB), not dropped; coord consumes exactly what
      * the marker declared, which is how every mainstream WKT writer
      * emits it.
      */
    private def coord(mk: (Boolean, Boolean)): IndexedSeq[Double] = {
      val x = number(); val y = number()
      val b = scala.collection.mutable.ArrayBuffer(x, y)
      if (mk._1) b += number()
      if (mk._2) b += number()
      b.toIndexedSeq
    }
    /** The Z/M dimensionality marker: (hasZ, hasM). */
    private def dimMarker(): (Boolean, Boolean) = {
      skipWs()
      val save = i
      if (!eof && s.charAt(i).isLetter) {
        ident() match {
          case "Z" => (true, false)
          case "M" => (false, true)
          case "ZM" => (true, true)
          case "EMPTY" => i = save; (false, false)
          case _ => fail("Z, M, ZM, EMPTY or '('")
        }
      } else (false, false)
    }
    private def isEmpty(): Boolean = {
      skipWs()
      if (!eof && s.charAt(i) == 'E') {
        val save = i
        if (ident() == "EMPTY") true else { i = save; false }
      } else false
    }
    private def pointList(mk: (Boolean, Boolean)): Seq[IndexedSeq[Double]] = {
      expect('(')
      val out = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Double]]
      out += coord(mk)
      while (peekIs(',')) { expect(','); out += coord(mk) }
      expect(')')
      out.toSeq
    }
    private def ringList(mk: (Boolean, Boolean)): Seq[Seq[IndexedSeq[Double]]] = {
      expect('(')
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[IndexedSeq[Double]]]
      out += pointList(mk)
      while (peekIs(',')) { expect(','); out += pointList(mk) }
      expect(')')
      out.toSeq
    }
    def parseGeom(): Array[Byte] = {
      val name = ident()
      val mk = dimMarker()
      val (z, m) = mk
      name match {
        case "POINT" =>
          if (isEmpty()) fail("coordinates (POINT EMPTY has no WKB form)")
          expect('(')
          val row = coord(mk)
          expect(')')
          pointIso(row, z, m)
        case "LINESTRING" =>
          if (isEmpty()) lineStringIso(Nil, z, m)
          else lineStringIso(pointList(mk), z, m)
        case "POLYGON" =>
          if (isEmpty()) polygonIso(Nil, z, m)
          else polygonIso(ringList(mk), z, m)
        case "MULTIPOINT" =>
          if (isEmpty()) multiIso(4, z, m, Nil)
          else {
            expect('(')
            val pts = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Double]]
            def member(): Unit =
              if (peekIs('(')) { expect('('); pts += coord(mk); expect(')') }
              else pts += coord(mk)
            member()
            while (peekIs(',')) { expect(','); member() }
            expect(')')
            multiIso(4, z, m, pts.toSeq.map(pointIso(_, z, m)))
          }
        case "MULTILINESTRING" =>
          if (isEmpty()) multiIso(5, z, m, Nil)
          else {
            expect('(')
            val ls = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            ls += lineStringIso(pointList(mk), z, m)
            while (peekIs(',')) { expect(','); ls += lineStringIso(pointList(mk), z, m) }
            expect(')')
            multiIso(5, z, m, ls.toSeq)
          }
        case "MULTIPOLYGON" =>
          if (isEmpty()) multiIso(6, z, m, Nil)
          else {
            expect('(')
            val ps = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            ps += polygonIso(ringList(mk), z, m)
            while (peekIs(',')) { expect(','); ps += polygonIso(ringList(mk), z, m) }
            expect(')')
            multiIso(6, z, m, ps.toSeq)
          }
        case "GEOMETRYCOLLECTION" =>
          // members carry their own type + marker; the collection's own
          // marker sets only its type word
          if (isEmpty()) multiIso(7, z, m, Nil)
          else {
            expect('(')
            val gs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            gs += parseGeom()
            while (peekIs(',')) { expect(','); gs += parseGeom() }
            expect(')')
            multiIso(7, z, m, gs.toSeq)
          }
        case t => fail(s"a geometry keyword (got $t)")
      }
    }
  }
}
