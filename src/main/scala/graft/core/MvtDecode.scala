package graft.core

import scala.collection.mutable

/** Minimal MVT 2.1 reader — the inverse surface of [[MvtLayer]]: recovers
  * per-layer structural counts (feature / key / value counts, extent,
  * version, geometry command walk) from an encoded tile's bytes.
  *
  * Purpose: the driver-visible containment oracle for the ZXY tile-lookup
  * query (VERDICT r3 #7). Byte-for-byte tile parity lives in the sbt
  * oracle suite; this decoder lets the DuckDB gate check the DECODED
  * structure of the served tile against the independently re-derived
  * feature assignment, shrinking the byte-trust surface to the raw varint
  * stream itself. Wire format per the public protobuf encoding + MVT 2.1
  * spec (reference serves tiles via the `mvt` crate; SURVEY.md §2.7).
  */
object MvtDecode {

  /** Structural summary of one decoded layer.
    *
    * `wellformed` = every varint terminated in-bounds, every
    * length-delimited field ended exactly at its boundary, every geometry
    * command id was MoveTo/LineTo/ClosePath with its full parameter run
    * present, and every feature carried a known geometry type. */
  final case class LayerStat(
      name: String,
      nFeatures: Int,
      nKeys: Int,
      nValues: Int,
      extent: Long,
      version: Long,
      nCommands: Long,
      nParams: Long,
      wellformed: Boolean)

  private final class Cursor(bytes: Array[Byte], var pos: Int,
                             val end: Int) {
    var ok: Boolean = true
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (pos < end) {
        val b = bytes(pos)
        pos += 1
        v |= (b.toLong & 0x7F) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) { ok = false; return v }
      }
      ok = false
      v
    }
    def sub(len: Long): Cursor = {
      if (len < 0 || pos + len > end) {
        ok = false
        new Cursor(bytes, pos, pos)
      } else {
        val c = new Cursor(bytes, pos, pos + len.toInt)
        pos += len.toInt
        c
      }
    }
    def utf8(len: Long): String = {
      val c = sub(len)
      new String(bytes, c.pos, c.end - c.pos,
        java.nio.charset.StandardCharsets.UTF_8)
    }
    /** Skip one field of the given wire type; unknown wire types poison. */
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 2 => sub(varint()); ()
      case 5 => pos += 4; if (pos > end) ok = false
      case 1 => pos += 8; if (pos > end) ok = false
      case _ => ok = false
    }
  }

  /** Walk a packed geometry field body; returns (commands, params, ok). */
  private def walkGeometry(c: Cursor): (Long, Long, Boolean) = {
    var cmds = 0L
    var params = 0L
    var ok = true
    while (c.hasNext && ok) {
      val ci = c.varint()
      val id = (ci & 0x7L).toInt
      val count = ci >>> 3
      cmds += 1
      id match {
        case 1 | 2 => // MoveTo / LineTo: 2 zigzag params per repeat
          var i = 0L
          while (i < count * 2 && ok) {
            c.varint()
            if (!c.ok) ok = false
            params += 1
            i += 1
          }
        case 7 => () // ClosePath: no params
        case _ => ok = false
      }
      if (!c.ok) ok = false
    }
    (cmds, params, ok && c.ok)
  }

  private def decodeLayer(c: Cursor): LayerStat = {
    var name = ""
    var nFeat = 0
    var nKeys = 0
    var nVals = 0
    var extent = 4096L // MVT default
    var version = 1L
    var cmds = 0L
    var params = 0L
    var wf = true
    while (c.hasNext && c.ok) {
      val key = c.varint()
      if (c.ok) {
        val field = (key >>> 3).toInt
        val wire = (key & 0x7L).toInt
        (field, wire) match {
          case (1, 2) => name = c.utf8(c.varint())
          case (2, 2) => // feature message
            val fc = c.sub(c.varint())
            nFeat += 1
            var geomTp = -1L
            while (fc.hasNext && fc.ok) {
              val fk = fc.varint()
              ((fk >>> 3).toInt, (fk & 0x7L).toInt) match {
                case (3, 0) => geomTp = fc.varint()
                case (4, 2) =>
                  val (gc, gp, gok) = walkGeometry(fc.sub(fc.varint()))
                  cmds += gc; params += gp
                  if (!gok) wf = false
                case (_, w) => fc.skip(w)
              }
            }
            if (!fc.ok || geomTp < 1 || geomTp > 3) wf = false
          case (3, 2) => c.sub(c.varint()); nKeys += 1
          case (4, 2) => c.sub(c.varint()); nVals += 1
          case (5, 0) => extent = c.varint()
          case (15, 0) => version = c.varint()
          case (_, w) => c.skip(w)
        }
      }
    }
    if (!c.ok) wf = false
    LayerStat(name, nFeat, nKeys, nVals, extent, version, cmds, params, wf)
  }

  /** Decode a tile's layers in emission order. A structurally broken
    * stream yields whatever parsed with `wellformed = false` — it never
    * throws, so the oracle query can surface the breakage as a red
    * boolean instead of an exception. */
  def decode(bytes: Array[Byte]): Seq[LayerStat] = {
    val out = mutable.ArrayBuffer.empty[LayerStat]
    val c = new Cursor(bytes, 0, bytes.length)
    while (c.hasNext && c.ok) {
      val key = c.varint()
      if (c.ok) {
        val field = (key >>> 3).toInt
        val wire = (key & 0x7L).toInt
        if (field == 3 && wire == 2) out += decodeLayer(c.sub(c.varint()))
        else c.skip(wire)
      }
    }
    if (!c.ok)
      out += LayerStat("<malformed>", 0, 0, 0, 0L, 0L, 0L, 0L,
        wellformed = false)
    out.toSeq
  }
}
