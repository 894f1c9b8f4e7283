package graft.core

import scala.collection.mutable

/** Minimal MuON-subset parser for the engine config — the grammar the
  * reference's `wyrmcast.muon` uses (reference caster.rs:45-55 via the
  * `muon-rs` crate; re-implemented from scratch for the subset we need):
  *
  *   - `key: value` scalars,
  *   - repeated records introduced by `key: name` whose fields are
  *     indented two further spaces (`layer_group: tile`, `layer: county`),
  *   - `#` comment lines and blank lines ignored.
  */
object Muon {

  private final case class Line(indent: Int, key: String, value: String)

  private def parseLines(text: String): Seq[Line] =
    text.linesIterator.flatMap { raw =>
      val noComment = if (raw.trim.startsWith("#")) "" else raw
      if (noComment.trim.isEmpty) None
      else {
        val indent = noComment.takeWhile(_ == ' ').length
        val t = noComment.trim
        val i = t.indexOf(':')
        require(i > 0, s"bad muon line: $raw")
        Some(Line(indent, t.substring(0, i).trim,
          t.substring(i + 1).trim))
      }
    }.toSeq

  /** Parse an engine config document. */
  def parseConfig(text: String): EngineCfg = {
    val lines = parseLines(text)
    var tileExtent = 256
    val groups = mutable.ArrayBuffer.empty[LayerGroup]
    var gName = ""
    var gOsm = false
    var gLayers = mutable.ArrayBuffer.empty[LayerDef]
    var lName = ""
    var lFields = mutable.Map.empty[String, String]

    def flushLayer(): Unit = if (lName.nonEmpty) {
      gLayers += LayerDef(lName,
        lFields.getOrElse("geom_type",
          sys.error(s"layer $lName: no geom_type")),
        lFields.getOrElse("zoom", sys.error(s"layer $lName: no zoom")),
        lFields.getOrElse("tags", "").split(' ').filter(_.nonEmpty).toSeq)
      lName = ""; lFields = mutable.Map.empty
    }
    def flushGroup(): Unit = if (gName.nonEmpty) {
      flushLayer()
      groups += LayerGroup(gName, gOsm, gLayers.toVector)
      gName = ""; gOsm = false
      gLayers = mutable.ArrayBuffer.empty
    }

    lines.foreach { l =>
      l.key match {
        case "tile_extent" if l.indent == 0 => tileExtent = l.value.toInt
        case "bind_address" if l.indent == 0 => // server-only, ignored
        case "layer_group" if l.indent == 0 =>
          flushGroup(); gName = l.value
        case "osm" => gOsm = l.value == "true"
        case "layer" => flushLayer(); lName = l.value
        case other if lName.nonEmpty => lFields(other) = l.value
        case other => sys.error(s"unexpected key: $other")
      }
    }
    flushGroup()
    EngineCfg(tileExtent, groups.toVector)
  }
}

/** ZXY tile path build/parse (reference F9: route parse main.rs:272-303,
  * URL build earthwyrm/src/tile.rs:38-47). */
object ZxyPath {
  /** `{group}/{z}/{x}/{y}.{ext}` → (group, tile, ext); None on any
    * malformed / out-of-range part (the reference's 404 path). */
  def parse(path: String): Option[(String, TileId, String)] = {
    path.stripPrefix("/").split('/') match {
      case Array(group, zs, xs, tail) =>
        for {
          z <- zs.toIntOption
          x <- xs.toIntOption
          dot = tail.indexOf('.')
          if dot > 0
          y <- tail.substring(0, dot).toIntOption
          ext = tail.substring(dot + 1)
          if z >= 0 && z <= TileId.MaxZ && x >= 0 && y >= 0 &&
            x < (1 << z) && y < (1 << z)
        } yield (group, TileId(z, x, y), ext)
      case _ => None
    }
  }

  def build(group: String, t: TileId, ext: String): String =
    s"$group/${t.z}/${t.x}/${t.y}.$ext"
}

/** Viewport tile cover (reference F10, earthwyrm/src/map.rs:247-260):
  * center tile ± viewport extent in 256px tiles, plus one, saturating at
  * the world edges. */
object Viewport {
  def cover(center: TileId, widthPx: Int, heightPx: Int,
            centerOffX: Int, centerOffY: Int): Seq[TileId] = {
    val n = 1 << center.z
    // peg_nw: saturating_sub(off/256 + 1)
    val x0 = math.max(0, center.x - (centerOffX / 256 + 1))
    val y0 = math.max(0, center.y - (centerOffY / 256 + 1))
    // peg_se: saturating_add(extent/256 + 1), clamped to valid pegs
    val x1 = math.min(n - 1, center.x + (widthPx / 256 + 1))
    val y1 = math.min(n - 1, center.y + (heightPx / 256 + 1))
    for (y <- y0 to y1; x <- x0 to x1) yield TileId(center.z, x, y)
  }
}
