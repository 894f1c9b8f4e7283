package graft.core

/** Geometry type of a layer (reference wyrmcast/src/geom.rs:12-21). */
sealed abstract class GeomTp(val rank: Int, val name: String)
object GeomTp {
  case object Point extends GeomTp(0, "point")
  case object Linestring extends GeomTp(1, "linestring")
  case object Polygon extends GeomTp(2, "polygon")
  def parse(s: String): GeomTp = s match {
    case "point" => Point
    case "linestring" => Linestring
    case "polygon" => Polygon
    case other => throw new IllegalArgumentException(
      s"Unknown geometry type: $other")
  }
}

/** One tag pattern of the layer DSL (reference wyrmcast/src/layer.rs:51-235).
  *
  * Grammar: `[./?/$]tag[=|!=][v1|v2|…]`
  *   - `.tag…`  must match AND include value (string)
  *   - `?tag…`  include only (string)
  *   - `$tag…`  include only (MVT sint)
  *   - `tag…`   must match, not included
  *   - bare `tag` ≡ `tag!=_` (tag exists); `_` denotes the missing value.
  */
final case class TagPattern(
    mustMatch: Boolean,
    include: Boolean,
    sint: Boolean,
    tag: String,
    equal: Boolean,
    values: Vector[String]) {

  /** Equal → value ∈ set (missing matches iff `_` ∈ set); NotEqual →
    * negation (reference layer.rs:174-189). */
  def matchesValue(value: Option[String]): Boolean = {
    val in = value match {
      case Some(v) => values.contains(v)
      case None => values.contains("_")
    }
    if (equal) in else !in
  }

  /** Round-trip display (reference layer.rs:122-148). */
  override def toString: String = {
    val prefix =
      if (!mustMatch && sint) "$"
      else if (!mustMatch) "?"
      else if (mustMatch && include) "."
      else ""
    val base = prefix + tag
    if (!equal && values.headOption.contains("_")) base
    else base + (if (equal) "=" else "!=") + values.mkString("|")
  }
}

object TagPattern {
  /** Parse one pattern (reference layer.rs:191-235). */
  def parse(pat: String): TagPattern = {
    val (mustMatch, include, sint, rest) =
      if (pat.startsWith(".")) (true, true, false, pat.substring(1))
      else if (pat.startsWith("?")) (false, true, false, pat.substring(1))
      else if (pat.startsWith("$")) (false, true, true, pat.substring(1))
      else (true, false, false, pat)
    // split at FIRST '=' (Rust split_once); `tag!=v` → tag ends with '!'
    val eq = rest.indexOf('=')
    val (tag, equal, values) =
      if (eq < 0) (rest, false, "_")
      else {
        val t = rest.substring(0, eq)
        val v = rest.substring(eq + 1)
        if (t.endsWith("!")) (t.dropRight(1), false, v) else (t, true, v)
      }
    TagPattern(mustMatch, include, sint, tag, equal,
      values.split('|').toVector)
  }
}

/** Zoom range: `"5"`, `"8-12"`, `"10+"` (max 30; reference
  * layer.rs:239-261). */
final case class ZoomRange(zmin: Int, zmax: Int) {
  def contains(z: Int): Boolean = z >= zmin && z <= zmax
}
object ZoomRange {
  val ZoomMax = 30
  def parse(s: String): ZoomRange = {
    def one(z: String): Int = {
      val v = z.toInt
      require(v >= 0 && v <= ZoomMax, s"Invalid zoom level: $v")
      v
    }
    s.split('-') match {
      case Array(a, b) if s.contains('-') => ZoomRange(one(a), one(b))
      case _ if s.endsWith("+") => ZoomRange(one(s.dropRight(1)), ZoomMax)
      case _ => val z = one(s); ZoomRange(z, z)
    }
  }
}

/** Compiled layer rule (reference LayerDef, wyrmcast/src/layer.rs:33-49).
  * Duplicate pattern tags are rejected (layer.rs:264-276). */
final case class LayerDef(
    name: String,
    geomTp: GeomTp,
    zoom: ZoomRange,
    patterns: Vector[TagPattern]) {

  {
    val tags = patterns.map(_.tag)
    require(tags.distinct.size == tags.size,
      s"Duplicate pattern in layer $name")
  }

  /** Include-tags in pattern order, with sint flags
    * (reference layer.rs:341-344). */
  val includeTags: Vector[(String, Boolean)] =
    patterns.filter(_.include).map(p => (p.tag, p.sint))

  /** ALL must-match patterns must hold (reference layer.rs:329-339). */
  def checkTags(tags: Map[String, String]): Boolean =
    patterns.forall(p => !p.mustMatch || p.matchesValue(tags.get(p.tag)))

  def checkZoom(z: Int): Boolean = zoom.contains(z)

  /** Re-associate stored positional values with tag names + sint flags,
    * dropping nulls (reference layer.rs:347-361). */
  def tagValues(values: Seq[Option[String]])
      : Seq[(String, String, Boolean)] =
    includeTags.zip(values).collect {
      case ((tag, sint), Some(v)) => (tag, v, sint)
    }

  /** CSS class-name mangling (reference layer.rs:364-389): `wyrm-` prefix
    * when unnamed; all-numeric `_`-parts of the layer name dropped; feature
    * name appended after `-` with whitespace/control chars stripped. */
  def className(fname: Option[String]): String = {
    val sb = new StringBuilder(24)
    if (fname.isEmpty) sb.append("wyrm-")
    name.split('_').foreach { nm =>
      if (!(nm.nonEmpty && nm.forall(_.isDigit)) && !(nm.isEmpty)) {
        if (sb.nonEmpty && !sb.endsWith("-")) sb.append('_')
        sb.append(nm)
      } else if (nm.isEmpty) {
        // Rust: empty split part is "all numeric" vacuously → skipped
      }
    }
    fname.foreach { n =>
      sb.append('-')
      n.foreach { ch =>
        if (!ch.isWhitespace && !ch.isControl) sb.append(ch)
      }
    }
    sb.toString
  }
}

object LayerDef {
  def apply(name: String, geomType: String, zoom: String,
            tags: Seq[String]): LayerDef =
    LayerDef(name, GeomTp.parse(geomType), ZoomRange.parse(zoom),
      tags.map(TagPattern.parse).toVector)
}

/** Layer group: one tile endpoint (reference wyrmcast/src/group.rs:12-34). */
final case class LayerGroup(name: String, osm: Boolean,
                            layers: Vector[LayerDef])

/** Engine config (reference CasterCfg, wyrmcast/src/caster.rs:15-25, minus
  * the server bind address which has no analog in a batch engine). */
final case class EngineCfg(tileExtent: Int, groups: Vector[LayerGroup])

object EngineCfg {
  /** The default config: the reference's full 21-layer `tile` group,
    * PARSED from a verbatim copy of its default config file
    * (/root/reference/wyrmcast/res/wyrmcast.muon, bundled as a resource —
    * data, not code), plus a second `tile_test` group carrying two
    * synthetic layers the reference config lacks: a point layer
    * exercising the name/rotate path (reference point.rs:41-49) and
    * `segment_10`, which pins the numeric-part class-name mangling. */
  lazy val default: EngineCfg = {
    val in = getClass.getResourceAsStream("/wyrmcast.muon")
    require(in != null, "wyrmcast.muon resource missing")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    val parsed = Muon.parseConfig(text)
    def L(n: String, g: String, z: String, t: String) =
      LayerDef(n, g, z, t.split(' ').toSeq)
    val testGroup = LayerGroup("tile_test", osm = true, Vector(
      L("city_poi", "point", "10+", "?name $rotate place=city|town"),
      L("segment_10", "linestring", "8+", "?name highway=motorway")))
    EngineCfg(parsed.tileExtent, parsed.groups :+ testGroup)
  }
}
