package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class ConfigSpec extends AnyFunSuite {
  test("muon config parse (S1)") {
    val cfg = Muon.parseConfig(
      """# test config
        |bind_address: 127.0.0.1:3030
        |tile_extent: 512
        |layer_group: tile
        |  osm: true
        |  layer: county
        |    geom_type: polygon
        |    zoom: 4-14
        |    tags: $osm_id ?name type=boundary admin_level=6
        |  layer: motorway
        |    geom_type: linestring
        |    zoom: 8+
        |    tags: $osm_id ?name ?ref highway=motorway|motorway_link
        |layer_group: extra
        |  osm: false
        |  layer: pois
        |    geom_type: point
        |    zoom: 10+
        |    tags: ?name
        |""".stripMargin)
    assert(cfg.tileExtent == 512)
    assert(cfg.groups.map(_.name) == Vector("tile", "extra"))
    assert(cfg.groups(0).osm && !cfg.groups(1).osm)
    val county = cfg.groups(0).layers(0)
    assert(county.name == "county" && county.geomTp == GeomTp.Polygon)
    assert(county.zoom == ZoomRange(4, 14))
    assert(county.patterns.length == 4)
    assert(county.includeTags == Vector(("osm_id", true), ("name", false)))
    val mw = cfg.groups(0).layers(1)
    assert(mw.patterns.exists(p => p.tag == "highway" &&
      p.values == Vector("motorway", "motorway_link")))
  }

  test("default config parity: all 21 reference layers, parsed not transcribed") {
    val refPath = java.nio.file.Paths.get(
      "/root/reference/wyrmcast/res/wyrmcast.muon")
    assume(java.nio.file.Files.exists(refPath))
    val ref = Muon.parseConfig(java.nio.file.Files.readString(refPath))
    val tile = EngineCfg.default.groups.find(_.name == "tile").get
    val refTile = ref.groups.find(_.name == "tile").get
    assert(EngineCfg.default.tileExtent == ref.tileExtent)
    assert(tile.layers.length == 21)
    assert(tile.layers.map(_.name) == refTile.layers.map(_.name))
    tile.layers.zip(refTile.layers).foreach { case (a, b) =>
      assert(a.geomTp == b.geomTp, a.name)
      assert(a.zoom == b.zoom, a.name)
      assert(a.patterns.map(_.toString) == b.patterns.map(_.toString),
        a.name)
    }
    // the synthetic layers live in their own test group, not in `tile`
    val tt = EngineCfg.default.groups.find(_.name == "tile_test").get
    assert(tt.osm && tt.layers.map(_.name) ==
      Vector("city_poi", "segment_10"))
  }

  test("duplicate tag pattern rejected (P3, layer.rs:264-276)") {
    assertThrows[IllegalArgumentException] {
      LayerDef("x", "point", "5", Seq("?name", "name=a"))
    }
  }

  test("zxy path parse/build round trip (F9)") {
    assert(ZxyPath.parse("tile/14/3946/5895.mvt")
      .contains(("tile", TileId(14, 3946, 5895), "mvt")))
    assert(ZxyPath.parse("/tile/0/0/0.wyrm")
      .contains(("tile", TileId(0, 0, 0), "wyrm")))
    assert(ZxyPath.parse("tile/2/4/1.mvt").isEmpty) // x out of range
    assert(ZxyPath.parse("tile/2/1/x.mvt").isEmpty)
    assert(ZxyPath.parse("tile/2/1/1").isEmpty)
    val p = ZxyPath.build("tile", TileId(14, 3946, 5895), "mvt")
    assert(p == "tile/14/3946/5895.mvt")
    assert(ZxyPath.parse(p).map(_._2).contains(TileId(14, 3946, 5895)))
  }

  test("viewport cover saturates at world edges (F10)") {
    val c = Viewport.cover(TileId(3, 0, 0), 512, 256, 100, 100)
    // nw saturates to 0; se = center + width/256 + 1
    assert(c.map(_.x).min == 0 && c.map(_.y).min == 0)
    assert(c.map(_.x).max == 3 && c.map(_.y).max == 2)
    val e = Viewport.cover(TileId(2, 3, 3), 512, 512, 10, 10)
    assert(e.map(_.x).max == 3 && e.map(_.y).max == 3) // clamped at n-1
  }

  test("pixel→peg→mercator→lon/lat round trip (F11 analog)") {
    val t = TileId(12, 990, 1450)
    val b = TileGrid.tileBBox(t.z, t.x, t.y)
    val (lon, lat) = Mercator.unproject(Pt((b.xmin + b.xmax) / 2,
      (b.ymin + b.ymax) / 2))
    val p = Mercator.project(lon, lat)
    val cover = TileGrid.cover(t.z, BBox(p.x, p.y, p.x, p.y), 256, 0)
    assert(cover.toSeq == Seq(t.packed))
  }
}
