package graft.tile

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.expr.GeoFunctions
import graft.model.{Feature, Ring, TileRow}

/** One feature row carried into the per-feature encode stage. */
final case class TileFeatRow(tile_id: Long, layer: String, kind_rank: Int,
                             id: Long, values: Seq[String], rings: Seq[Ring])

/** One PRE-ENCODED feature payload: the geometry work (clip / simplify /
  * transform / command encode) is done per-feature BEFORE the shuffle, so
  * the hot z0-2 tiles (a z0 tile covers the whole corpus) never serialize
  * encode work into one task, and the shuffle carries compact command
  * arrays instead of raw rings. MVT fields: `geom` + tag triplets; Wyrm
  * fields: `content` + `found`. */
final case class FeatPayload(
    tile_id: Long, layer_rank: Int, kind_rank: Int, id: Long,
    geom: Array[Long], tag_keys: Seq[String], tag_vals: Seq[String],
    tag_sint: Seq[Boolean], content: String, found: Boolean)

/** The batch tile-pyramid job (SURVEY.md §3.2 "Spark shape"):
  *
  *   features ⨝ broadcast(layer meta)  — zoom gate P4, plan-time pruned
  *     → explode zooms (sequence)      — one pass over the feature table
  *     → explode tileCover(z, bbox)    — batched cell cover (J4, exact)
  *     → per-feature encode (map)      — clip+simplify+commands, parallel
  *     → groupByKey(tile_id)           — ONE shuffle: layer aggregation
  *                                        (A3) + tile assembly (A4/A5),
  *                                        feature order (kind_rank, id),
  *                                        layer order = config order
  *
  * Skew note: the only per-tile serial work left after the rewrite is
  * dictionary interning + byte concatenation (O(bytes)); AQE handles
  * partition sizing.
  */
object Pyramid {

  /** MVT margin by zoom as a Column (mvtenc.rs:213-222). */
  def mvtMarginCol(z: Column): Column =
    when(z <= 12, 8).when(z === 13, 16).when(z === 14, 32)
      .when(z === 15, 64).when(z === 16, 128).otherwise(256)

  def marginFor(fmt: String, z: Int): Int =
    if (fmt == "wyrm") TileGrid.WyrmMargin else TileGrid.mvtZoomMargin(z)

  /** Explode features to (tile_id, layer, feature) rows for all zooms in
    * [zMin, zMax] where the layer is active. */
  def coverJoin(spark: SparkSession, features: Dataset[Feature],
                group: LayerGroup, extent: Int, fmt: String,
                zMin: Int, zMax: Int): Dataset[TileFeatRow] = {
    import spark.implicits._
    val meta = group.layers.map(l => (l.name, l.zoom.zmin, l.zoom.zmax))
      .toDF("layer", "zmin", "zmax")
    val marginCol =
      if (fmt == "wyrm") lit(TileGrid.WyrmMargin) else mvtMarginCol($"z")
    features.toDF()
      .join(broadcast(meta), Seq("layer"))
      .where($"zmin" <= zMax && $"zmax" >= zMin)
      .withColumn("z",
        explode(sequence(greatest($"zmin", lit(zMin)),
          least($"zmax", lit(zMax)))))
      .withColumn("tile_id",
        explode(GeoFunctions.tileCover($"z", $"xmin", $"ymin", $"xmax",
          $"ymax", marginCol, lit(extent))))
      .select($"tile_id", $"layer", $"kind_rank", $"id", $"values",
        $"rings")
      .as[TileFeatRow]
  }

  /** Per-feature encode (map-side, pre-shuffle). Returns None when the
    * feature is elided for this tile (empty MVT geometry / wyrm not
    * contained). */
  def encodeFeature(cfgE: EngineCfg, group: LayerGroup, fmt: String,
                    layerRank: Map[String, Int])(r: TileFeatRow)
      : Option[FeatPayload] = {
    val rank = layerRank(r.layer)
    val layer = group.layers(rank)
    val tid = TileId.unpack(r.tile_id)
    val tcfg = TileCfg(tid, cfgE.tileExtent, marginFor(fmt, tid.z))
    if (fmt == "mvt") {
      val cmds = Encode.mvtGeometry(layer.geomTp, r.rings, tcfg)
      if (cmds.isEmpty) None
      else {
        val tags = Encode.mvtTags(layer, r.values)
        Some(FeatPayload(r.tile_id, rank, r.kind_rank, r.id, cmds,
          tags.map(_._1),
          tags.map(t => t._2.fold(identity, _.toString)),
          tags.map(_._2.isRight), "", found = true))
      }
    } else {
      val rendered: Option[(String, Boolean)] = layer.geomTp match {
        case GeomTp.Point =>
          Some((Encode.wyrmPoint(layer, r.values, r.rings, tcfg), true))
        case GeomTp.Linestring =>
          Encode.wyrmLinestring(layer, group.osm, r.values, r.rings, tcfg)
            .map((_, true))
        case GeomTp.Polygon =>
          Encode.wyrmPolygon(layer, group.osm, r.values, r.rings, tcfg)
            .map((_, true))
      }
      rendered.map { case (content, found) =>
        FeatPayload(r.tile_id, rank, r.kind_rank, r.id, Array.empty,
          Nil, Nil, Nil, content, found)
      }
    }
  }

  /** Assemble one tile from its pre-encoded features (A3 + A4/A5). */
  def assembleTile(cfgE: EngineCfg, group: LayerGroup, fmt: String,
                   groupName: String)(tileId: Long,
                   rows: Iterator[FeatPayload]): Iterator[TileRow] = {
    val tid = TileId.unpack(tileId)
    val sorted = rows.toArray.sortBy(p => (p.layer_rank, p.kind_rank, p.id))
    if (fmt == "mvt") {
      val layerBytes = scala.collection.mutable.ArrayBuffer
        .empty[Array[Byte]]
      var i = 0
      while (i < sorted.length) {
        val rank = sorted(i).layer_rank
        val layer = group.layers(rank)
        val ml = new MvtLayer(layer.name, cfgE.tileExtent)
        while (i < sorted.length && sorted(i).layer_rank == rank) {
          val p = sorted(i)
          val tags = p.tag_keys.indices.map { j =>
            (p.tag_keys(j),
              if (p.tag_sint(j)) Right(p.tag_vals(j).toLong)
              else Left(p.tag_vals(j)))
          }
          ml.addFeature(MvtFeature(layer.geomTp, p.geom, tags))
          i += 1
        }
        if (ml.numFeatures > 0) layerBytes += ml.encode()
      }
      if (layerBytes.nonEmpty)
        Iterator(TileRow(groupName, tid.z, tid.x, tid.y, fmt,
          MvtTile.assemble(layerBytes.toSeq)))
      else Iterator.empty
    } else {
      // every zoom-active layer gets a <g>, present or not
      // (wyrmenc.rs:62-87); tile emitted iff any feature found
      if (!sorted.exists(_.found)) Iterator.empty
      else {
        val byRank = sorted.groupBy(_.layer_rank)
        val sb = new StringBuilder
        group.layers.zipWithIndex.foreach { case (l, rank) =>
          if (l.checkZoom(tid.z)) {
            sb.append("<g class=\"").append(l.className(None))
              .append("\">")
            byRank.get(rank).foreach(_.foreach(p => sb.append(p.content)))
            sb.append("</g>")
          }
        }
        Iterator(TileRow(groupName, tid.z, tid.x, tid.y, fmt,
          sb.toString.getBytes("UTF-8")))
      }
    }
  }

  /** Full pyramid for one group + format: one shuffle total. */
  def tiles(spark: SparkSession, features: Dataset[Feature], cfgE: EngineCfg,
            groupName: String, fmt: String, zMin: Int, zMax: Int)
      : Dataset[TileRow] = {
    import spark.implicits._
    val group = cfgE.groups.find(_.name == groupName).get
    val layerRank = group.layers.map(_.name).zipWithIndex.toMap
    val cov = coverJoin(spark, features, group, cfgE.tileExtent, fmt,
      zMin, zMax)
    val enc = cov.flatMap(encodeFeature(cfgE, group, fmt, layerRank) _)
    enc.groupByKey(_.tile_id)
      .flatMapGroups(assembleTile(cfgE, group, fmt, groupName) _)
  }
}
