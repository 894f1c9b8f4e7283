package graft.tile

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.expr.GeoFunctions
import graft.model.{Feature, Ring, TileRow}

/** One feature row carried into the per-(tile, layer) encode stage. */
final case class TileFeatRow(tile_id: Long, layer: String, kind_rank: Int,
                             id: Long, values: Seq[String], rings: Seq[Ring])

/** One encoded layer of one tile. `found` carries the wyrm "any feature
  * touched this layer" flag (wyrmenc.rs:62-87); for MVT bytes are the
  * complete layer message. */
final case class EncodedLayer(tile_id: Long, layer_rank: Int, found: Boolean,
                              bytes: Array[Byte])

/** The batch tile-pyramid job (SURVEY.md §3.2 "Spark shape"):
  *
  *   features ⨝ broadcast(layer meta)  — zoom gate P4, plan-time pruned
  *     → explode zooms (sequence)      — one pass over the feature table
  *     → explode tileCover(z, bbox)    — the batched cell-cover expression,
  *                                        J4 (exact bbox-overlap inversion)
  *     → groupByKey (tile, layer)      — A3 layer aggregation (features
  *                                        sorted (kind_rank, id) = the
  *                                        reference's BTreeMap order)
  *     → groupByKey tile               — A4 tile assembly (config order)
  *
  * Two shuffles total; AQE coalesces. Skew note: z0-2 groups aggregate
  * everything — bounded by maxZoom enumeration being per-feature work
  * (cover explode), and the per-group cost is the encode of its features.
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

  /** Encode one layer of one tile (A3). */
  def encodeLayer(cfgE: EngineCfg, group: LayerGroup, fmt: String)(
      key: (Long, String), rows: Iterator[TileFeatRow])
      : Iterator[EncodedLayer] = {
    val (tileId, layerName) = key
    val layer = group.layers.find(_.name == layerName).get
    val rank = group.layers.indexWhere(_.name == layerName)
    val tid = TileId.unpack(tileId)
    val tcfg = TileCfg(tid, cfgE.tileExtent, marginFor(fmt, tid.z))
    val sorted = rows.toArray.sortBy(r => (r.kind_rank, r.id))
    if (fmt == "mvt") {
      val ml = new MvtLayer(layerName, cfgE.tileExtent)
      sorted.foreach { r =>
        val cmds = Encode.mvtGeometry(layer.geomTp, r.rings, tcfg)
        if (cmds.nonEmpty)
          ml.addFeature(MvtFeature(layer.geomTp, cmds,
            Encode.mvtTags(layer, r.values)))
      }
      if (ml.numFeatures > 0)
        Iterator(EncodedLayer(tileId, rank, found = true, ml.encode()))
      else Iterator.empty
    } else {
      val sb = new StringBuilder
      var found = false
      sorted.foreach { r =>
        layer.geomTp match {
          case GeomTp.Point =>
            sb.append(Encode.wyrmPoint(layer, r.values, r.rings, tcfg))
            found = true
          case GeomTp.Linestring =>
            Encode.wyrmLinestring(layer, group.osm, r.values, r.rings, tcfg)
              .foreach { s => sb.append(s); found = true }
          case GeomTp.Polygon =>
            Encode.wyrmPolygon(layer, group.osm, r.values, r.rings, tcfg)
              .foreach { s => sb.append(s); found = true }
        }
      }
      if (found || sb.nonEmpty)
        Iterator(EncodedLayer(tileId, rank, found,
          sb.toString.getBytes("UTF-8")))
      else Iterator.empty
    }
  }

  /** Assemble layers into tiles (A4/A5). */
  def assembleTiles(spark: SparkSession, layers: Dataset[EncodedLayer],
                    cfgE: EngineCfg, group: LayerGroup, fmt: String,
                    groupName: String): Dataset[TileRow] = {
    import spark.implicits._
    layers.groupByKey(_.tile_id).flatMapGroups {
      (tileId: Long, rows: Iterator[EncodedLayer]) =>
        val tid = TileId.unpack(tileId)
        val byRank = rows.toArray.sortBy(_.layer_rank)
        if (fmt == "mvt") {
          // config-order concat of layer messages (A4)
          val bytes = MvtTile.assemble(byRank.map(_.bytes).toSeq)
          if (byRank.nonEmpty)
            Iterator(TileRow(groupName, tid.z, tid.x, tid.y, fmt, bytes))
          else Iterator.empty
        } else {
          // every zoom-active layer gets a <g>, present or not
          // (wyrmenc.rs:62-87); tile emitted iff any layer found
          val anyFound = byRank.exists(_.found)
          if (!anyFound) Iterator.empty
          else {
            val content = mutable_indexed(byRank)
            val sb = new StringBuilder
            group.layers.zipWithIndex.foreach { case (l, rank) =>
              if (l.checkZoom(tid.z)) {
                sb.append("<g class=\"")
                  .append(l.className(None)).append("\">")
                content.get(rank).foreach(b =>
                  sb.append(new String(b, "UTF-8")))
                sb.append("</g>")
              }
            }
            Iterator(TileRow(groupName, tid.z, tid.x, tid.y, fmt,
              sb.toString.getBytes("UTF-8")))
          }
        }
    }
  }

  private def mutable_indexed(rows: Array[EncodedLayer])
      : Map[Int, Array[Byte]] =
    rows.map(r => r.layer_rank -> r.bytes).toMap

  /** Full pyramid for one group + format. */
  def tiles(spark: SparkSession, features: Dataset[Feature], cfgE: EngineCfg,
            groupName: String, fmt: String, zMin: Int, zMax: Int)
      : Dataset[TileRow] = {
    import spark.implicits._
    val group = cfgE.groups.find(_.name == groupName).get
    val cov = coverJoin(spark, features, group, cfgE.tileExtent, fmt,
      zMin, zMax)
    val enc = cov.groupByKey(r => (r.tile_id, r.layer))
      .flatMapGroups(encodeLayer(cfgE, group, fmt) _)
    assembleTiles(spark, enc, cfgE, group, fmt, groupName)
  }
}
