package graft.core

import scala.collection.mutable.ArrayBuffer

/** Per-tile configuration: margin-expanded bbox + spatial→tile transform
  * (reference TileCfg, /root/reference/wyrmcast/src/tile.rs:8-91).
  */
final case class TileCfg(tileExtent: Int, tile: TileId, bbox: BBox,
                         transform: Affine) {
  /** Transform point to integer tile coordinates: CLAMP into the margin
    * bbox, then transform, then round half-away-from-zero
    * (reference tile.rs:79-85 — clamp-before-transform is load-bearing:
    * points outside the margin bbox snap to its edge). */
  def xform(p: Pt): (Int, Int) = {
    val q = transform(bbox.clamp(p))
    (Geom.rustRound(q.x), Geom.rustRound(q.y))
  }

  def pointChain(): PointChain = new PointChain(this)
}

object TileCfg {
  /** Build for a tile id (reference TileCfg::new, tile.rs:34-57). */
  def apply(tile: TileId, tileExtent: Int, margin: Int): TileCfg = {
    val bbox = TileGrid.tileBBoxWithMargin(
      tile.z, tile.x, tile.y, tileExtent, margin)
    val transform =
      TileGrid.tileTransform(tile.z, tile.x, tile.y, tileExtent)
    TileCfg(tileExtent, tile, bbox, transform)
  }
}

/** Streaming clip + simplify chain — exact port of the reference's
  * `PointChain` (/root/reference/wyrmcast/src/tile.rs:93-229), including:
  *   - the fixed edge-check order: left (pen→pt), right (pt→pen),
  *     top/y_min (pen→pt), bottom/y_max (pt→pen);
  *   - the IGNORED pen update on the bottom edge (tile.rs:132) — after a
  *     bottom-edge crossing the pen stays at its pre-crossing position;
  *   - the pen being set to the RAW (unclamped) line intersection while the
  *     emitted point is clamped (tile.rs:155-157);
  *   - front-removal coincident simplification and axis-aligned collinear
  *     middle-point removal, both computed in rounded tile-integer space.
  */
final class PointChain(cfg: TileCfg) {
  private val pts = new ArrayBuffer[Pt](4)
  private var pen: Pt = _
  private var hasPen = false
  private var first: Pt = _
  private var hasFirst = false

  def len: Int = pts.length

  /** Push a point to the end of the chain (reference tile.rs:110-140). */
  def pushBack(pt: Pt): Unit = {
    if (!hasPen) { first = pt; hasFirst = true }
    if (hasPen) {
      var p = pen
      hasPen = false
      edgePointX(cfg.bbox.xmin, p, pt).foreach(np => p = np)
      edgePointX(cfg.bbox.xmax, pt, p).foreach(np => p = np)
      edgePointY(cfg.bbox.ymin, p, pt).foreach(np => p = np)
      edgePointY(cfg.bbox.ymax, pt, p) // return ignored (tile.rs:132)
    }
    if (cfg.bbox.contains(pt)) pts += pt
    pen = pt
    hasPen = true
    while (simplifyCoincident()) {}
    while (simplifyLinear()) {}
  }

  /** Crossing of the vertical edge x (reference tile.rs:143-161): pushes the
    * y-clamped intersection, returns the raw intersection as the new pen. */
  private def edgePointX(x: Double, p0: Pt, p1: Pt): Option[Pt] = {
    if ((x < p0.x) != (x < p1.x)) {
      Geom.lineIntersection(Pt(x, 0.0), Pt(x, 1.0), p0, p1).map { ip =>
        val y = math.min(math.max(ip.y, cfg.bbox.ymin), cfg.bbox.ymax)
        pts += Pt(x, y)
        ip
      }
    } else None
  }

  /** Crossing of the horizontal edge y (reference tile.rs:163-182). */
  private def edgePointY(y: Double, p0: Pt, p1: Pt): Option[Pt] = {
    if ((y < p0.y) != (y < p1.y)) {
      Geom.lineIntersection(Pt(0.0, y), Pt(1.0, y), p0, p1).map { ip =>
        val x = math.min(math.max(ip.x, cfg.bbox.xmin), cfg.bbox.xmax)
        pts += Pt(x, y)
        ip
      }
    } else None
  }

  /** Close the loop back to the first point (reference tile.rs:185-189). */
  def connect(): Unit = if (hasFirst) pushBack(first)

  /** Pop the front point (reference tile.rs:192-198). */
  def popFront(): Option[Pt] =
    if (pts.nonEmpty) Some(pts.remove(0)) else None

  /** Remove the FRONT point while the first two round to the same tile
    * integer (reference tile.rs:201-211). */
  private def simplifyCoincident(): Boolean = {
    if (pts.length >= 2) {
      val a = cfg.xform(pts(0))
      val b = cfg.xform(pts(1))
      if (a == b) { pts.remove(0); true } else false
    } else false
  }

  /** Remove the middle of an axis-aligned collinear triple in tile ints
    * (reference tile.rs:214-228). */
  private def simplifyLinear(): Boolean = {
    if (pts.length >= 3) {
      val (p0x, p0y) = cfg.xform(pts(0))
      val (p1x, p1y) = cfg.xform(pts(1))
      val (p2x, p2y) = cfg.xform(pts(2))
      if ((p0x == p1x && p1x == p2x) || (p0y == p1y && p1y == p2y)) {
        pts.remove(1); true
      } else false
    } else false
  }
}
