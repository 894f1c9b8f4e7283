package graft.core

/** 2-D point (Web Mercator meters or tile units).
  *
  * Mirrors the semantics of the reference's `pointy::Pt<f64>`
  * (/root/reference/wyrmcast/src/tile.rs:5) — re-implemented from scratch.
  */
final case class Pt(x: Double, y: Double)

/** Axis-aligned bounding box, inclusive on all edges.
  *
  * Semantics match `pointy::BBox<f64>` as used by the reference
  * (/root/reference/wyrmcast/src/tile.rs:41-48, 80-85): `contains` is the
  * `bounded_by` containment test, `clamp` snaps a point into the box.
  */
final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def contains(p: Pt): Boolean =
    p.x >= xmin && p.x <= xmax && p.y >= ymin && p.y <= ymax

  /** Inclusive overlap test (the `bounded_by` of multi-point shapes vs a
    * query box is a bbox-overlap test; see SURVEY.md §2.2 P8). */
  def intersects(o: BBox): Boolean =
    xmin <= o.xmax && xmax >= o.xmin && ymin <= o.ymax && ymax >= o.ymin

  def clamp(p: Pt): Pt = Pt(
    math.min(math.max(p.x, xmin), xmax),
    math.min(math.max(p.y, ymin), ymax))

  /** Expand by a symmetric margin in each axis
    * (reference tile.rs:42-48 margin expansion). */
  def expand(mx: Double, my: Double): BBox =
    BBox(xmin - mx, ymin - my, xmax + mx, ymax + my)
}

object BBox {
  /** BBox of a point sequence; empty input yields an "impossible" box that
    * intersects nothing. */
  def of(pts: Iterable[Pt]): BBox = {
    var x0 = Double.MaxValue; var y0 = Double.MaxValue
    var x1 = Double.MinValue; var y1 = Double.MinValue
    pts.foreach { p =>
      if (p.x < x0) x0 = p.x; if (p.y < y0) y0 = p.y
      if (p.x > x1) x1 = p.x; if (p.y > y1) y1 = p.y
    }
    BBox(x0, y0, x1, y1)
  }
}

/** Affine transform restricted to independent scale + translate per axis —
  * the only shape the reference uses (`grid.peg_transform(peg).scale(e, e)`,
  * /root/reference/wyrmcast/src/tile.rs:49-50). Identity = default. */
final case class Affine(sx: Double = 1.0, sy: Double = 1.0,
                        tx: Double = 0.0, ty: Double = 0.0) {
  def apply(p: Pt): Pt = Pt(p.x * sx + tx, p.y * sy + ty)
  def scale(ex: Double, ey: Double): Affine =
    Affine(sx * ex, sy * ey, tx * ex, ty * ey)
}

object Geom {
  /** Round half away from zero — Rust `f64::round` semantics, NOT Scala
    * `math.round` (which rounds half up: math.round(-0.5) == 0, while Rust
    * gives -1). Needed for parity with reference tile.rs:82-84. */
  def rustRound(v: Double): Int = {
    val r = if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
    r.toInt
  }

  /** Intersection of two infinite lines (a0,a1) and (b0,b1); None when
    * parallel. Mirrors `pointy::Line::intersection` as called at reference
    * tile.rs:150-152 — the first line is the (vertical/horizontal) edge, so
    * the returned point is exact on the edge coordinate. */
  def lineIntersection(a0: Pt, a1: Pt, b0: Pt, b1: Pt): Option[Pt] = {
    val d1x = a1.x - a0.x; val d1y = a1.y - a0.y
    val d2x = b1.x - b0.x; val d2y = b1.y - b0.y
    val denom = d1x * d2y - d1y * d2x
    if (denom == 0.0) None
    else {
      val t = ((b0.x - a0.x) * d2y - (b0.y - a0.y) * d2x) / denom
      Some(Pt(a0.x + t * d1x, a0.y + t * d1y))
    }
  }
}
