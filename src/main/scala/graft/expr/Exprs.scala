package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{BBox, TileGrid}

/** Static helpers the generated (Java) code calls — Scala object static
  * forwarders make these reachable as `graft.expr.ExprHelpers.m(...)`. */
object ExprHelpers {
  def coverArray(z: Int, xmin: Double, ymin: Double, xmax: Double,
                 ymax: Double, margin: Int, extent: Int): ArrayData =
    new GenericArrayData(
      TileGrid.cover(z, BBox(xmin, ymin, xmax, ymax), extent, margin))

  /** Even-odd ray cast over all rings (outer + holes) of a polygon
    * (SURVEY.md §2.3 J5 — an extension beyond the reference's bbox-only
    * point query). Rings: array<struct<outer:bool, xs:array<double>,
    * ys:array<double>>>. */
  def pointInPolygon(rings: ArrayData, px: Double, py: Double): Boolean = {
    var inside = false
    var r = 0
    val nr = rings.numElements()
    while (r < nr) {
      val ring = rings.getStruct(r, 3)
      val xs = ring.getArray(1)
      val ys = ring.getArray(2)
      val n = xs.numElements()
      if (n >= 2) {
        // stored rings repeat the first point at the end; iterate segments
        var i = 0
        while (i < n - 1) {
          val x0 = xs.getDouble(i); val y0 = ys.getDouble(i)
          val x1 = xs.getDouble(i + 1); val y1 = ys.getDouble(i + 1)
          if ((y0 > py) != (y1 > py) &&
              px < (x1 - x0) * (py - y0) / (y1 - y0) + x0)
            inside = !inside
          i += 1
        }
        // defensive wrap for unclosed rings
        val xl = xs.getDouble(n - 1); val yl = ys.getDouble(n - 1)
        val xf = xs.getDouble(0); val yf = ys.getDouble(0)
        if (!(xl == xf && yl == yf)) {
          if ((yl > py) != (yf > py) &&
              px < (xf - xl) * (py - yl) / (yf - yl) + xl)
            inside = !inside
        }
      }
      r += 1
    }
    inside
  }
}

/** Shared plumbing for N-ary expressions that lower to one static call. */
trait StaticCallExpression extends Expression {
  /** Fully-qualified static method the codegen calls. */
  def staticMethod: String
  def javaResultType: String

  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null else evalNotNull(vals)
  }

  protected def evalNotNull(vals: Seq[Any]): Any

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val anyNull =
      if (nullable) cs.map(_.isNull.code).mkString("(", " || ", ")")
      else "false"
    val args = cs.map(_.value.code).mkString(", ")
    val childCode = cs.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        $javaResultType ${ev.value} = ${defaultJavaValue};
        if (!${ev.isNull}) {
          ${ev.value} = $staticMethod($args);
        }
      """)
  }

  protected def defaultJavaValue: String =
    if (javaResultType == "boolean") "false"
    else if (javaResultType == "double") "0.0"
    else if (javaResultType == "long") "0L"
    else if (javaResultType == "int") "0"
    else "null"
}

/** Batched tile-cell cover (the "H3/S2 cell encode" of the north rule): all
  * tiles at zoom z whose margin-expanded bbox intersects the feature bbox,
  * as packed 63-bit cell ids. Codegen-friendly: whole-stage codegen emits a
  * single static call per row. */
case class TileCover(z: Expression, xmin: Expression, ymin: Expression,
                     xmax: Expression, ymax: Expression, margin: Expression,
                     extent: Expression) extends StaticCallExpression {
  override def children: Seq[Expression] =
    Seq(z, xmin, ymin, xmax, ymax, margin, extent)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def staticMethod: String = "graft.expr.ExprHelpers.coverArray"
  override def javaResultType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"

  override protected def evalNotNull(v: Seq[Any]): Any =
    ExprHelpers.coverArray(
      v(0).asInstanceOf[Int],
      v(1).asInstanceOf[Double], v(2).asInstanceOf[Double],
      v(3).asInstanceOf[Double], v(4).asInstanceOf[Double],
      v(5).asInstanceOf[Int], v(6).asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(z = c(0), xmin = c(1), ymin = c(2), xmax = c(3), ymax = c(4),
      margin = c(5), extent = c(6))
}

/** Ray-cast point-in-polygon over a rings column. */
case class PointInPolygon(rings: Expression, x: Expression, y: Expression)
    extends StaticCallExpression {
  override def children: Seq[Expression] = Seq(rings, x, y)
  override def dataType: DataType = BooleanType
  override def staticMethod: String = "graft.expr.ExprHelpers.pointInPolygon"
  override def javaResultType: String = "boolean"

  override protected def evalNotNull(v: Seq[Any]): Any =
    ExprHelpers.pointInPolygon(v(0).asInstanceOf[ArrayData],
      v(1).asInstanceOf[Double], v(2).asInstanceOf[Double])

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(rings = c(0), x = c(1), y = c(2))
}

/** Column-API surface for the engine's geo functions. */
object GeoFunctions {
  import graft.core.Mercator.R

  /** WGS84 → Web Mercator, composed from built-ins (codegen'd, bit-identical
    * to graft.core.Mercator.project which uses java.lang.Math). */
  def mercX(lon: Column): Column = lit(R) * radians(lon)
  def mercY(lat: Column): Column =
    lit(R) * log(tan(lit(math.Pi / 4.0) + radians(lat) / lit(2.0)))

  /** Inclusive bbox-overlap predicate (plain Column algebra — P8). */
  def bboxIntersects(axmin: Column, aymin: Column, axmax: Column,
                     aymax: Column, bxmin: Column, bymin: Column,
                     bxmax: Column, bymax: Column): Column =
    axmin <= bxmax && axmax >= bxmin && aymin <= bymax && aymax >= bymin

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def tileCover(z: Column, xmin: Column, ymin: Column, xmax: Column,
                ymax: Column, margin: Column, extent: Column): Column =
    column(TileCover(expression(z), expression(xmin), expression(ymin),
      expression(xmax), expression(ymax), expression(margin),
      expression(extent)))

  def pointInPolygon(rings: Column, x: Column, y: Column): Column =
    column(PointInPolygon(expression(rings), expression(x), expression(y)))
}
