package graft.core

import scala.collection.mutable

/** Relative SVG path-definition builder with integer precision — mirrors
  * the observable output of the reference's `hatmil::PathDefBuilder` with
  * `precision(0)` (inferred from the published example tile in
  * /root/reference/earthwyrm/README.md:11-27: `m-8 -8h272v272h-272v-272z`):
  * absolute integer inputs, relative `m`/`h`/`v`/`l` output, `z` close,
  * two-argument commands separated by a single space.
  */
final class SvgPathBuilder {
  private val sb = new StringBuilder
  private var penX = 0
  private var penY = 0
  private var startX = 0
  private var startY = 0

  def moveTo(x: Int, y: Int): Unit = {
    sb.append('m').append(x - penX).append(' ').append(y - penY)
    penX = x; penY = y
    startX = x; startY = y
  }

  def lineTo(x: Int, y: Int): Unit = {
    val dx = x - penX; val dy = y - penY
    if (dx == 0 && dy == 0) return
    if (dy == 0) sb.append('h').append(dx)
    else if (dx == 0) sb.append('v').append(dy)
    else sb.append('l').append(dx).append(' ').append(dy)
    penX = x; penY = y
  }

  /** Close the subpath; the pen returns to the subpath start (SVG `z`
    * semantics — load-bearing for multi-ring polygons). */
  def close(): Unit = {
    sb.append('z')
    penX = startX; penY = startY
  }

  def result(): String = sb.toString
}

/** Tiny SVG-fragment element writer (the reference uses the `hatmil` HTML
  * builder, wyrmenc.rs:14 / point.rs:39-51; output shape matches the
  * published example fragment in earthwyrm/README.md:11-27).
  * Repeated `class` calls accumulate space-separated. */
final class SvgElem(tag: String) {
  private val classes = mutable.ArrayBuffer.empty[String]
  private val attrs = mutable.ArrayBuffer.empty[(String, String)]
  private val children = mutable.ArrayBuffer.empty[SvgElem]

  def cls(c: String): this.type = { classes += c; this }
  def attr(k: String, v: String): this.type = { attrs += ((k, v)); this }
  def data(tag: String, v: String): this.type = attr(s"data-$tag", v)
  def child(e: SvgElem): e.type = { children += e; e }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def render(sb: StringBuilder): Unit = {
    sb.append('<').append(tag)
    if (classes.nonEmpty)
      sb.append(" class=\"").append(esc(classes.mkString(" "))).append('"')
    attrs.foreach { case (k, v) =>
      sb.append(' ').append(k).append("=\"").append(esc(v)).append('"')
    }
    if (children.isEmpty && tag != "g") sb.append("/>")
    else {
      sb.append('>')
      children.foreach(_.render(sb))
      sb.append("</").append(tag).append('>')
    }
  }

  def render(): String = { val sb = new StringBuilder; render(sb); sb.toString }
}
