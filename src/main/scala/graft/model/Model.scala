package graft.model

/** One span of an interleaved document (the BASELINE.json `input_hint`
  * schema — exact column names/types). */
final case class Span(kind: String, text: String, media_ref: String,
                      offset: Int)

/** One interleaved text+media document. */
final case class Doc(doc_id: String, spans: Seq[Span])

/** Relation member (ordered). */
final case class Member(role: String, ref_kind: String, ref_id: Long)

/** OSM-analog entity decoded from a document's spans (SURVEY.md §1.1).
  * `lat`/`lon` are null for non-nodes; `node_refs` ordered (ways);
  * `members` ordered (relations). */
final case class OsmEntity(
    entity_kind: String,
    id: Long,
    tags: Map[String, String],
    lat: Option[Double],
    lon: Option[Double],
    node_refs: Seq[Long],
    members: Seq[Member])

/** One geometry part: a point set / line / polygon ring. `outer` is
  * meaningful for polygon rings only (reference osm.rs:108-115). Parallel
  * coordinate arrays (Web Mercator meters) are columnar-friendly. */
final case class Ring(outer: Boolean, xs: Array[Double], ys: Array[Double])

/** One feature of a layer: geometry + positional tag values (nullable, in
  * include-pattern order — reference geom.rs:23-24).
  * `kind_rank` orders features as the reference's BTreeMap iteration does
  * (node=0 < way=1 < relation=2, then id; SURVEY.md §2.5).
  * The bbox columns are precomputed for cover joins / pruning; an empty
  * geometry carries an inverted bbox that covers no tile. */
final case class Feature(
    layer: String,
    kind_rank: Int,
    id: Long,
    values: Seq[String],
    rings: Seq[Ring],
    xmin: Double, ymin: Double, xmax: Double, ymax: Double)

/** One produced tile. */
final case class TileRow(group: String, z: Int, x: Int, y: Int, fmt: String,
                         bytes: Array[Byte])
