package graft.dig

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

import graft.core._
import graft.model.{Feature, Ring}

/** Entities → per-layer feature table (reference `wyrmcast dig`,
  * SURVEY.md §3.1), as ONE multi-layer Spark job instead of the reference's
  * per-layer re-scan (21 PBF passes → 1 pass; intentional deviation with
  * identical output, SURVEY.md §4).
  *
  * Scale shape: the entity table is scanned once; layer matching is a
  * generated-column explode; the dependency closure and coordinate lookups
  * are two global equi-joins (shuffle on id) shared by ALL layers; ring
  * assembly is parallel across relations (`groupByKey.mapGroups` — the
  * algorithm is order-sensitive and sequential per relation BY DESIGN,
  * reference osm.rs:310-350).
  */
object Dig {

  /** Compile one tag pattern to a Column predicate over a
    * map<string,string> `tags` column (reference layer.rs:174-189):
    * Equal → value ∈ set (missing matches iff "_" ∈ set);
    * NotEqual → negation. */
  def patternPredicate(p: TagPattern, tags: Column): Column = {
    val v = try_element_at(tags, lit(p.tag)) // null-safe under ANSI
    val in = when(v.isNull, lit(p.values.contains("_")))
      .otherwise(v.isin(p.values: _*))
    if (p.equal) in else !in
  }

  /** Layer match predicate = kind gate (reference osm.rs:51-61) AND all
    * must-match patterns. */
  def layerPredicate(l: LayerDef, kind: Column, tags: Column): Column = {
    val kindGate = l.geomTp match {
      case GeomTp.Polygon => kind === "relation" || kind === "way"
      case _ => lit(true)
    }
    l.patterns.filter(_.mustMatch)
      .map(patternPredicate(_, tags))
      .foldLeft(kindGate)(_ && _)
  }

  /** Include-projection: positional values array in pattern order;
    * `osm_id` pseudo-tag materializes the id (reference osm.rs:208-217).
    * One CASE chain over all layers keeps this a single pass. */
  def valuesColumn(layers: Seq[LayerDef], layer: Column, id: Column,
                   tags: Column): Column = {
    def arrFor(l: LayerDef): Column =
      if (l.includeTags.isEmpty) array().cast("array<string>")
      else array(l.includeTags.map { case (t, _) =>
        if (t == "osm_id") id.cast("string")
        else try_element_at(tags, lit(t))
      }: _*)
    layers.foldRight(lit(null).cast("array<string>")) { (l, acc) =>
      when(layer === l.name, arrFor(l)).otherwise(acc)
    }
  }

  /** (layer, entity) rows: each entity exploded to the layers whose
    * predicate it matches — single scan for all layers. */
  def matched(entities: DataFrame, layers: Seq[LayerDef]): DataFrame = {
    val arr = array(layers.map(l =>
      when(layerPredicate(l, col("entity_kind"), col("tags")),
        lit(l.name))): _*)
    entities.withColumn("layer",
      explode(filter(arr, x => x.isNotNull)))
  }

  /** The full dig: returns the Feature dataset for all osm-flagged groups.
    *
    * Replicates the reference's ObjMap semantics exactly, including the
    * dependency quirks (SURVEY.md §2.7 G8): per layer the object map =
    * matched entities ∪ member ways of matched relations ∪ all their nodes;
    * then point layers emit EVERY node in the map, linestring layers EVERY
    * way, polygon layers every closed way (no tag re-check) + every
    * tag-matching relation.
    */
  def features(spark: SparkSession, entities: DataFrame,
               cfg: EngineCfg): Dataset[Feature] = {
    import spark.implicits._
    val layers: Seq[LayerDef] =
      cfg.groups.filter(_.osm).flatMap(_.layers)

    // LAZY caches: the final union scans each of these several times
    // within one job; the cache dedupes recomputation per partition.
    // No eager count() barriers — three blocking full passes cost more
    // than the bounded duplicate work of concurrent first-fills
    // (measured: dig wall time unchanged without them, VERDICT r1 #6).
    val m = matched(entities, layers)
      .select("layer", "entity_kind", "id", "tags", "lat", "lon",
        "node_refs", "members").cache()

    // ---- dependency closure (S2/J3): the reference's get_objs_and_deps
    // (osmpbfreader) pulls in ALL member kinds TRANSITIVELY: relation →
    // member relations (recursive) → member ways → their nodes, plus
    // relation node members. Replicated as a per-nesting-depth join loop
    // (OSM relation nesting is shallow; the loop exits after one extra
    // cheap round on corpora without nested relations). ----
    val matchedRel = m.where($"entity_kind" === "relation")
    val matchedWay = m.where($"entity_kind" === "way")
    val matchedNode = m.where($"entity_kind" === "node")

    val allWays = entities.where($"entity_kind" === "way")
      .select($"id", $"tags", $"node_refs")
    val allNodes = entities.where($"entity_kind" === "node")
      .select($"id", $"tags",
        graft.expr.GeoFunctions.mercX($"lon").as("x"),
        graft.expr.GeoFunctions.mercY($"lat").as("y"))
    val allRels = entities.where($"entity_kind" === "relation")
      .select($"id", $"members")

    // transitive relation-member closure (per layer). r6: the seed frame
    // is NOT checkpointed — it is one cheap filter over the cached `m`
    // and checkpointing it eagerly serialized a full materialization
    // pass before any other branch could start; the loop's own frames
    // (newRels, the growing union) stay checkpointed, which is where
    // lineage truncation actually matters.
    var mapRels = matchedRel.select($"layer", $"id", $"members")
    var frontier = mapRels
    var closed = false
    while (!closed) {
      val memberRelIds = frontier
        .select($"layer", explode($"members").as("mm"))
        .where($"mm.ref_kind" === "relation")
        .select($"layer", $"mm.ref_id".as("id"))
        .distinct()
      val newRels = memberRelIds.join(allRels, "id")
        .join(mapRels.select($"layer", $"id"), Seq("layer", "id"),
          "left_anti")
        .select($"layer", $"id", $"members")
        .localCheckpoint(true)
      if (newRels.isEmpty) closed = true
      else {
        mapRels = mapRels.unionByName(newRels).localCheckpoint(true)
        frontier = newRels
      }
    }

    val memberWayIds = mapRels
      .select($"layer", explode($"members").as("mm"))
      .where($"mm.ref_kind" === "way")
      .select($"layer", $"mm.ref_id".as("id"))
      .distinct()
    val depWays = memberWayIds.join(allWays, "id")
      .select($"layer", $"id", $"tags", $"node_refs")

    // node members of map relations join the map too (they feed point
    // layers via "EVERY node in the map", osm.rs:226-231)
    val memberNodeIds = mapRels
      .select($"layer", explode($"members").as("mm"))
      .where($"mm.ref_kind" === "node")
      .select($"layer", $"mm.ref_id".as("id"))
      .distinct()
    val depMemberNodes = memberNodeIds.join(allNodes, Seq("id"))
      .select($"layer", $"id", $"tags", $"x", $"y")

    // ObjMap ways per layer (a way may be both matched and a dependency)
    val mapWays = matchedWay.select($"layer", $"id", $"tags", $"node_refs")
      .unionByName(depWays)
      .dropDuplicates("layer", "id")
      .cache()

    // ---- way coordinates: one global join, deduped across layers ----
    val wayIds = mapWays.select($"id", $"node_refs")
      .dropDuplicates("id")
    val wayCoords = wayIds
      .select($"id".as("way_id"),
        posexplode($"node_refs").as(Seq("pos", "nid")))
      .join(allNodes.select($"id".as("nid"), $"x", $"y"), Seq("nid"), "left")
      .groupBy($"way_id")
      .agg(sort_array(collect_list(struct($"pos", $"nid", $"x", $"y")))
        .as("nds"))
      .select($"way_id",
        transform($"nds", n => n("nid")).as("ref_ids"),
        // missing node → NaN marker (array<double> cannot carry nulls
        // through the typed ring-assembly path)
        transform($"nds", n => coalesce(n("x"), lit(Double.NaN))).as("xs"),
        transform($"nds", n => coalesce(n("y"), lit(Double.NaN))).as("ys"),
        aggregate($"nds", lit(0),
          (acc, n) => acc + when(n("x").isNull, 1).otherwise(0))
          .as("n_missing"))
      .cache()

    // node-dependency closure: every ref'd node joins the map
    val refNodeIds = mapWays
      .select($"layer", explode($"node_refs").as("id")).distinct()
    val depNodes = refNodeIds
      .join(allNodes, Seq("id"))
      .select($"layer", $"id", $"tags", $"x", $"y")
    val mapNodes = matchedNode
      .select($"layer", $"id", $"tags",
        graft.expr.GeoFunctions.mercX($"lon").as("x"),
        graft.expr.GeoFunctions.mercY($"lat").as("y"))
      .unionByName(depNodes)
      .unionByName(depMemberNodes)
      .dropDuplicates("layer", "id")

    val layerMeta = layers.map(l =>
      (l.name, l.geomTp.rank)).toDF("layer", "geom_rank")
    def vals(id: Column, tags: Column) =
      valuesColumn(layers, $"layer", id, tags)

    // ---- point features: EVERY node in the map (osm.rs:226-231) ----
    val pointLayers = layers.filter(_.geomTp == GeomTp.Point).map(_.name)
    val pointFeatures = mapNodes
      .where($"layer".isin(pointLayers: _*))
      .select($"layer", lit(0).as("kind_rank"), $"id",
        vals($"id", $"tags").as("values"),
        array(struct(lit(true).as("outer"),
          array($"x").as("xs"), array($"y").as("ys"))).as("rings"),
        $"x".as("xmin"), $"y".as("ymin"), $"x".as("xmax"), $"y".as("ymax"))

    // ---- linestring features (EVERY way in the map, osm.rs:248-253;
    //      empty node list → skipped; missing node → empty line) and
    //      way-polygon features (every CLOSED way in the map, no tag
    //      re-check, osm.rs:161-177, 280-286), as ONE pass (r6): the two
    //      branches ran the identical mapWays⋈wayCoords join and the
    //      identical ring/bbox construction twice over disjoint layer
    //      sets (a layer has exactly one geometry type) — the merged
    //      predicate keeps the exact union of rows with half the join
    //      and ring-assembly work. kind_rank is 1 for both. ----
    val lineLayers = layers.filter(_.geomTp == GeomTp.Linestring).map(_.name)
    val polyLayers = layers.filter(_.geomTp == GeomTp.Polygon).map(_.name)
    val wayWithCoords = mapWays
      .join(wayCoords, mapWays("id") === wayCoords("way_id"), "left")
      .where(size($"node_refs") > 0)
    val lineAndWayPolyFeatures = wayWithCoords
      .where($"layer".isin(lineLayers: _*) ||
        ($"layer".isin(polyLayers: _*) &&
          size($"node_refs") > 1 &&
          get($"node_refs", lit(0)) ===
            get($"node_refs", size($"node_refs") - 1)))
      .select($"layer", lit(1).as("kind_rank"), $"id",
        vals($"id", $"tags").as("values"),
        lineRings($"n_missing", $"xs", $"ys").as("rings"))
      .withColumn("bb", ringsBBox($"rings"))
      .select($"layer", $"kind_rank", $"id", $"values", $"rings",
        $"bb.xmin", $"bb.ymin", $"bb.xmax", $"bb.ymax")

    // ---- relation-polygon features: ring assembly per relation ----
    val relMembers = matchedRel
      .where($"layer".isin(polyLayers: _*))
      .select($"layer", $"id".as("rel_id"),
        vals($"id", $"tags").as("values"),
        // _outer: a relation with zero members still yields a (ring-less)
        // feature, as the reference does (osm.rs:152-153 with empty refs)
        posexplode_outer($"members").as(Seq("pos", "mm")))
      .select($"layer", $"rel_id", $"values",
        coalesce($"pos", lit(-1)).as("pos"),
        coalesce($"mm.role", lit("")).as("role"),
        when($"mm.ref_kind" === "way", $"mm.ref_id").as("way_id"))
    val relWithWays = relMembers
      .join(wayCoords, Seq("way_id"), "left")
      .select($"layer", $"rel_id", $"values", $"pos", $"role",
        $"ref_ids", $"xs", $"ys",
        coalesce($"n_missing", lit(0)).as("n_missing"))
      .as[RelMemberRow]
    val relPolyFeatures = relWithWays
      .groupByKey(r => (r.layer, r.rel_id))
      .flatMapGroups {
        (key: (String, Long), rows: Iterator[RelMemberRow]) =>
          RingAssembly.assemble(key._1, key._2,
            rows.toSeq.sortBy(_.pos)).iterator
      }
      .toDF()

    val all = pointFeatures
      .unionByName(lineAndWayPolyFeatures)
      .unionByName(relPolyFeatures.select(
        $"layer", $"kind_rank", $"id", $"values", $"rings",
        $"xmin", $"ymin", $"xmax", $"ymax"))
    all.as[Feature]
  }

  /** rings column for a single-line/single-ring way: empty coordinate
    * arrays when any node was missing (reference osm.rs:191-205:
    * lookup_nodes → empty on any miss, geometry still emitted). */
  private def lineRings(nMissing: Column, xs: Column, ys: Column): Column =
    when(nMissing > 0 || xs.isNull,
      array(struct(lit(true).as("outer"),
        array().cast("array<double>").as("xs"),
        array().cast("array<double>").as("ys"))))
    .otherwise(array(struct(lit(true).as("outer"),
      xs.cast("array<double>").as("xs"), ys.cast("array<double>").as("ys"))))

  /** bbox of all ring coordinates; empty → inverted (covers nothing). */
  private def ringsBBox(rings: Column): Column = {
    val xs = flatten(transform(rings, r => r("xs")))
    val ys = flatten(transform(rings, r => r("ys")))
    struct(
      coalesce(array_min(xs), lit(Double.MaxValue)).as("xmin"),
      coalesce(array_min(ys), lit(Double.MaxValue)).as("ymin"),
      coalesce(array_max(xs), lit(Double.MinValue)).as("xmax"),
      coalesce(array_max(ys), lit(Double.MinValue)).as("ymax"))
  }
}

/** One relation member row entering ring assembly. */
final case class RelMemberRow(
    layer: String, rel_id: Long, values: Seq[String], pos: Int,
    role: String, ref_ids: Seq[Long], xs: Seq[Double], ys: Seq[Double],
    n_missing: Int)

/** Literal port of the reference's ring stitching
  * (/root/reference/wyrmcast/src/osm.rs:101-158, 310-357): member order is
  * load-bearing; `swap_remove` order is load-bearing; a leftover open way
  * ⇒ broken polygon ⇒ the WHOLE feature is dropped; a ring's role is the
  * role of the member being processed when it closes. */
object RingAssembly {

  private def endPoints(w: Vector[Long]): (Long, Long) = (w.head, w.last)

  private def swapRemove[T](buf: mutable.ArrayBuffer[T], j: Int): T = {
    val v = buf(j)
    buf(j) = buf(buf.length - 1)
    buf.remove(buf.length - 1)
    v
  }

  /** One connection step (reference connect_ways, osm.rs:310-338). */
  private def connectWays(ways: mutable.ArrayBuffer[Vector[Long]])
      : Boolean = {
    val len = ways.length
    var i = 0
    while (i < len - 1) {
      val (a0, a1) = endPoints(ways(i))
      var j = i + 1
      while (j < len) {
        val (b0, b1) = endPoints(ways(j))
        if (a0 == b0 || a0 == b1 || a1 == b0 || a1 == b1) {
          var way = swapRemove(ways, j)
          // do not reverse way `a` if both ends connect
          if (a1 != b0 && a1 != b1) ways(i) = ways(i).reverse
          val na1 = ways(i).last
          if (b1 == na1) way = way.reverse
          require(way.head == na1)
          ways(i) = ways(i).dropRight(1) ++ way
          return true
        }
        j += 1
      }
      i += 1
    }
    false
  }

  /** Extract a closed ring if present (reference find_ring,
    * osm.rs:341-350). */
  private def findRing(ways: mutable.ArrayBuffer[Vector[Long]])
      : Option[Vector[Long]] = {
    var i = 0
    while (i < ways.length) {
      val (w0, w1) = endPoints(ways(i))
      if (w0 == w1) return Some(swapRemove(ways, i))
      i += 1
    }
    None
  }

  /** Assemble one relation's rings; None (empty result) when broken. */
  def assemble(layer: String, relId: Long, rows: Seq[RelMemberRow])
      : Option[Feature] = {
    // node-id → coords map over all member ways (the lookup happens per
    // found ring, reference osm.rs:138); NaN marks a node absent from the
    // corpus (≡ absent from the reference's ObjMap)
    val coords = mutable.LongMap.empty[(Double, Double)]
    rows.foreach { r =>
      if (r.ref_ids != null && r.xs != null) {
        var i = 0
        while (i < r.ref_ids.length) {
          coords(r.ref_ids(i)) = (r.xs(i), r.ys(i))
          i += 1
        }
      }
    }
    val ways = mutable.ArrayBuffer.empty[Vector[Long]]
    val rings = mutable.ArrayBuffer.empty[(Boolean, Vector[Long])]
    val values: Seq[String] = rows.headOption.map(_.values).getOrElse(Nil)
    rows.foreach { r =>
      val outerOpt = r.role match {
        case "outer" => Some(true)
        case "inner" => Some(false)
        case _ => None
      }
      outerOpt.foreach { outer =>
        // way_nodes: only ways in the map with > 1 node (osm.rs:180-188);
        // a missing way (null join) or short way yields empty → skipped
        val nodes: Vector[Long] =
          if (r.ref_ids == null || r.ref_ids.length <= 1) Vector.empty
          else r.ref_ids.toVector
        if (nodes.nonEmpty) {
          ways += nodes
          var continue = ways.length > 1
          while (continue) {
            if (!connectWays(ways)) continue = false
            else continue = ways.length > 1
          }
          var ring = findRing(ways)
          while (ring.isDefined) {
            rings += ((outer, ring.get))
            ring = findRing(ways)
          }
        }
      }
    }
    if (ways.nonEmpty) None // broken polygon (osm.rs:152-157)
    else {
      // lookup_nodes per ring: ANY missing node → empty ring coords
      val outRings = rings.map { case (outer, ids) =>
        val ok = ids.forall(id =>
          coords.contains(id) && !coords(id)._1.isNaN)
        if (ok) {
          val xs = new Array[Double](ids.length)
          val ys = new Array[Double](ids.length)
          var i = 0
          while (i < ids.length) {
            val c = coords(ids(i)); xs(i) = c._1; ys(i) = c._2; i += 1
          }
          Ring(outer, xs, ys)
        } else Ring(outer, Array.empty, Array.empty)
      }.toSeq
      val allX = outRings.flatMap(_.xs)
      val allY = outRings.flatMap(_.ys)
      Some(Feature(layer, 2, relId, values, outRings,
        if (allX.isEmpty) Double.MaxValue else allX.min,
        if (allY.isEmpty) Double.MaxValue else allY.min,
        if (allX.isEmpty) Double.MinValue else allX.max,
        if (allY.isEmpty) Double.MinValue else allY.max))
    }
  }
}
