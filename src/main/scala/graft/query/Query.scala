package graft.query

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.expr.GeoFunctions
import graft.model.Feature

/** Read-side operators over the feature table. */
object Query {

  /** Point query (reference `wyrmcast query lat lon`, main.rs:152-162 +
    * geom.rs:63-136): degenerate bbox vs every layer of every group, no
    * zoom gate; prints matched tag values. Output rows:
    * (group, layer, kind_rank, id, tag, value) in deterministic order. */
  def pointQuery(spark: SparkSession, features: Dataset[Feature],
                 cfg: EngineCfg, lat: Double, lon: Double): DataFrame = {
    import spark.implicits._
    val p = Mercator.project(lon, lat)
    val layers = cfg.groups.flatMap(g => g.layers.map(l => (g.name, l)))
    val meta = layers.map { case (g, l) => (g, l.name) }
      .toDF("group", "layer")
    val tagMeta = layers.flatMap { case (_, l) =>
      l.includeTags.zipWithIndex.map { case ((t, sint), i) =>
        (l.name, i, t, sint)
      }
    }.toDF("layer", "tag_pos", "tag", "sint")
    features
      .where(lit(p.x) >= $"xmin" && lit(p.x) <= $"xmax" &&
        lit(p.y) >= $"ymin" && lit(p.y) <= $"ymax")
      .join(broadcast(meta), Seq("layer"))
      .select($"group", $"layer", $"kind_rank", $"id",
        posexplode($"values").as(Seq("tag_pos", "value")))
      .where($"value".isNotNull) // tag_values drops nulls (layer.rs:358-360)
      .join(broadcast(tagMeta), Seq("layer", "tag_pos"))
      .select($"group", $"layer", $"kind_rank", $"id", $"tag", $"value")
      .orderBy($"group", $"layer", $"kind_rank", $"id", $"tag")
  }

  /** True point-in-polygon hit query (north-rule extension beyond the
    * reference's bbox-only test): polygon features containing the point. */
  def pipQuery(spark: SparkSession, features: Dataset[Feature],
               cfg: EngineCfg, lat: Double, lon: Double): DataFrame = {
    import spark.implicits._
    val p = Mercator.project(lon, lat)
    val polyLayers = cfg.groups.flatMap(_.layers)
      .filter(_.geomTp == GeomTp.Polygon).map(_.name)
    features
      .where($"layer".isin(polyLayers: _*))
      .where(lit(p.x) >= $"xmin" && lit(p.x) <= $"xmax" &&
        lit(p.y) >= $"ymin" && lit(p.y) <= $"ymax") // bbox prune first
      .where(GeoFunctions.pointInPolygon($"rings", lit(p.x), lit(p.y)))
      .select($"layer", $"kind_rank", $"id")
      .orderBy($"layer", $"kind_rank", $"id")
  }

  /** Single-tile lookup over a materialized tile table — the batch analog
    * of the reference's `GET /{group}/{z}/{x}/{tail}` route
    * (main.rs:215-303): parse the path, filter the pyramid output; empty
    * result ≡ the 404 path. */
  def lookupTile(tiles: DataFrame, path: String): DataFrame =
    graft.core.ZxyPath.parse(path) match {
      case Some((group, t, ext)) =>
        tiles.where(col("group") === group && col("fmt") === ext &&
          col("z") === t.z && col("x") === t.x && col("y") === t.y)
      case None => tiles.where(lit(false)) // malformed → 404
    }

  /** Packed cell of a point at zoom z (single cell, pure floor — the
    * degenerate non-margin cover). */
  def pointCell(z: Int, x: Column, y: Column): Column = {
    val span = TileGrid.tileSpan(z)
    val n = (1 << z) - 1
    val tx = least(lit(n), greatest(lit(0),
      floor((x + lit(Mercator.HalfWorld)) / lit(span)).cast("int")))
    val ty = least(lit(n), greatest(lit(0),
      floor((lit(Mercator.HalfWorld) - y) / lit(span)).cast("int")))
    (lit(z.toLong) * lit(1L << 58) + tx.cast("long") * lit(1L << 29) +
      ty.cast("long"))
  }

  /** Distributed grid-ring kNN join (SURVEY.md §2.3 J6; the reference has
    * no kNN — this is the north-rule extension, after the cell-grid
    * pattern of the Distributed Stream KNN Join literature in PAPERS.md).
    *
    * `queries`: (qid, x, y); `data`: (did, x, y). Returns for each query
    * its k nearest data points as (qid, rank, did, d2).
    *
    * Scale shape: data is cell-partitioned once (shuffle on cell); each
    * round joins only the UNRESOLVED queries' new ring of cells; a query
    * resolves when its kth candidate distance is ≤ r·span (no unsearched
    * cell can beat it). Deterministic: ties broken by data id.
    */
  def knnJoin(spark: SparkSession, queries: DataFrame, data: DataFrame,
              k: Int, z: Int,
              roundCounter: java.util.concurrent.atomic.AtomicInteger = null)
      : DataFrame = {
    import spark.implicits._
    val span = TileGrid.tileSpan(z)
    val n = 1 << z
    val dataCells = data.select($"did", $"x", $"y",
      floor(($"x" + lit(Mercator.HalfWorld)) / lit(span)).cast("int")
        .as("cx"),
      floor((lit(Mercator.HalfWorld) - $"y") / lit(span)).cast("int")
        .as("cy"))
      .withColumn("cx", least(lit(n - 1), greatest(lit(0), $"cx")))
      .withColumn("cy", least(lit(n - 1), greatest(lit(0), $"cy")))
      .repartition(col("cx"), col("cy"))
      .cache()

    val q0 = queries.select($"qid", $"x".as("qx"), $"y".as("qy"),
      least(lit(n - 1), greatest(lit(0),
        floor(($"qx" + lit(Mercator.HalfWorld)) / lit(span)).cast("int")))
        .as("qcx"),
      least(lit(n - 1), greatest(lit(0),
        floor((lit(Mercator.HalfWorld) - $"qy") / lit(span)).cast("int")))
        .as("qcy")).cache()

    // GEOMETRIC radius growth (VERDICT r1 #7): round t searches the
    // Chebyshev annulus (prevR, R] with R doubling each round, so the
    // driver-side loop depth is O(log n) instead of O(n) on sparse data.
    // The resolution guarantee is unchanged: after searching Chebyshev
    // ≤ R, every unsearched cell is ≥ R·span away, so a query with k
    // candidates within R·span can never be beaten.
    def annulusCells(prevR: Int, r: Int): Seq[(Int, Int)] =
      for {
        dx <- -r to r; dy <- -r to r
        if math.max(math.abs(dx), math.abs(dy)) > prevR
      } yield (dx, dy)

    var unresolved = q0
    var best: DataFrame = null
    var prevR = -1
    while (prevR < n - 1 && !unresolved.isEmpty) {
      val r =
        if (prevR < 0) 0 else math.min(n - 1, math.max(1, prevR * 2 + 1))
      // annulus cells as a broadcast offset table while small; past 64k
      // offsets (large z, sparse data) switch to a Chebyshev range join —
      // by then few queries remain unresolved, so the nested-loop side is
      // tiny and the offset table would be the blowup
      val annulusSize =
        (2L * r + 1) * (2L * r + 1) - (if (prevR < 0) 0L
          else (2L * prevR + 1) * (2L * prevR + 1))
      val cand0 =
        if (annulusSize <= 65536) {
          val offsets = annulusCells(prevR, r).toDF("dx", "dy")
          unresolved
            .join(broadcast(offsets))
            .select($"qid", $"qx", $"qy",
              ($"qcx" + $"dx").as("cx"), ($"qcy" + $"dy").as("cy"),
              $"qcx", $"qcy")
            .where($"cx" >= 0 && $"cx" < n && $"cy" >= 0 && $"cy" < n)
            .join(dataCells, Seq("cx", "cy"))
        } else {
          val cheb = greatest(abs($"cx" - $"qcx"), abs($"cy" - $"qcy"))
          unresolved.join(dataCells,
            cheb <= r && cheb > prevR, "inner")
        }
      val cand = cand0
        .select($"qid", $"qx", $"qy", $"qcx", $"qcy", $"did",
          (($"qx" - $"x") * ($"qx" - $"x") +
            ($"qy" - $"y") * ($"qy" - $"y")).as("d2"))
      val acc = if (best == null) cand else best.unionByName(cand)
      // keep only k best per query (bounded state across rounds)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"d2", $"did")
      best = acc.withColumn("rank", row_number().over(w))
        .where($"rank" <= k)
        .drop("rank")
        .localCheckpoint(eager = true)
      // resolution: k candidates AND kth distance ≤ (r·span)²
      val kth = best.groupBy($"qid", $"qcx", $"qcy")
        .agg(count(lit(1)).as("nc"), max($"d2").as("dk"))
      val guarantee = lit(r.toDouble * span) * lit(r.toDouble * span)
      val resolvedIds = kth
        .where($"nc" >= k && $"dk" <= guarantee)
        .select($"qid")
      unresolved = unresolved.join(resolvedIds, Seq("qid"), "left_anti")
        .localCheckpoint(eager = true)
      prevR = r
      if (roundCounter != null) roundCounter.incrementAndGet()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d2", $"did")
    best.select($"qid", $"did", $"d2")
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"qid", $"rank", $"did", $"d2")
  }
}
