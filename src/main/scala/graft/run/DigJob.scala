package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.EngineCfg
import graft.dig.Dig
import graft.extract.Extract

/** Materialize the feature table — the loam-sink analog (SURVEY.md §2.1
  * S4): one Parquet partition per layer, rows sorted by the packed
  * quadtree cell of the feature bbox center at `sortZoom`, so Parquet
  * min/max stats + partition pruning replace the reference's per-layer
  * R-tree for bbox queries. Empty layers naturally produce no files
  * (the reference cancels the loam writer, osm.rs:234-237). */
object DigJob {
  def run(spark: SparkSession, docs: DataFrame, cfgE: EngineCfg,
          out: String, sortZoom: Int = 12): Unit = {
    val entities = Extract.entities(docs)
    val features = Dig.features(spark, entities, cfgE).toDF()
    val cx = (col("xmin") + col("xmax")) / 2
    val cy = (col("ymin") + col("ymax")) / 2
    features
      .withColumn("cell",
        when(col("xmin") <= col("xmax"),
          graft.query.Query.pointCell(sortZoom, cx, cy)).otherwise(-1L))
      .repartition(col("layer"))
      .sortWithinPartitions("layer", "cell")
      .write.format(graft.sources.TableIO.format)
      .mode("overwrite")
      .partitionBy("layer")
      .save(out)
    // per-layer feature counters (reference A6, osm.rs:232/254/287 log
    // lines), written alongside the table as a metrics file
    val counts = spark.read.format(graft.sources.TableIO.format).load(out)
      .groupBy("layer").count().collect()
      .map(r => s"""{"layer":"${r.getString(0)}","features":${r.getLong(1)}}""")
      .mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_metrics.json"), counts)
  }
}
