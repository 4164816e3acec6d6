package vps.kernels

import org.apache.spark.sql.functions._

object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    vps.geom.Geo.registerUDTs()
    val docs = vps.docs.InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001")
    val cells = vps.docs.InterleavedDocs.extractGeoSpans(docs)
      .select(vps.sql.functions.cell_at(
        vps.sql.functions.st_x(col("geom")), vps.sql.functions.st_y(col("geom")), 10).as("cell"))
      .groupBy("cell").count()
    cells.collect() // materialize AQE stages so codegen is visible
    println(cells.queryExecution.executedPlan.toString.take(2200))
    // minimal repro without our UDT-touching expressions:
    val plain = docs.select(col("id"), explode(col("spans")).as("s"))
      .where(col("s.kind") === "geo").groupBy(col("s.offset")).count()
    println("==== plain (no geometry exprs) ====")
    println(plain.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
