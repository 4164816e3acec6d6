package vps.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import vps.SparkTestSession

class VpsExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=vps.sql.VpsExtensions injects the SQL surface") {
    val shared = SparkTestSession.spark // ensure the shared context exists
    // spark.sql.extensions is a STATIC conf (first session in the JVM only);
    // in-JVM tests must use the programmatic withExtensions route — same
    // class, same injection path. Clear the default session so getOrCreate
    // builds a new one with the extensions applied.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new VpsExtensions())
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT st_x(st_point(12.5, -3.25)) AS x,
          |       tile_x(CAST(12.5 AS DOUBLE), 8) AS tx,
          |       st_astext(st_reproject(st_point(15.0, 0.0), 'EPSG:4326', 'EPSG:32633')) AS utm,
          |       ngram_jaccard('abcdefgh', 'abcdefgh', 5) AS j
          |""".stripMargin).head()
      assert(row.getDouble(0) === 12.5)
      assert(row.getInt(1) === vps.geom.TileMath.tileX(12.5, 8))
      assert(row.getString(2).startsWith("POINT (500000"))
      assert(row.getDouble(3) === 1.0)
      // geometry predicate through pure SQL; JTS contains = interior only,
      // so the boundary points x=0 and x=10 do not count
      val n = spark.sql(
        """SELECT count(*) FROM (
          |  SELECT st_contains(st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'),
          |                     st_point(CAST(id AS DOUBLE), 5.0)) AS hit
          |  FROM range(20)) WHERE hit""".stripMargin).head().getLong(0)
      assert(n === 9)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
