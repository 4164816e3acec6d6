package vps.docs

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class DocsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("interleaved docs shape matches the input_hint schema") {
    val docs = InterleavedDocs.fromDocuments(spark, sfDir)
    val schema = docs.drop("id").schema
    assert(schema.fieldNames.toSeq === Seq("doc_id", "spans"))
    assert(schema("doc_id").dataType.typeName === "string")
    val elem = schema("spans").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elem.fieldNames.toSeq === Seq("kind", "text", "media_ref", "offset"))
    assert(docs.count() === 500)
  }

  test("span derivation is deterministic and geo spans parse") {
    val docs = InterleavedDocs.fromDocuments(spark, sfDir)
    val geo = InterleavedDocs.extractGeoSpans(docs)
    // every doc has 1 geo span + every third doc one more
    assert(geo.count() === 500 + (500 + 2) / 3)
    // id=0: lon = -180.0, lat = -80.0
    import vps.sql.functions.{st_x, st_y}
    val r0 = geo.where($"id" === 0 && $"span_offset" === 1)
      .select(st_x($"geom"), st_y($"geom")).as[(Double, Double)].head()
    assert(r0 === ((-180.0, -80.0)))
    // id=7: lon = (7*9973 % 3600000)/1e4 - 180
    val r7 = geo.where($"id" === 7 && $"span_offset" === 1)
      .select(st_x($"geom")).as[Double].head()
    assert(math.abs(r7 - ((7L * 9973 % 3600000) / 10000.0 - 180.0)) < 1e-12)
    // derivation is pure: same result on re-read
    val again = InterleavedDocs.extractGeoSpans(InterleavedDocs.fromDocuments(spark, sfDir))
    assert(again.select("doc_id", "span_offset").except(geo.select("doc_id", "span_offset")).count() === 0)
  }

  test("geoSpansDirect: bit-exact to the closed-form (oracle) coordinates; " +
      "span path within float noise") {
    import vps.sql.functions.{st_x, st_y}
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"id", $"span_offset", st_x($"geom").as("x"), st_y($"geom").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4))).sortBy(t => (t._2, t._3))
    val d = rows(InterleavedDocs.geoSpansDirect(spark, sfDir))
    val sp = rows(InterleavedDocs.extractGeoSpans(InterleavedDocs.fromDocuments(spark, sfDir)))
    assert(d.length === sp.length)
    // the direct path IS the oracle's arithmetic: same IEEE ops, bit-for-bit
    d.foreach { case (docId, id, off, x, y) =>
      assert(docId === s"doc$id")
      val (ex, ey) =
        if (off == 1) ((id * 9973L % 3600000L) / 10000.0 - 180.0,
          (id * 6151L % 1600000L) / 10000.0 - 80.0)
        else (((id * 7919L + 104729L) % 3600000L) / 10000.0 - 180.0,
          ((id * 4093L + 15485L) % 1600000L) / 10000.0 - 80.0)
      assert(java.lang.Double.doubleToRawLongBits(x) ===
        java.lang.Double.doubleToRawLongBits(ex), s"x id=$id off=$off")
      assert(java.lang.Double.doubleToRawLongBits(y) ===
        java.lang.Double.doubleToRawLongBits(ey), s"y id=$id off=$off")
    }
    // the WKT format/parse round trip drifts by a few ulps from the closed
    // form (%.4f is exact for the 1e-4-grid values; the parse returns the
    // nearest double to that decimal, the direct path the composed IEEE
    // result) — and never at a discretization boundary, because grid values
    // on integer/tile boundaries are exactly representable and both paths
    // compute them exactly (this is why BOTH paths are oracle-green)
    d.zip(sp).foreach { case ((_, id, off, dx, dy), (_, id2, off2, sx, sy)) =>
      assert(id === id2 && off === off2)
      assert(math.abs(dx - sx) <= 1e-9, s"x drift id=$id")
      assert(math.abs(dy - sy) <= 1e-9, s"y drift id=$id")
    }
  }

  test("replication scales row count with distinct ids") {
    val docs = InterleavedDocs.fromDocuments(spark, sfDir, replication = 4)
    assert(docs.count() === 2000)
    assert(docs.select("id").distinct().count() === 2000)
  }

  test("span-sequence invariant: fingerprint survives repartition/filter/join") {
    val docs = InterleavedDocs.fromDocuments(spark, sfDir).cache()
    val before = docs.select($"doc_id", InterleavedDocs.spanFingerprint($"spans").as("fp"))
    // a shuffle-heavy pipeline that must not disturb span content/order
    val after = docs
      .repartition(8, $"doc_id")
      .where(length($"doc_id") > 3)
      .join(docs.select($"doc_id").distinct(), Seq("doc_id"))
      .select($"doc_id", InterleavedDocs.spanFingerprint($"spans").as("fp"))
    val joined = before.as("b").join(after.as("a"), "doc_id")
      .where($"b.fp" =!= $"a.fp")
    assert(joined.count() === 0)
    assert(after.count() === before.count())
    docs.unpersist()
  }

  test("snapshot table: write/read/manifest/time-travel/atomic commit") {
    val dir = java.nio.file.Files.createTempDirectory("snaptest").toString
    val docs = InterleavedDocs.fromDocuments(spark, sfDir).repartition(3)
    val s1 = SnapshotTable.write(docs, dir)
    assert(s1 === 1L)
    val snap = SnapshotTable.snapshot(spark, dir, s1)
    assert(snap.totalRows === 500)
    assert(snap.files.nonEmpty && snap.files.forall(_.bytes > 0))
    // read returns exactly the manifest-listed data
    assert(SnapshotTable.read(spark, dir).count() === 500)
    // second snapshot appends; old snapshot still readable (time travel)
    val s2 = SnapshotTable.write(docs.limit(10), dir)
    assert(s2 === 2L)
    assert(SnapshotTable.read(spark, dir).count() === 10)
    assert(SnapshotTable.read(spark, dir, Some(1L)).count() === 500)
    // a stray uncommitted file in data/ must NOT be visible (manifest-driven read)
    val stray = new java.io.File(s"$dir/data/snap-2/stray.parquet.crc")
    stray.createNewFile()
    assert(SnapshotTable.read(spark, dir).count() === 10)
  }

  test("Z-order cell ids enable real partition pruning via childRange filters") {
    import vps.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("cellprune").toString
    val docs = InterleavedDocs.fromDocuments(spark, sfDir)
    val pts = InterleavedDocs.extractGeoSpans(docs)
      .select($"id", cell_at(st_x($"geom"), st_y($"geom"), 12).as("cell"))
      .withColumn("cell_l4", cell_parent($"cell", 4))
    pts.write.mode("overwrite").partitionBy("cell_l4").parquet(dir)

    // range predicate on the fine cell prunes parent partitions: a level-4
    // parent covers the contiguous [lo, hi] range of its level-12 children
    val someParent = pts.select($"cell_l4").head().getLong(0)
    val (lo, hi) = vps.geom.CellId.childRange(someParent, 12)
    val q = spark.read.parquet(dir)
      .where($"cell" >= lo && $"cell" <= hi)
    q.collect()
    val planStr = q.queryExecution.executedPlan.toString
    // only rows of that parent match...
    val expected = pts.where($"cell_l4" === someParent).count()
    assert(q.count() === expected && expected > 0)
    // ...and pushed scan filters carry the range (file/row-group pruning)
    assert(planStr.contains("PushedFilters") && planStr.contains("GreaterThanOrEqual(cell,"),
      planStr.take(800))
  }
}
