package vps.docs

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Iceberg-style table layout over partitioned Parquet (SURVEY.md §1.2 note:
  * no Iceberg runtime jar offline, so we reproduce the surface we need):
  *
  * ```
  * <table>/data/snap-<id>/part-*.parquet     immutable snapshot data
  * <table>/metadata/manifest-<id>.json       one line per data file: path, bytes, rows
  * <table>/metadata/version-hint.txt         current snapshot id (atomic rename commit)
  * ```
  *
  * Readers list files from the manifest (never the directory), so a snapshot is
  * immutable + a reader never sees a half-written snapshot: the version hint is
  * renamed into place only after data + manifest are fully written.
  * The manifest's per-file rows/bytes double as per-partition lineage metrics.
  */
object SnapshotTable {

  final case class DataFile(path: String, bytes: Long, rows: Long)
  final case class Snapshot(id: Long, files: Seq[DataFile]) {
    def totalRows: Long = files.map(_.rows).sum
    def totalBytes: Long = files.map(_.bytes).sum
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parquet footer row count (metadata read only — no data scan). */
  private def parquetRows(spark: SparkSession, file: Path): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try reader.getRecordCount finally reader.close()
  }

  def currentSnapshotId(spark: SparkSession, table: String): Option[Long] = {
    val f = fs(spark, table)
    val hint = new Path(s"$table/metadata/version-hint.txt")
    if (!f.exists(hint)) None
    else {
      val in = f.open(hint)
      try Some(new String(in.readAllBytes()).trim.toLong) finally in.close()
    }
  }

  /** Append a new snapshot; returns its id. Commit order: data, manifest, hint. */
  def write(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    val snapId = currentSnapshotId(spark, table).getOrElse(0L) + 1
    val dataDir = new Path(s"$table/data/snap-$snapId")
    df.write.mode("errorifexists").parquet(dataDir.toString)

    val files = f.listStatus(dataDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map(s => DataFile(s.getPath.toString, s.getLen, parquetRows(spark, s.getPath)))

    val manifest = new Path(s"$table/metadata/manifest-$snapId.json")
    f.mkdirs(manifest.getParent)
    val out = f.create(manifest, true)
    try files.foreach { d =>
      out.write(s"""{"path":${jstr(d.path)},"bytes":${d.bytes},"rows":${d.rows}}\n""".getBytes("UTF-8"))
    } finally out.close()

    // atomic commit: write hint to temp, rename into place
    val tmp = new Path(s"$table/metadata/.version-hint.tmp")
    val hint = new Path(s"$table/metadata/version-hint.txt")
    val hintOut = f.create(tmp, true)
    try hintOut.write(snapId.toString.getBytes("UTF-8")) finally hintOut.close()
    f.delete(hint, false)
    if (!f.rename(tmp, hint)) throw new java.io.IOException(s"commit failed for snapshot $snapId")
    snapId
  }

  def snapshot(spark: SparkSession, table: String, id: Long): Snapshot = {
    val f = fs(spark, table)
    val manifest = new Path(s"$table/metadata/manifest-$id.json")
    val in = f.open(manifest)
    val lines = try new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty) finally in.close()
    val files = lines.toSeq.map { l =>
      // minimal parse of our own writer's format
      val path = l.split("\"path\":\"")(1).split("\",")(0)
      val bytes = l.split("\"bytes\":")(1).split(",")(0).toLong
      val rows = l.split("\"rows\":")(1).split("}")(0).toLong
      DataFile(unescape(path), bytes, rows)
    }
    Snapshot(id, files)
  }

  /** Read the current (or a pinned) snapshot — files come from the manifest. */
  def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None): DataFrame = {
    val id = snapshotId.orElse(currentSnapshotId(spark, table))
      .getOrElse(throw new IllegalArgumentException(s"no committed snapshot at $table"))
    val snap = snapshot(spark, table, id)
    spark.read.parquet(snap.files.map(_.path): _*)
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  private def unescape(s: String): String = s.replace("\\\"", "\"").replace("\\\\", "\\")
}
