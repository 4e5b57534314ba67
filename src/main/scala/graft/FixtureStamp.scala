package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Fixture identity for bench artifacts: per-table row counts, byte
  * sizes, and a content hash over the parquet file bytes, plus one
  * combined hash for the whole directory.
  *
  * Why: the driver REGENERATES `/root/testdata` fixtures between
  * rounds, and r10's cross-round bench comparison found
  * identical-code queries moving ±60% purely from fixture content —
  * plausible but unverifiable after the fact. With the stamp in every
  * `BENCH_*.json`, "regression vs new data" is decidable mechanically:
  * same hash → same data → the delta is the code's.
  *
  * Cost control: the stamp (row counts need Spark jobs, the hash a
  * full byte pass) is computed ONCE per fixture state and cached in
  * /tmp keyed by the directory's (path, size, mtime) listing — the
  * sliced bench runner's 6 fresh JVMs pay it once, and a driver
  * regeneration (new mtimes) invalidates the cache by construction.
  */
object FixtureStamp {

  final case class TableStamp(rows: Long, bytes: Long, md5: String)

  def stampJson(spark: SparkSession, sfDir: String): String = {
    val fp = fingerprint(sfDir)
    val cache = Paths.get("/tmp/graft_fixture_stamp",
      hex(digest(sfDir.getBytes("UTF-8"))).take(16) + ".json")
    readCache(cache, fp).getOrElse {
      val json = render(compute(spark, sfDir))
      try {
        Files.createDirectories(cache.getParent)
        Files.write(cache, (fp + "\n" + json).getBytes("UTF-8"))
      } catch { case _: Throwable => () }
      json
    }
  }

  /** The short combined hash carried on the truncation-safe stdout line. */
  def shortHash(stampJson: String): String = {
    val m = """"hash":"([0-9a-f]+)"""".r.findFirstMatchIn(stampJson)
    m.map(_.group(1)).getOrElse("unknown")
  }

  private def tables(sfDir: String): Seq[File] =
    Option(new File(sfDir).listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq

  private def dataFiles(t: File): Seq[File] =
    if (t.isFile) Seq(t)
    else Option(t.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName).toSeq

  /** Cheap change detector: every data file's (name, size, mtime). */
  private def fingerprint(sfDir: String): String =
    hex(digest(tables(sfDir).flatMap(t => dataFiles(t).map(f =>
      s"${t.getName}/${f.getName}:${f.length}:${f.lastModified}"))
      .mkString("\n").getBytes("UTF-8")))

  private def readCache(cache: java.nio.file.Path, fp: String): Option[String] =
    try {
      if (!Files.exists(cache)) None
      else {
        val lines = new String(Files.readAllBytes(cache), "UTF-8").split("\n", 2)
        if (lines.length == 2 && lines(0) == fp) Some(lines(1)) else None
      }
    } catch { case _: Throwable => None }

  private def compute(spark: SparkSession, sfDir: String): Seq[(String, TableStamp)] =
    tables(sfDir).map { t =>
      val files = dataFiles(t)
      val bytes = files.map(_.length).sum
      // Content hash = md5 over the files' md5s in name order — stable
      // under re-listing, sensitive to any byte of any data file.
      val h = digest(files.flatMap(f =>
        digest(Files.readAllBytes(f.toPath))).toArray)
      val rows = spark.read.parquet(t.getAbsolutePath).count()
      val name = t.getName.stripSuffix(".parquet")
      name -> TableStamp(rows, bytes, hex(h).take(12))
    }

  private def render(ts: Seq[(String, TableStamp)]): String = {
    val combined = hex(digest(ts.map(_._2.md5).mkString.getBytes("UTF-8"))).take(12)
    val per = ts.map { case (n, s) =>
      s""""$n":{"rows":${s.rows},"bytes":${s.bytes},"md5":"${s.md5}"}"""
    }.mkString(",")
    s"""{"hash":"$combined","tables":{$per}}"""
  }

  private def digest(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(b)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
}
