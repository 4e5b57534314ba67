package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** File-level Bloom-filter data skipping — [[ZoneMap]]'s sibling for
  * EQUALITY/IN probes on keys where min/max zones don't bite (hashed
  * or secondary keys, string ids): one small Bloom filter per landed
  * file, consulted at plan time so a point/IN-list scan opens only the
  * files that might contain a probe key.
  *
  * Zone maps answer range predicates on the CLUSTERING column; a Bloom
  * index answers membership on any column with per-file locality. At
  * 100 TB the payoff is the same shape as the zone map's: planning
  * reads a KB-scale landed index instead of paying a footer round-trip
  * per file, and the data scan opens k files instead of tens of
  * thousands. False positives cost an extra file open, never
  * correctness — the residual IN filter keeps the result exactly the
  * plain scan.
  *
  * Build shape: one pass over the landed data keyed by
  * `_metadata.file_path`; each input split builds a PARTIAL Bloom over
  * the keys it sees (a file can span splits), and per-file partials
  * OR-merge in a tiny reduce — the exchange carries one fixed-size
  * sketch per (split, file), never keys.
  */
object BloomSkip {

  /** Build the per-file Bloom index over a landed parquet directory:
    * (file_path, n_rows, bloom bytes). `expectedItems` sizes each
    * file's filter (rows-per-file scale, not table scale).
    */
  def buildIndex(spark: SparkSession, dataPath: String, keyCol: String,
      expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val rows = spark.read.parquet(dataPath)
      .select(col(keyCol).cast("long").as("k"),
        col("_metadata.file_path").as("file_path"))
      .filter(col("k").isNotNull)
    val partials = rows
      .select(col("file_path"), col("k"))
      .mapPartitions { it =>
        val blooms = scala.collection.mutable.Map.empty[String, (BloomFilter, Long)]
        it.foreach { r =>
          val (f, k) = (r.getString(0), r.getLong(1))
          val (b, n) = blooms.getOrElseUpdate(f,
            (BloomFilter.create(expectedItems, fpp), 0L))
          b.putLong(k)
          blooms(f) = (b, n + 1)
        }
        blooms.iterator.map { case (f, (b, n)) =>
          val bos = new java.io.ByteArrayOutputStream()
          b.writeTo(bos)
          (f, n, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.BINARY))
      .toDF("file_path", "n_rows", "bloom")
    partials
      .groupBy(col("file_path"))
      .agg(sum(col("n_rows")).as("n_rows"),
        collect_list(col("bloom")).as("parts"))
      .map { r =>
        val merged = r.getSeq[Array[Byte]](2)
          .map(bs => BloomFilter.readFrom(new java.io.ByteArrayInputStream(bs)))
          .reduce { (a, b) => a.mergeInPlace(b); a }
        val bos = new java.io.ByteArrayOutputStream()
        merged.writeTo(bos)
        (r.getString(0), r.getLong(1), bos.toByteArray)
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.BINARY))
      .toDF("file_path", "n_rows", "bloom")
  }

  /** Files whose Bloom might contain ANY of `keys` — index cardinality
    * is the file count, so the consultation is the same driver-side
    * shape as Spark's own file listing.
    */
  def qualifyingFiles(index: DataFrame, keys: Seq[Long]): Seq[String] =
    index.select(col("file_path"), col("bloom")).collect().flatMap { r =>
      val b = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      if (keys.exists(b.mightContainLong)) Some(r.getString(0)) else None
    }.toSeq

  /** IN-list scan through the Bloom index: open only might-contain
    * files, then the exact residual IN filter. Returns (scan,
    * filesRead, filesTotal) so callers and specs can assert the
    * skipping bit.
    */
  def prunedInScan(spark: SparkSession, dataPath: String, index: DataFrame,
      keyCol: String, keys: Seq[Long]): (DataFrame, Int, Long) = {
    val files = qualifyingFiles(index, keys)
    val total = index.count()
    val scan =
      if (files.isEmpty) spark.read.parquet(dataPath).limit(0)
      else spark.read.parquet(files: _*)
    (scan.filter(col(keyCol).isin(keys: _*)), files.size, total)
  }
}
