package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hive-layout partition pruning: a predicate on the partition column
  * becomes a partition filter and the scan touches only matching
  * directories — the K1 read-side contract.
  */
class PartitionPruneSpec extends SparkTestBase {

  test("partition predicate prunes directories, not just rows") {
    val s = spark; import s.implicits._
    val path = Files.createTempDirectory("graft-part").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, 1990 + i % 8)).toDF("k", "yr")
    PartitionedWriter.write(df, path, partitionBy = Seq("yr"))

    val q = s.read.parquet(path).filter($"yr" === 1995)
    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got:\n${q.queryExecution.executedPlan}")
    // The pruned scan reads 1 of 8 year directories.
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1)
    // And the result is the plain filter's result.
    assert(q.count() == df.filter($"yr" === 1995).count())
  }
}
