package graft.stream

import scala.util.Try

import org.apache.spark.sql.types.{DoubleType, LongType, StructType, TimestampType}

import graft.SparkTestBase

/** Kinesis stream-source integration (SURVEY S13; reference README.md:11
  * names Kinesis as the stream transport). Exactly the Kafka pattern:
  * the spark-sql-kinesis connector is a DEPLOY-TIME dependency not
  * bundled in this offline sandbox, so the integration test is gated on
  * the connector's presence and CANCELS LOUDLY — never silently green —
  * when absent. The always-on test pins the failure mode a mis-deployed
  * cluster would see.
  */
class KinesisSourceSpec extends SparkTestBase {

  private val schema = new StructType()
    .add("event_id", LongType).add("user_id", LongType)
    .add("ts", TimestampType).add("value", DoubleType)

  private def connectorPresent: Boolean =
    Try(Class.forName("org.apache.spark.sql.kinesis.KinesisSourceProvider")).isSuccess

  test("without the connector jar, readKinesis fails fast with the deploy hint") {
    assume(!connectorPresent, "connector present: covered by the integration test")
    val e = intercept[Exception] {
      StreamSource.readKinesis(spark, "events-stream", "us-east-1", schema)
    }
    assert(e.getMessage.toLowerCase.contains("kinesis"),
      s"expected the missing kinesis-source error, got: ${e.getMessage}")
  }

  test("with the connector jar, readKinesis builds a streaming plan in the declared schema") {
    if (!connectorPresent)
      cancel("spark-sql-kinesis connector not on classpath (deploy-time " +
        "dependency, see README 'Streaming sources') — integration test SKIPPED")
    val df = StreamSource.readKinesis(spark, "events-stream", "us-east-1", schema,
      startingPosition = "earliest")
    assert(df.isStreaming)
    assert(df.schema == schema)
  }
}
