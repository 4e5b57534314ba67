package graft.stream

import scala.util.Try

import org.apache.spark.sql.types.{DoubleType, LongType, StructType, TimestampType}

import graft.SparkTestBase

/** Kafka stream-source integration (SURVEY S13). The spark-sql-kafka
  * connector is a DEPLOY-TIME dependency (README "Deploying"): it is
  * not bundled in this offline sandbox, so the integration test is
  * gated on the connector's presence and CANCELS LOUDLY — never
  * silently green — when absent. The always-on test pins the failure
  * mode a mis-deployed cluster would see.
  */
class KafkaSourceSpec extends SparkTestBase {

  private val schema = new StructType()
    .add("event_id", LongType).add("user_id", LongType)
    .add("ts", TimestampType).add("value", DoubleType)

  private def connectorPresent: Boolean =
    Try(Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess

  test("without the connector jar, readKafka fails fast with the deploy hint") {
    assume(!connectorPresent, "connector present: covered by the integration test")
    val e = intercept[Exception] {
      StreamSource.readKafka(spark, "broker:9092", "events", schema)
    }
    // Spark's standard missing-data-source error names the format and
    // points at the deployment guide — the operator-visible signal that
    // the deploy-time dependency was not shipped.
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the missing kafka-source error, got: ${e.getMessage}")
  }

  test("with the connector jar, readKafka builds a streaming plan in the declared schema") {
    if (!connectorPresent)
      cancel("spark-sql-kafka connector not on classpath (deploy-time " +
        "dependency, see README 'Streaming sources') — integration test SKIPPED")
    val df = StreamSource.readKafka(spark, "broker:9092", "events", schema,
      startingOffsets = "earliest")
    assert(df.isStreaming)
    assert(df.schema == schema)
  }
}
