package graft.transform

import graft.SparkTestBase
import graft.config.ConfigLoader

/** The config-DSL curation section: YAML parsing (field lift +
  * defaults) and the compiled plan's equality with the Scala-composed
  * training_manifest on the fixture corpus.
  */
class CurationCompilerSpec extends SparkTestBase {

  test("curation YAML parses with declared values and defaults") {
    val cu = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    text_field: body
        |    quality: {min_tokens: 5}
        |    dedup: none
        |    chunk: {tokens: 64}
        |""".stripMargin).curation.get
    assert(cu.textField == "body" && cu.idField == "doc_id")
    assert(cu.minTokens == 5 && cu.maxTokens == 5000 && cu.minStopRatio == 0.01)
    assert(cu.dedup == "none" && cu.mix)
    assert(cu.chunkTokens == 64 && cu.chunkOverlap == 8)
    assert(cu.shardBudget == 2048L && cu.shardBucketWidth == (64L << 20))
    assert(ConfigLoader.fromYaml("source:\n  name: x\n  type: file\n").curation.isEmpty)
  }

  test("bad dedup kind fails loudly") {
    val cu = graft.config.CurationConfig(dedup = "minhashish")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    intercept[IllegalArgumentException](CurationCompiler.compile(cu)(docs))
  }

  test("config-compiled pipeline equals the Scala-composed training_manifest") {
    val got = graft.queries.Pipeline.cfgCuration(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.queries.NorthStar.queries("training_manifest")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }
}
