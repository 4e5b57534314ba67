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

  test("semantic_dedup / decontam sections parse with declared values and defaults") {
    val cu = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    semantic_dedup: {tau: 0.25, policy: best, quality_field: score}
        |    decontam:
        |      eval_where: source = 'benchmark'
        |""".stripMargin).curation.get
    val sd = cu.semanticDedup.get
    assert(sd.tau == 0.25 && sd.policy == "best" && sd.qualityField == "score")
    val dc = cu.decontam.get
    assert(dc.evalWhere == "source = 'benchmark'")
    assert(dc.shingleLen == 3 && dc.minShared == 3)
    // absent sections stay None; defaults fill a bare semantic_dedup
    val bare = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    semantic_dedup: {}
        |""".stripMargin).curation.get
    assert(bare.semanticDedup.get ==
      graft.config.SemanticDedupConfig(0.4, "min_id", "label"))
    assert(bare.decontam.isEmpty)
  }

  test("bad semantic_dedup policy and empty decontam predicate fail loudly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    intercept[IllegalArgumentException](
      CurationCompiler.compileSemanticDedup(
        graft.config.SemanticDedupConfig(policy = "keep-some"))(docs, docs))
    intercept[IllegalArgumentException](
      CurationCompiler.compileDecontam(
        graft.config.DecontamConfig(evalWhere = ""), "doc_id", "text")(docs))
  }

  test("config-compiled semantic_dedup and decontam equal the Scala compositions") {
    val gotSd = graft.queries.Pipeline.cfgSemanticDedup(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val wantSd = graft.queries.NorthStar.queries("semantic_dedup")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(gotSd == wantSd && gotSd.nonEmpty)
    val gotDc = graft.queries.Pipeline.cfgDecontam(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val wantDc = graft.queries.NorthStar.queries("decontam")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(gotDc == wantDc && gotDc.nonEmpty)
  }
}
