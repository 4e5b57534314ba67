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

  test("dsir section parses with declared values and defaults") {
    val cu = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    dsir: {keep_num: 40, target_where: "source = 'books'"}
        |""".stripMargin).curation.get
    assert(cu.dsir.get == graft.config.DsirConfig(40, Some("source = 'books'")))
    val bare = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    dsir: {}
        |""".stripMargin).curation.get
    assert(bare.dsir.get == graft.config.DsirConfig(25, None))
  }

  test("config-compiled dsir equals the Scala dsir_sample composition") {
    val got = graft.queries.Pipeline.cfgDsir(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.queries.NorthStar.queries("dsir_sample")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // target_where overrides the quality-gate target: an always-true
    // predicate makes target = raw, so every ratio is 1 and keep_num
    // 100 keeps every featured doc.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val all = CurationCompiler.compileDsir(
      graft.config.DsirConfig(100, Some("1 = 1")),
      graft.config.CurationConfig())(docs)
    val featured = graft.ext.Dsir.weights(
      docs, "doc_id", "text", org.apache.spark.sql.functions.expr("1 = 1"))
    assert(all.count() == featured.count() && all.count() > 0)
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

  test("substr_dedup and lm_buckets sections parse with declared values and defaults") {
    val cu = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    substr_dedup: {window_len: 12}
        |    lm_buckets: {lang_field: source, ref_where: "lang = 'en'"}
        |""".stripMargin).curation.get
    assert(cu.substrDedup.get == graft.config.SubstrDedupConfig(12))
    assert(cu.lmBuckets.get ==
      graft.config.LmBucketsConfig("source", Some("lang = 'en'")))
    val bare = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    substr_dedup: {}
        |    lm_buckets: {}
        |""".stripMargin).curation.get
    assert(bare.substrDedup.get == graft.config.SubstrDedupConfig(8))
    assert(bare.lmBuckets.get == graft.config.LmBucketsConfig("lang", None))
  }

  test("gopher section: flag_only keeps every row, gate shape filters") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val audit = CurationCompiler.compileGopher(
      graft.config.GopherConfig(flagOnly = true), "doc_id", "text")(docs)
    val gate = CurationCompiler.compileGopher(
      graft.config.GopherConfig(flagOnly = false), "doc_id", "text")(docs)
    assert(audit.count() == docs.count())
    assert(gate.count() > 0 && gate.count() < docs.count())
    val gotCfg = graft.queries.Pipeline.cfgGopher(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.ext.GopherRules.battery(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(gotCfg == want)
  }

  test("gopher repetition mode: cfg equals Scala; exclusive with line_rules") {
    val docs = graft.queries.NorthStar.repLinedDocs(spark, sf0001)
    val gate = CurationCompiler.compileGopher(
      graft.config.GopherConfig(flagOnly = false, repetition = true),
      "doc_id", "text")(docs)
    assert(gate.count() > 0 && gate.count() < docs.count())
    val gotCfg = graft.queries.Pipeline.cfgGopherRepetition(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.ext.GopherRepetition.battery(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(gotCfg == want)
    intercept[IllegalArgumentException] {
      CurationCompiler.compileGopher(
        graft.config.GopherConfig(lineRules = true, repetition = true),
        "doc_id", "text")(docs)
    }
  }

  test("charset section: flag_only audits, gate filters, cfg equals Scala") {
    val docs = graft.queries.NorthStar.charLanedDocs(spark, sf0001)
    val audit = CurationCompiler.compileCharset(
      graft.config.CharsetConfig(flagOnly = true), "doc_id", "text")(docs)
    val gate = CurationCompiler.compileCharset(
      graft.config.CharsetConfig(flagOnly = false), "doc_id", "text")(docs)
    assert(audit.count() == docs.count())
    assert(gate.count() > 0 && gate.count() < docs.count())
    val gotCfg = graft.queries.Pipeline.cfgCharset(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.ext.ScriptProfile.battery(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(gotCfg == want)
  }

  test("c4 section: flag_only keeps every row, gate filters, cfg equals Scala") {
    val docs = graft.queries.NorthStar.c4LinedDocs(spark, sf0001)
    val block = Seq("c4blockedterm")
    val audit = CurationCompiler.compileC4(
      graft.config.C4Config(block, flagOnly = true), "doc_id", "text")(docs)
    val gate = CurationCompiler.compileC4(
      graft.config.C4Config(block, flagOnly = false), "doc_id", "text")(docs)
    assert(audit.count() == docs.count())
    assert(gate.count() > 0 && gate.count() < docs.count())
    val gotCfg = graft.queries.Pipeline.cfgC4(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.ext.C4Rules.battery(docs, "doc_id", "text", block)
      .collect().map(_.toSeq).toSet
    assert(gotCfg == want)
    // an empty blocklist is a config error, not a silent no-op gate
    intercept[IllegalArgumentException] {
      CurationCompiler.compileC4(
        graft.config.C4Config(Nil), "doc_id", "text")(docs)
    }
  }

  test("config-compiled substr_dedup and lm_buckets equal the Scala compositions") {
    val gotSu = graft.queries.Pipeline.cfgSubstrDedup(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val wantSu = graft.queries.NorthStar.queries("substr_dedup")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(gotSu == wantSu && gotSu.nonEmpty)
    val gotLm = graft.queries.Pipeline.cfgLmBuckets(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val wantLm = graft.queries.NorthStar.queries("ccnet_buckets")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(gotLm == wantLm && gotLm.nonEmpty)
  }

  test("similarity section parses; index choice is corpus-derived, never config") {
    val cu = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    id_field: vec_id
        |    similarity:
        |      query_bound: 50
        |      k: 3
        |      cand_where: label = 1
        |""".stripMargin).curation.get
    val si = cu.similarity.get
    assert(si.queryBound == 50 && si.k == 3 && si.candWhere.contains("label = 1"))
    // Defaults + no way to name an index in config.
    val si2 = ConfigLoader.fromYaml(
      """source:
        |  name: c
        |  type: file
        |  curation:
        |    similarity: {}
        |""".stripMargin).curation.get.similarity.get
    assert(si2.queryBound == 100 && si2.k == 5 && si2.candWhere.isEmpty)
  }

  test("similarity dispatch rule: brute <= 256 < ivf <= 1M < pq (boundary-exact)") {
    assert(CurationCompiler.dispatchFor(1L) == "brute")
    assert(CurationCompiler.dispatchFor(CurationCompiler.SimBruteMax) == "brute")
    assert(CurationCompiler.dispatchFor(CurationCompiler.SimBruteMax + 1) == "ivf")
    assert(CurationCompiler.dispatchFor(CurationCompiler.SimIvfMax) == "ivf")
    assert(CurationCompiler.dispatchFor(CurationCompiler.SimIvfMax + 1) == "pq")
  }

  test("PQ shortlist scales with config k: a served top-k is never" +
    " silently capped by the default ADC shortlist") {
    assert(CurationCompiler.pqShortlistFor(5) == 20)
    assert(CurationCompiler.pqShortlistFor(10) == 20)
    assert(CurationCompiler.pqShortlistFor(25) == 50)
    // End to end at k=25 (> the default shortlist of 20): with the
    // scaled shortlist every graded query serves a full k-row list.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dim = emb.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).head.getInt(0)
    val k = 25
    val codes = graft.ext.SimSearch.pqEncode(emb, dim)
    val served = graft.ext.SimSearch.pqTopKNFilteredFromCodes(
      codes, emb, 4, k, dim, org.apache.spark.sql.functions.lit(true),
      shortlist = CurationCompiler.pqShortlistFor(k))
    val perQ = served.groupBy("qid").count().collect().map(_.getLong(1))
    assert(perQ.nonEmpty && perQ.forall(_ == k.toLong))
    // The default shortlist would have capped the list at 20.
    val capped = graft.ext.SimSearch.pqTopKNFilteredFromCodes(
      codes, emb, 4, k, dim, org.apache.spark.sql.functions.lit(true))
    val perQCapped = capped.groupBy("qid").count().collect().map(_.getLong(1))
    assert(perQCapped.forall(_ <= 20L))
  }

  test("small corpus dispatches to exact brute; the index suppliers are never touched") {
    val s2 = spark; import s2.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" < 200) // under SimBruteMax
    val si = graft.config.SimilarityConfig(
      queryBound = 20, k = 3, candWhere = Some("label = 1"))
    def boom: org.apache.spark.sql.DataFrame =
      throw new IllegalStateException("index supplier touched on brute path")
    val got = CurationCompiler.compileSimilarity(si)(emb, boom, boom)
      .collect().map(_.toSeq).toSet
    val want = graft.ext.SimSearch.bruteTopKNFiltered(emb, 20, 3, $"label" === 1)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("fixture corpus dispatches to trained IVF and equals the Scala composition") {
    val got = graft.queries.Pipeline.cfgSimTopK(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val want = graft.queries.NorthStar.queries("sim_topk_filtered_ivf")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }
}
