package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.SparkTestBase

/** The bounded-work streaming curation mode: per-batch TEXT work is
  * bounded by the batch (gate/digest/chunk/shingle run on batch rows
  * only — plan-asserted, not prose), corpus-global stages are
  * maintained as fixed-width metadata state (min-merge dedup index,
  * folded stratum counts, chunk-metadata store, shingle revocation
  * state), and the materialized output equals
  * `CurationCompiler.compile` over the accumulated corpus after EVERY
  * batch — including retroactive decontamination (an eval row
  * revoking documents that arrived before it) and dedup displacement
  * (a smaller id arriving after the incumbent winner).
  */
class StreamCurationIncrementalSpec extends SparkTestBase {

  private def cu = graft.config.ConfigLoader.fromYaml(
    """source:
      |  name: stream_curation_inc
      |  type: file
      |  curation:
      |    id_field: doc_id
      |    text_field: text
      |    stratum_field: lang
      |    quality:
      |      min_tokens: 3
      |      max_tokens: 100
      |      min_stop_ratio: 0.0
      |    dedup: exact
      |    mix: true
      |    chunk:
      |      tokens: 4
      |      overlap: 1
      |    shard:
      |      budget: 16
      |      bucket_width: 64
      |    decontam:
      |      eval_where: "doc_id >= 100"
      |      shingle_len: 3
      |      min_shared: 1
      |""".stripMargin)
    .curation.getOrElse(throw new IllegalStateException("no curation section"))

  // Same corpus as StreamCurationSpec: doc 100 is the eval row and
  // ARRIVES LAST, so under any multi-batch slicing the contaminated
  // doc 7 is accepted first and must be retroactively revoked.
  private val corpus = Seq(
    ScDoc(1L, "the quick brown fox jumps over fences", "en"),
    ScDoc(2L, "data pipelines shuffle rows across executors", "en"),
    ScDoc(3L, "les pipelines de données sont distribués", "fr"),
    ScDoc(4L, "warum ist verteiltes rechnen so schwer", "de"),
    ScDoc(7L, "benchmark answer key leaked here sadly", "en"),
    ScDoc(8L, "data pipelines shuffle rows across executors", "en"),
    ScDoc(9L, "too short", "en"),
    ScDoc(100L, "benchmark answer key held out", "en"))

  private def batchTruth(docs: Seq[ScDoc] = corpus) = {
    val s = spark; import s.implicits._
    StreamCurationSpecHelper.landAndCurate(s, cu, docs.toDF())
  }

  private def tmp(tag: String) = Files.createTempDirectory(tag).toString

  private def runStream(docs: Seq[ScDoc], split: Int,
      stateDir: String, outDir: String, ckpt: String): Unit = {
    val s = spark
    val ms = MemoryStream[ScDoc](
      org.apache.spark.sql.Encoders.product[ScDoc], s.sqlContext)
    val q = StreamCuration.startIncremental(s, ms.toDF(), cu, stateDir, outDir, ckpt)
    try docs.grouped(split).foreach { g => ms.addData(g); q.processAllAvailable() }
    finally q.stop()
  }

  test("incremental output equals the batch chain across slicings (incl. late eval)") {
    val truth = batchTruth()
    assert(truth.nonEmpty)
    for (split <- Seq(2, 8)) {
      val (st, out, ck) = (tmp("sci_st"), tmp("sci_out"), tmp("sci_ck"))
      runStream(corpus, split, st, out, ck)
      val got = StreamCuration.readOutput(spark, out).collect().map(_.toSeq).toSet
      assert(got == truth, s"split=$split")
      // Folded counts equal a recount over the index at the final version.
      val idx = StreamCuration.incrementalOutput(spark, cu, st)
      assert(idx.collect().map(_.toSeq).toSet == truth, s"split=$split state rebuild")
    }
  }

  test("retroactive revocation: contaminated doc is present until its eval arrives") {
    val (st, out, ck) = (tmp("sci_st2"), tmp("sci_out2"), tmp("sci_ck2"))
    val s = spark
    val ms = MemoryStream[ScDoc](
      org.apache.spark.sql.Encoders.product[ScDoc], s.sqlContext)
    val q = StreamCuration.startIncremental(s, ms.toDF(), cu, st, out, ck)
    try {
      // Winner-set membership is read from the INDEX state (the output
      // additionally applies the mix gate, which is hash-dependent).
      def indexIds(): Set[Long] = {
        val d = new java.io.File(s"$st/index")
        val v = d.listFiles().map(_.getName).filter(_.startsWith("v="))
          .map(_.drop(2).toLong).max
        s.read.parquet(s"$st/index/v=$v")
          .select("id").collect().map(_.getLong(0)).toSet
      }
      ms.addData(corpus.filter(_.doc_id != 100L)); q.processAllAvailable()
      assert(indexIds().contains(7L),
        "doc 7 must be accepted before its eval arrives")
      ms.addData(Seq(corpus.last)); q.processAllAvailable()
      assert(!indexIds().contains(7L),
        "doc 7 must be revoked by the late eval row")
      assert(StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
        == batchTruth())
    } finally q.stop()
  }

  test("shingle state lands bucketed on hb and the revocation probe" +
    " prunes to the delta's buckets (partition-filtered scan)") {
    val (st, out, ck) = (tmp("sci_st6"), tmp("sci_out6"), tmp("sci_ck6"))
    runStream(corpus, 3, st, out, ck)
    // Layout: every shingle batch partition is bucketed on hb.
    val batches = new java.io.File(s"$st/shingles").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(batches.nonEmpty)
    // Every batch dir with data is bucketed: no bare parquet files at
    // the batch level (a no-new-digest batch legitimately writes an
    // empty dir), and at least one batch carries hb= buckets.
    assert(batches.forall(
        !_.listFiles().exists(_.getName.endsWith(".parquet"))),
      "shingle data must live under hb= bucket dirs, not at batch level")
    assert(batches.exists(_.listFiles().exists(_.getName.startsWith("hb="))),
      "at least one batch must carry hb= bucket dirs")
    val s = spark
    val store = s.read.parquet(s"$st/shingles")
    val allHb = store.select("hb").distinct().collect().map(_.getInt(0)).toSet
    assert(allHb.size > 1, "fixture must span multiple buckets or the prune is vacuous")
    // The revocation probe's scan shape: an isin filter over probed
    // buckets — it must reach the scan as a PARTITION filter (pruned
    // dirs), not a post-scan data filter.
    val probed = Seq(allHb.head)
    val pruned = store.filter(org.apache.spark.sql.functions.col("hb")
      .isin(probed: _*)).select("__h", "h")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"),
      s"expected a partition-filtered scan, got:\n$planStr")
    val pf = planStr.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("hb"), s"partition filter must bind hb: $pf")
    // And the pruned read is semantically the bucket's rows.
    assert(pruned.count() ===
      store.filter(org.apache.spark.sql.functions.col("hb") === probed.head).count())
  }

  test("shingle-store layout versioning: marker wins, pre-marker bucketed" +
    " stores detect at the default, legacy/mixed stores fall back unpruned" +
    " with identical rows") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val s = spark
    import s.implicits._
    val rows = (0L until 40L).map(i => (s"d$i", i * 7L))
    val df = rows.toDF("__h", "h")
    def bucketed(dir: String, batch: Long, nb: Int): Unit =
      df.withColumn("hb", pmod(col("h"), lit(nb)).cast("int"))
        .write.mode("overwrite").partitionBy("hb")
        .parquet(s"$dir/batch_id=$batch")
    def flat(dir: String, batch: Long): Unit =
      df.write.mode("overwrite").parquet(s"$dir/batch_id=$batch")
    val evalDelta = Seq(7L, 14L).toDF("h")
    def gotRows(dir: String): Set[(String, Long)] =
      StreamCuration.shingleStateFor(s, dir, evalDelta)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // Rows the delta's buckets hold under the default layout — what a
    // pruned scan must return; legacy scans return the full store.
    val deltaBuckets = Set(7L % 64, 14L % 64)
    val prunedTruth = rows.filter(r => deltaBuckets(r._2 % 64)).toSet

    // 1. Marker wins: a store stamped at 32 buckets prunes at 32, even
    //    though the engine default is 64.
    val m32 = tmp("sci_m32")
    bucketed(m32, 0L, 32)
    graft.sink.AtomicPointer.write(s.sparkContext.hadoopConfiguration,
      m32, "32", name = "_BUCKETS")
    assert(StreamCuration.shingleLayout(s, m32) ===
      StreamCuration.ShingleLayout.Bucketed(32))
    assert(gotRows(m32) === rows.filter(r =>
      Set(7L % 32, 14L % 32)(r._2 % 32)).toSet)

    // 2. Pre-marker bucketed store (the r14 layout): detected at the
    //    default count; the scan is partition-pruned.
    val pre = tmp("sci_pre")
    bucketed(pre, 0L, 64); bucketed(pre, 1L, 64)
    assert(StreamCuration.shingleLayout(s, pre) ===
      StreamCuration.ShingleLayout.Bucketed(64))
    assert(gotRows(pre) === (prunedTruth ++ prunedTruth))
    val plan = StreamCuration.shingleStateFor(s, pre, evalDelta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("hb"),
      s"bucketed fallback must partition-prune:\n$plan")

    // 3. Legacy store (written before bucketing existed): no hb column
    //    anywhere — reads fall back to the full store, revocation rows
    //    intact. This is the resume path that previously failed on the
    //    missing hb partition column.
    val leg = tmp("sci_leg")
    flat(leg, 0L); flat(leg, 1L)
    assert(StreamCuration.shingleLayout(s, leg) ===
      StreamCuration.ShingleLayout.Legacy)
    assert(gotRows(leg) === rows.toSet)

    // 4. MIXED store (legacy checkpoint resumed under r14's always-
    //    bucketed writer): whole-store discovery would throw on
    //    conflicting structures; the per-dir fallback returns every row.
    val mix = tmp("sci_mix")
    flat(mix, 0L); bucketed(mix, 1L, 64)
    assert(StreamCuration.shingleLayout(s, mix) ===
      StreamCuration.ShingleLayout.Legacy)
    assert(gotRows(mix) === rows.toSet)

    // 5. Empty/absent store: clean empty frame, no probe errors.
    assert(gotRows(tmp("sci_absent")) === Set.empty[(String, Long)])
  }

  test("dedup displacement: a smaller id arriving later replaces the winner") {
    val dup = Seq(
      ScDoc(50L, "alpha beta gamma delta epsilon zeta", "en"),
      ScDoc(51L, "one two three four five six seven", "en"),
      ScDoc(10L, "alpha beta gamma delta epsilon zeta", "en"))
    val (st, out, ck) = (tmp("sci_st3"), tmp("sci_out3"), tmp("sci_ck3"))
    runStream(dup, 2, st, out, ck) // 10 arrives after 50
    val got = StreamCuration.readOutput(spark, out).collect().map(_.toSeq).toSet
    assert(got == batchTruth(dup))
    val ids = got.map(_.head.asInstanceOf[Long])
    assert(ids.contains(10L) && !ids.contains(50L))
  }

  test("restart resumes from checkpointed state and converges") {
    val (st, out, ck) = (tmp("sci_st4"), tmp("sci_out4"), tmp("sci_ck4"))
    val s = spark
    val ms = MemoryStream[ScDoc](
      org.apache.spark.sql.Encoders.product[ScDoc], s.sqlContext)
    val q1 = StreamCuration.startIncremental(s, ms.toDF(), cu, st, out, ck)
    try { ms.addData(corpus.take(4)); q1.processAllAvailable() } finally q1.stop()
    val q2 = StreamCuration.startIncremental(s, ms.toDF(), cu, st, out, ck)
    try {
      ms.addData(corpus.drop(4)); q2.processAllAvailable()
      val got = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
      assert(got == batchTruth())
    } finally q2.stop()
  }

  test("a replayed micro-batch reproduces identical state and output") {
    val s = spark; import s.implicits._
    val (st, out) = (tmp("sci_st5"), tmp("sci_out5"))
    StreamCuration.writeBatchIncremental(corpus.take(4).toDF(), 0L, cu, st, out)
    StreamCuration.writeBatchIncremental(corpus.drop(4).toDF(), 1L, cu, st, out)
    val once = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
    // The at-least-once failure mode: batch 1 delivered again.
    StreamCuration.writeBatchIncremental(corpus.drop(4).toDF(), 1L, cu, st, out)
    val replayed = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
    assert(replayed == once)
    assert(replayed == batchTruth())
  }

  test("empty micro-batch is a no-op that still advances state versions") {
    val s = spark; import s.implicits._
    val (st, out) = (tmp("sci_st6"), tmp("sci_out6"))
    StreamCuration.writeBatchIncremental(corpus.take(4).toDF(), 0L, cu, st, out)
    StreamCuration.writeBatchIncremental(
      corpus.take(0).toDF(), 1L, cu, st, out)
    StreamCuration.writeBatchIncremental(corpus.drop(4).toDF(), 2L, cu, st, out)
    val got = StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet
    assert(got == batchTruth())
  }

  test("bounded work: the output plan reads only fixed-width state, never text") {
    val s = spark; import s.implicits._
    val (st, out) = (tmp("sci_st7"), tmp("sci_out7"))
    StreamCuration.writeBatchIncremental(corpus.toDF(), 0L, cu, st, out)
    val plan = StreamCuration.incrementalOutput(s, cu, st)
      .queryExecution.optimizedPlan
    val rels = plan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs
    }
    assert(rels.nonEmpty)
    rels.foreach { fs =>
      fs.location.rootPaths.foreach { p =>
        assert(p.toUri.getPath.startsWith(st),
          s"scan outside state dir: $p")
      }
      assert(!fs.dataSchema.fieldNames.contains(cu.textField),
        s"a state scan carries the text column: ${fs.dataSchema.fieldNames.toSeq}")
    }
  }

  test("bounded work: per-batch stats are batch-sized, not corpus-sized") {
    val (st, out, ck) = (tmp("sci_st8"), tmp("sci_out8"), tmp("sci_ck8"))
    runStream(corpus, 2, st, out, ck)
    val stats = StreamCuration.readStats(spark, st)
    assert(stats.size >= 4)
    stats.foreach { case (bid, m) =>
      assert(m("batch_rows") <= 2L, s"batch $bid saw ${m("batch_rows")} rows")
      assert(m("gated_rows") <= m("batch_rows"),
        s"batch $bid gated more rows than arrived")
    }
    assert(stats.values.map(_("batch_rows")).sum == corpus.size.toLong)
    // The state index carries the corpus, the per-batch text work does not.
    val lastBid = stats.keys.max
    assert(stats.values.map(_("new_winner_rows")).sum ==
      stats(lastBid)("index_rows") + 1) // +1: doc 7 won, then was revoked
  }

  test("counts fold equals a recount over the final index") {
    val s = spark; import s.implicits._
    val (st, out) = (tmp("sci_st9"), tmp("sci_out9"))
    corpus.grouped(3).zipWithIndex.foreach { case (g, i) =>
      StreamCuration.writeBatchIncremental(g.toDF(), i.toLong, cu, st, out)
    }
    val v = (0 until 3).map(i => s"$st/index/v=$i")
      .filter(p => new java.io.File(p).exists()).last
    val idx = s.read.parquet(v)
    val recount = idx.groupBy($"stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val folded = s.read.parquet(v.replace("/index/", "/counts/"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folded == recount)
  }

  test("mix=false / dedup=none variant matches the batch chain") {
    val cu2 = cu.copy(mix = false, dedup = "none", decontam = None)
    val s = spark; import s.implicits._
    val truth = {
      val landing = Files.createTempDirectory("sci_truth").toString
      corpus.toDF().write.mode("overwrite").parquet(landing)
      StreamCuration.curate(s, cu2, landing).collect().map(_.toSeq).toSet
    }
    val (st, out) = (tmp("sci_st10"), tmp("sci_out10"))
    corpus.grouped(2).zipWithIndex.foreach { case (g, i) =>
      StreamCuration.writeBatchIncremental(g.toDF(), i.toLong, cu2, st, out)
    }
    assert(StreamCuration.readOutput(s, out).collect().map(_.toSeq).toSet == truth)
  }
}
