package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Two-level prefix-sum sharding: bit-identical to the global-window
  * reference for any bucket width (the width is a parallelism knob,
  * never a semantics knob), sane shard boundaries, and the scale
  * property that the corpus-side window partitions by bucket.
  */
class SeqPackSpec extends SparkTestBase {

  private def docTokens = {
    val s = spark; import s.implicits._
    t(s, sf0001, "documents")
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("n_tokens"))
  }

  test("two-level prefix sum equals the global window for several bucket widths") {
    val docs = docTokens
    val want = SeqPack.tokenShardsGlobal(docs, "doc_id", "n_tokens", 2048)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (width <- Seq(1L, 16L, 64L, 1000L, 1000000L)) {
      val got = SeqPack.tokenShards(docs, "doc_id", "n_tokens", 2048, width)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"bucketWidth=$width diverged from the global window")
    }
  }

  test("shard ids are dense from 0 and every shard except the last starts under budget") {
    val s = spark; import s.implicits._
    val budget = 2048L
    val shards = SeqPack.tokenShards(docTokens, "doc_id", "n_tokens", budget, 64)
    val ids: Seq[Long] = shards.select($"shard_id").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids.head == 0L)
    // Start offsets are strictly increasing with doc order, so shard
    // ids are contiguous: a shard is skipped only if one document
    // spans more than a full budget, which the fixture's ≤ ~120-token
    // docs cannot.
    assert(ids == (0L until ids.length.toLong).toSeq,
      s"shard ids not dense: ${ids.mkString(",")}")
    // No shard's token total exceeds budget + the max doc size (docs
    // are never split; overflow is bounded by one document).
    val maxDoc = docTokens.agg(max($"n_tokens")).head().getInt(0)
    val maxShard = shards.groupBy($"shard_id").agg(sum($"n_tokens").as("tot"))
      .agg(max($"tot")).head().getLong(0)
    assert(maxShard <= budget + maxDoc, s"shard total $maxShard breaks the budget bound")
  }

  test("shard assignment stays exact past 2^53 token offsets") {
    val s = spark; import s.implicits._
    // doc 1's start offset is 2^53 + 1 — not representable as a
    // double: the old floor(x / budget.toDouble) encoding would round
    // it down and misassign the shard. Integral `div` cannot.
    val big = (1L << 53) + 1L
    val docs = Seq((0L, big), (1L, 5L)).toDF("doc_id", "n_tokens")
    // Proof the double path misassigns at budget 1: the offset itself
    // collapses to the previous representable double.
    assert(math.floor(big.toDouble / 1.0).toLong != big)
    for (impl <- Seq(
        SeqPack.tokenShards(docs, "doc_id", "n_tokens", 1L, 64L),
        SeqPack.tokenShardsGlobal(docs, "doc_id", "n_tokens", 1L))) {
      val byId = impl.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(byId(0L) == 0L)
      assert(byId(1L) == big, s"doc 1 shard must be exactly 2^53+1, got ${byId(1L)}")
    }
    // And with a realistic budget the boundary doc lands one shard up
    // from where double arithmetic would put it.
    val boundary = Seq((0L, (1L << 53)), (1L, 1L), (2L, 7L)).toDF("doc_id", "n_tokens")
    val shards = SeqPack.tokenShardsGlobal(boundary, "doc_id", "n_tokens", 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(shards(2L) == ((1L << 53) + 1L) / 3L)
  }

  test("corpus-side window partitions by bucket — no global sort on the doc stream") {
    val plan = SeqPack.tokenShards(docTokens, "doc_id", "n_tokens", 2048, 64)
      .queryExecution.optimizedPlan.toString
    // The doc-stream window must carry the bucket partition key; the
    // only unpartitioned window is the per-bucket offset scan (rows =
    // #buckets, not corpus).
    assert(plan.contains("windowspecdefinition(__bucket"),
      s"doc-side window should partition by __bucket:\n$plan")
  }
}
