package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables.t

/** Text-analysis operator properties: language scoring, order
  * sensitivity of the rolling fingerprint, SimHash banding
  * completeness, and the multimodal decode plumbing.
  */
class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("langId scores stopword hits and predicts deterministically") {
    val docs = Seq(
      (1L, "the cat and the dog in a house"),
      (2L, "der Hund und die Katze ist nicht da"),
      (3L, "le chat est dans la maison pour le chien"),
      (4L, "xyzzy qwerty")).toDF("doc_id", "text")
    val r = TextAnalysis.langId(docs, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getString(5)).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "fr")
    assert(r(4L) == "de") // zero hits everywhere → alphabetical tiebreak
  }

  test("rolling fingerprint is order-sensitive; set fingerprint is not") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val roll = TextAnalysis.rollingFingerprint(docs, "text", "doc_id")
      .collect().map(_.getLong(1)).toSeq
    assert(roll.distinct.size == 2, "reordered tokens must change the rolling fingerprint")
  }

  test("simhash block banding finds exactly the all-pairs hamming<=3 set") {
    val docs = t(spark, sf0001, "documents")
    val banded = TextAnalysis.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = TextAnalysis.simhash(docs, "text", "doc_id")
    val all = sh.select($"doc_id".as("id_a"), $"simhash".as("sh_a"))
      .crossJoin(sh.select($"doc_id".as("id_b"), $"simhash".as("sh_b")))
      .filter($"id_a" < $"id_b")
      .filter(bit_count($"sh_a".bitwiseXOR($"sh_b")) <= 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == all)
    assert(all.nonEmpty)
  }

  test("band-key completeness property: any pair within maxHamming shares a band") {
    // Pure pigeonhole check on the banding itself, decoupled from text:
    // seeded random 60-bit fingerprints, each paired with a copy that
    // has up to maxHamming random bits flipped (including bits in the
    // wider last block). Every such pair MUST surface from the banded
    // self-join — this is the completeness contract simhashBandKeys
    // documents, across several (maxHamming, combine) geometries.
    val rnd = new scala.util.Random(20260812L)
    val n = 120
    for ((maxH, combine) <- Seq((3, 2), (2, 2), (3, 3), (3, 1))) {
      val rows = (0 until n).flatMap { i =>
        val base = rnd.nextLong() & ((1L << TextAnalysis.SimhashBits) - 1)
        val flips = rnd.nextInt(maxH + 1)
        val pert = (0 until flips).foldLeft(base) { (fp, _) =>
          fp ^ (1L << rnd.nextInt(TextAnalysis.SimhashBits))
        }
        Seq((i.toLong * 2, base), (i.toLong * 2 + 1, pert))
      }
      val fps = rows.toDF("doc_id", "simhash")
      val found = TextAnalysis
        .simhashPairsFromFingerprints(fps, "doc_id", maxH, combine)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = rows.grouped(2).collect {
        case Seq((ia, fa), (ib, fb))
            if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= maxH =>
          (ia, ib)
      }.toSet
      assert(expected.subsetOf(found),
        s"missed pairs at maxHamming=$maxH combine=$combine: ${expected -- found}")
      // And soundness: nothing beyond the hamming bound leaks through.
      assert(found.forall { case (a, b) =>
        val m = rows.toMap; java.lang.Long.bitCount(m(a) ^ m(b)) <= maxH
      })
    }
  }

  test("planted identical-fingerprint hot cluster: bounded candidates," +
    " output equals arithmetic brute") {
    // The no-upstream-exact-dedup case: 10^4 docs share one fingerprint
    // (exact-duplicate texts), plus varied singletons — some within
    // hamming 3 of the cluster. Candidate volume must stay rep-level.
    val m = 10000
    val hot = 0x0F0F0F0F0F0FFL & ((1L << TextAnalysis.SimhashBits) - 1)
    val rows = (0L until m.toLong).map(id => (id, hot)) ++
      (0 until 40).map { i =>
        // i < 8 → flip i+1 low bits (hamming i+1 from the cluster);
        // rest → far-away fingerprints.
        val fp = if (i < 8) hot ^ ((1L << (i + 1)) - 1)
        else (0x123456789ABCDL * (i + 1)) & ((1L << TextAnalysis.SimhashBits) - 1)
        (m + i.toLong, fp)
      }
    val fps = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 16)).toDF("doc_id", "simhash")
    val members = fps.select($"doc_id".as("id"), $"simhash".as("fp"))
    val groups = members.groupBy($"fp").agg(min($"id").as("rep"))
    val nGroups = groups.count()
    assert(nGroups <= 41)
    // Rep-level: the banded lane (band >= 0) of the folded engine is
    // bounded by distinct-fingerprint pairs, not member pairs — a
    // per-member band join would have generated >= C(10^4, 2) rows
    // from the hot cluster (and would not finish in test time).
    val candRows = graft.ext.FuzzyJoin.hammingLanePairs(members, groups,
        fp => TextAnalysis.simhashBandKeyExprs(fp, 3, 2), 3, 4096)
      .filter($"band" >= 0).count()
    assert(candRows <= nGroups * (nGroups - 1) / 2)

    // Arithmetic brute over distinct fingerprints × group sizes.
    val bySig = rows.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val sigs = bySig.keys.toSeq
    val expectWithin = bySig.values.map(n => n * (n - 1) / 2).sum
    val expectCross = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.size
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
    } yield bySig(sigs(i)) * bySig(sigs(j))).sum
    assert(expectWithin >= m.toLong * (m - 1) / 2)
    assert(expectCross >= 3L * m) // hamming 1..3 planted neighbors hit the cluster

    val out = TextAnalysis.simhashPairsFromFingerprints(fps, "doc_id", 3, 2).cache()
    val byHam = out.groupBy("hamming").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byHam.getOrElse(0L, 0L) === expectWithin)
    assert(byHam.filter(_._1 > 0L).values.sum === expectCross)
    assert(out.filter($"id_a" >= $"id_b").count() === 0L)
    assert(out.select("id_a", "id_b").distinct().count() === expectWithin + expectCross)
    out.unpersist()
  }

  test("bpe token stats split letter/digit/punct runs") {
    val docs = Seq((1L, "ab2c, d-e 42")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenStats(docs, "text", "doc_id").head()
    // ab|2|c|,|d|-|e|42 → 8 tokens, all distinct
    assert(r.getLong(1) == 8 && r.getLong(2) == 8)
  }

  test("stratified sample composes consistently with the global hash split") {
    val docs = t(spark, sf0001, "documents")
    val rates = Map("en" -> 50, "de" -> 20)
    val mixed = TextAnalysis.stratifiedSample(docs, "doc_id", "lang", rates)
      .select($"doc_id", $"lang").collect().map(r => r.getLong(0) -> r.getString(1))
    // Unlisted strata fall to the 0% default.
    assert(mixed.map(_._2).toSet == Set("en", "de"))
    // Same bucket function as deterministicSample: the 20% global
    // prefix restricted to 'de' IS the de-stratum sample, and every
    // 20%-prefix 'en' doc is inside the 50% en sample.
    val global20 = TextAnalysis.deterministicSample(docs, "doc_id", 20)
      .select($"doc_id", $"lang").collect().map(r => r.getLong(0) -> r.getString(1))
    val mixedIds = mixed.map(_._1).toSet
    assert(global20.filter(_._2 == "de").map(_._1).toSet ==
      mixed.filter(_._2 == "de").map(_._1).toSet)
    assert(global20.filter(_._2 == "en").map(_._1).toSet.subsetOf(mixedIds))
    assert(mixed.nonEmpty)
  }

  test("temperatureMix keeps the rarest key whole and flattens by the integer rule") {
    // Skewed mixture: 400 a / 100 b / 25 c.
    val docs = ((1L to 400L).map(_ -> "a") ++ (401L to 500L).map(_ -> "b") ++
      (501L to 525L).map(_ -> "c")).toDF("doc_id", "lang")
    val kept = TextAnalysis.temperatureMix(docs, "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // Independent recompute: hash buckets from the engine, the keep rule
    // in plain Scala integer arithmetic.
    val buckets = docs
      .select($"doc_id", $"lang",
        pmod(TextAnalysis.tokenHash($"doc_id".cast("string")), lit(100L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = Map("a" -> 400L, "b" -> 100L, "c" -> 25L)
    val expected = buckets.collect {
      case (id, k, b) if b * b * n(k) < 10000L * 25L => id -> k
    }
    assert(kept.toSet == expected.toSet)
    // The rarest key survives in full; kept mass flattens toward sqrt:
    // ~100·sqrt(25·n_k) docs per key vs the raw 400/100/25.
    val byKey = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byKey("c") == 25)
    assert(byKey("b") > 35 && byKey("b") < 65, s"b kept ${byKey("b")}, want ~50")
    assert(byKey("a") > 80 && byKey("a") < 120, s"a kept ${byKey("a")}, want ~100")
  }

  test("bottomKSample: exact size, nesting, repartition stability, heap plan") {
    val docs = t(spark, sf0001, "documents")
    val s10 = TextAnalysis.bottomKSample(docs, "doc_id", 10)
      .collect().map(_.getLong(0)).toSet
    val s30 = TextAnalysis.bottomKSample(docs, "doc_id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(s10.size == 10 && s30.size == 30)
    assert(s10.subsetOf(s30), "bottom-k samples must nest")
    val reshuffled = TextAnalysis.bottomKSample(docs.repartition(7), "doc_id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(reshuffled == s30, "sample must not depend on physical layout")
    val plan = TextAnalysis.bottomKSample(docs, "doc_id", 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a per-partition heap top-k, got:\n$plan")
  }

  test("docChunks tiles the token stream: stride starts, full coverage, exact hashes") {
    // Token counts straddling every regime: < chunk, == chunk, one past,
    // mid, exactly chunk+stride, and a long tail.
    val sizes = Seq(1, 31, 32, 33, 40, 56, 57, 80, 110)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val rows = TextAnalysis.docChunks(docs, "doc_id", "text", 32, 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((n, i) <- sizes.zipWithIndex) {
      val chunks = rows(i.toLong).sortBy(_._2)
      val expectedN = if (n <= 32) 1 else (n - 32 + 23) / 24 + 1
      assert(chunks.length == expectedN, s"doc of $n tokens: ${chunks.length} chunks")
      for ((_, cid, start, len, hash) <- chunks) {
        assert(start == cid * 24)
        assert(len == math.min(32, n - start), s"doc $n chunk $cid length")
        val text = (start + 1 to start + len).map(j => s"t$j").mkString(" ")
        val ref = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(hash == ref, s"doc $n chunk $cid hash mismatch")
      }
      // Coverage: last chunk ends at n, consecutive chunks overlap by 8.
      assert(chunks.last._3 + chunks.last._4 == n)
      for (w <- chunks.sliding(2) if w.length == 2)
        assert(w(1)._3 == w(0)._3 + 24)
    }
    // Map-only contract: no exchange anywhere in the plan.
    val plan = TextAnalysis.docChunks(docs, "doc_id", "text", 32, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("multimodal decode: mapPartitions stub extracts typed features") {
    val docs = Seq(
      (1L, "Hello world payload"),
      (2L, "x")) // too short: quarantined by the decoder
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val feats = Multimodal.decodeFeatures(docs, "doc_id", "payload").collect()
    assert(feats.map(_.doc_id).toSeq == Seq(1L))
    val f = feats.head
    assert(f.n_bytes == 19)
    assert(f.width == ('H'.toInt % 640) + 1 && f.height == ('e'.toInt % 480) + 1)
    assert(f.header_hash.length == 32)
  }
}
