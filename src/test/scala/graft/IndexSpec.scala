package graft

import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.index.{Builder, Tokenizer}
import graft.query.{Oracle, Searcher}

/** Build + query integration: rank identity vs the brute-force oracle,
  * content-sha256 integrity, reconstruction, match counting, resume. */
class IndexSpec extends SparkTestBase {
  import Searcher.Query

  private lazy val corpus = Synth.corpus(spark, 400, seed = 42L).cache()
  private lazy val indexDir = {
    val d = tmpDir("graft-index")
    // saltTarget=50 forces head-term salting (id_0 has df ~ 300 of 400)
    Builder.build(spark, corpus, d,
      Builder.Config(blockSize = 32, nBuckets = 8, nSegments = 2, saltTarget = 50))
    d
  }

  private def sampleQueries: Seq[Query] = {
    // sample real terms from docs (like generate_queries_hard.pl samples
    // real walks, /root/reference/benchmark/scripts/gin_run.sh:18)
    val doc0 = Synth.doc(42L, 7L).content
    val doc1 = Synth.doc(42L, 123L).content
    val t0 = Tokenizer.tokens(doc0)
    val t1 = Tokenizer.tokens(doc1)
    Seq(
      Query(1, t0(0)),                              // single term
      Query(2, s"${t0(1)} ${t0(5)}"),               // 2-term AND
      Query(3, s"${t1(0)} ${t1(3)} ${t1(9)}"),      // 3-term
      Query(4, "zzz_unknown_term"),                 // DEAD fork -> empty
      Query(5, s"${t0(2)} ${t0(2)}"),               // duplicated term
      Query(6, "id_0 id_1"),                        // head terms (skew)
      Query(7, s"${t1(2)} zzz_unknown_term"),       // partially unknown AND
      Query(8, t1(4))
    )
  }

  test("engine top-k is rank-identical to the brute-force oracle") {
    val k = 10
    val got = Searcher.searchTopK(spark, indexDir, sampleQueries, k, Searcher.And, nBuckets = 8)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val withIds = Builder.withDocIds(corpus)
    val want = Oracle.topK(spark, withIds, sampleQueries, k)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
      assert(math.abs(g._4 - w._4) <= 1e-9, s"score $g vs $w")
    }
    // unknown-term conjunctive queries are empty
    assert(!got.exists(_._1 == 4L) && !got.exists(_._1 == 7L))
    // known queries produce hits
    assert(got.exists(_._1 == 1L) && got.exists(_._1 == 6L))
  }

  test("WAND path and relational path produce identical rankings") {
    val qs = sampleQueries
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val wand = rows(Searcher.searchTopKWand(spark, indexDir, qs, 10, Searcher.And, 8))
    val rel = rows(Searcher.searchTopKRelational(spark, indexDir, qs, 10, Searcher.And, 8))
    assert(wand == rel)
    val wandOr = rows(Searcher.searchTopKWand(spark, indexDir, qs, 10, Searcher.Or, 8))
    val relOr = rows(Searcher.searchTopKRelational(spark, indexDir, qs, 10, Searcher.Or, 8))
    assert(wandOr == relOr)
    assert(wandOr.nonEmpty)
  }

  test("executor-side WAND batch serving is rank-identical to the driver loop") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    for (mode <- Seq(Searcher.And, Searcher.Or)) {
      val driver = rows(Searcher.searchTopKWand(spark, indexDir,
        sampleQueries, 10, mode, nBuckets = 8))
      val execs = rows(Searcher.searchTopKWandExecutors(spark, indexDir,
        sampleQueries, 10, mode, nBuckets = 8))
      assert(execs == driver, s"mode $mode")
    }
  }

  test("striped executor WAND (Σ df ≫ stripe budget) is rank-identical") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    // stripePostings=64 on a 400-doc corpus forces every query into many
    // doc-range stripes (the Σ df ≫ budget shape that used to fall back
    // to the relational plan); per-stripe exact top-ks must merge into
    // the exact global ranking for AND and OR alike
    for (mode <- Seq(Searcher.And, Searcher.Or)) {
      val driver = rows(Searcher.searchTopKWand(spark, indexDir,
        sampleQueries, 10, mode, nBuckets = 8))
      val striped = rows(Searcher.searchTopKWandExecutors(spark, indexDir,
        sampleQueries, 10, mode, nBuckets = 8, stripePostings = 64L))
      assert(striped == driver, s"mode $mode")
      assert(striped.nonEmpty)
    }
    // dispatcher sends over-cap volumes to the executor path now: same
    // rankings through the public entry (cap can't be crossed at test
    // scale, so call the executor path as the dispatcher would)
    val one = rows(Searcher.searchTopKWandExecutors(spark, indexDir,
      Seq(Query(60, "id_0 id_1")), 5, Searcher.And, nBuckets = 8,
      stripePostings = 1L)) // 1 posting/stripe -> MaxStripesPerQuery clamp
    val oneDrv = rows(Searcher.searchTopKWand(spark, indexDir,
      Seq(Query(60, "id_0 id_1")), 5, Searcher.And, nBuckets = 8))
    assert(one == oneDrv)
  }

  test("striped AND: stripes missing one term fabricate no matches") {
    import spark.implicits._
    // a repo-LOCAL term's blocks cover one narrow doc range while the
    // common global term covers every stripe: conjunctive stripes where
    // the local term has no block must emit NOTHING (running the AND
    // loop over the present subset would fabricate common-only matches,
    // and with k above the true conjunctive count they would surface)
    val d = tmpDir("stripe-and-gap")
    Builder.build(spark, Synth.localizedCorpus(spark, 600), d,
      Builder.Config(blockSize = 16, nBuckets = 8, nSegments = 1,
        saltTarget = 400, verifySegments = false))
    val dictAll = Builder.dictionary(spark, d)
      .select("term", "df").as[(String, Long)].collect().toMap
    // smallest-df local term, and k ABOVE its df: the true conjunctive
    // match count is <= df(rare), so any fabricated common-only match
    // would have to surface in the top-k
    val (rare, rareDf) = dictAll.filter { case (t, df) =>
      t.startsWith("loc_") && df >= 2
    }.minBy { case (t, df) => (df, t) }
    val common = dictAll.filterNot(_._1.startsWith("loc_")).maxBy(_._2)._1
    assert(rareDf < 20, s"fixture needs a sparse local term, got df=$rareDf")
    val qs = Seq(Query(1, s"$rare $common"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    val driver = rows(Searcher.searchTopKWand(spark, d, qs, 20,
      Searcher.And, nBuckets = 8))
    val striped = rows(Searcher.searchTopKWandExecutors(spark, d, qs, 20,
      Searcher.And, nBuckets = 8, stripePostings = 32L))
    assert(striped == driver)
  }

  test("OR maxscore prune: fewer blocks decoded, rankings unchanged") {
    import spark.implicits._
    import graft.query.IndexHandle
    // head+tail mix on a LOCALIZED corpus: a repo-local term's blocks
    // span only its repo's doc range, so it anchors θ_lb high AND gives
    // narrow candidate intervals — the common global terms' blocks
    // outside those intervals must be dropped pre-decode
    val d = tmpDir("or-maxscore")
    Builder.build(spark, Synth.localizedCorpus(spark, 600), d,
      Builder.Config(blockSize = 16, nBuckets = 8, nSegments = 1,
        saltTarget = 400, verifySegments = false))
    val handle = IndexHandle.open(spark, d, 8)
    val dictAll = Builder.dictionary(spark, d)
      .select("term", "df").as[(String, Long)].collect().toMap
    val rare = dictAll.filter { case (t, df) =>
      t.startsWith("loc_") && df >= 5 && df <= 60
    }.keys.min
    val common = dictAll.filterNot(_._1.startsWith("loc_")).maxBy(_._2)._1
    val common2 = (dictAll - common).filterNot(_._1.startsWith("loc_"))
      .maxBy(_._2)._1
    val qs = Seq(Query(1, s"$rare $common"), Query(2, s"$rare $common $common2"))
    val dict = handle.dfOf(qs.flatMap(q => Tokenizer.tokens(q.text)).distinct)
    val live = qs.map(q =>
      q.query_id -> Tokenizer.tokens(q.text).distinct.toSeq).toMap
    val all = handle.blocksFor(live.values.flatten.toSeq.distinct)
    val pruned = Searcher.pruneBlocksOrMaxscore(spark, handle, all, live,
      dict, k = 5)
    val (nAll, nPruned) = (all.count(), pruned.count())
    assert(nPruned < nAll, s"no blocks pruned: $nPruned of $nAll")
    // rankings across the paths stay identical under the prune
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val rel = rows(Searcher.searchTopKRelational(spark, d, qs, 5,
      Searcher.Or, 8))
    val wand = rows(Searcher.searchTopKWand(spark, d, qs, 5,
      Searcher.Or, 8))
    assert(rel == wand && rel.nonEmpty)
  }

  test("head cache: cached single-term results identical to live search") {
    import graft.query.{HeadCache, IndexHandle}
    // build cache over head terms of the shared index
    graft.query.HeadCache.build(spark, indexDir, minDf = 100, k = 10)
    val handle = IndexHandle.open(spark, indexDir, 8)
    val (cacheMap, cacheK) = handle.headCache
    assert(cacheMap.nonEmpty && cacheK == 10)
    assert(cacheMap.contains("id_0")) // df ~ 300 of 400
    val qs = Seq(Query(1, "id_0"), Query(2, "id_1"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    // cached WAND path vs relational (never cache-served) must agree
    val cached = rows(Searcher.searchTopKWand(spark, indexDir, qs, 10, Searcher.And, 8))
    val rel = rows(Searcher.searchTopKRelational(spark, indexDir, qs, 10, Searcher.And, 8))
    assert(cached == rel)
    // executor path probes the same cache: an all-cached batch (driver
    // early return, no block join) and a mixed batch (union of cached +
    // executor-computed rows) both match
    val exAll = rows(Searcher.searchTopKWandExecutors(spark, indexDir, qs,
      10, Searcher.And, 8))
    assert(exAll == rel)
    val mixed = qs :+ Query(3, "id_0 id_1 id_2 id_3") // 4 terms: never cached
    val exMixed = rows(Searcher.searchTopKWandExecutors(spark, indexDir,
      mixed, 10, Searcher.And, 8))
    val relMixed = rows(Searcher.searchTopKRelational(spark, indexDir,
      mixed, 10, Searcher.And, 8))
    assert(exMixed == relMixed)
  }

  test("head cache is built distributedly (no posting collect) even non-resident") {
    import graft.query.{HeadCache, IndexHandle}
    // force the non-resident handle path: cache build must still work
    // without pinning blocks in memory (and never collects posting lists)
    spark.conf.set("graft.postings.persistCap", "1")
    val d = tmpDir("graft-hc-nonres")
    try {
      Builder.build(spark, Synth.corpus(spark, 150, seed = 11L), d,
        Builder.Config(blockSize = 16, nBuckets = 8, nSegments = 2, saltTarget = 40))
      HeadCache.build(spark, d, minDf = 40, k = 5)
      val h = IndexHandle.open(spark, d, 8)
      assert(!h.postingsResident)
      val (cacheMap, k) = h.headCache
      assert(cacheMap.nonEmpty && k == 5)
      // cached answer == live relational answer
      val t = cacheMap.keys.head
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("rank").collect()
          .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      val cached = rows(Searcher.searchTopKWand(spark, d,
        Seq(Query(1, t)), 5, Searcher.And, 8))
      val rel = rows(Searcher.searchTopKRelational(spark, d,
        Seq(Query(1, t)), 5, Searcher.And, 8))
      assert(cached == rel)
      h.close()
    } finally spark.conf.unset("graft.postings.persistCap")
  }

  test("head pair cache (depth 2): cached 2-term AND identical to live search") {
    import graft.query.{HeadCache, IndexHandle}
    HeadCache.buildPairs(spark, indexDir, maxPairTerms = 6, k = 10, nBuckets = 8)
    val handle = IndexHandle.open(spark, indexDir, 8)
    val (pairMap, k2) = handle.headCache2
    assert(pairMap.nonEmpty && k2 == 10)
    assert(pairMap.contains(("id_0", "id_1")))
    val qs = Seq(Query(1, "id_0 id_1"), Query(2, "id_1 id_0"), // order-free
      Query(3, "id_2 id_0"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val cached = rows(Searcher.searchTopKWand(spark, indexDir, qs, 10, Searcher.And, 8))
    val rel = rows(Searcher.searchTopKRelational(spark, indexDir, qs, 10, Searcher.And, 8))
    assert(cached == rel)
    assert(cached.nonEmpty)
  }

  test("head triple cache (depth 3): cached 3-term AND identical to live search") {
    import graft.query.{HeadCache, IndexHandle}
    HeadCache.buildTriples(spark, indexDir, maxTripleTerms = 6, k = 10,
      nBuckets = 8)
    val handle = IndexHandle.open(spark, indexDir, 8)
    val (tripleMap, k3) = handle.headCache3
    assert(tripleMap.nonEmpty && k3 == 10)
    assert(tripleMap.contains(("id_0", "id_1", "id_2")))
    val qs = Seq(Query(1, "id_0 id_1 id_2"), Query(2, "id_2 id_0 id_1"),
      Query(3, "id_1 id_3 id_0"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val cached = rows(Searcher.searchTopKWand(spark, indexDir, qs, 10, Searcher.And, 8))
    val rel = rows(Searcher.searchTopKRelational(spark, indexDir, qs, 10, Searcher.And, 8))
    assert(cached == rel)
    assert(cached.nonEmpty)
  }

  test("staged pair cache at maxPairTerms=256 is identical to live search") {
    import spark.implicits._
    import graft.query.{HeadCache, IndexHandle}
    // small closed vocabulary so top-256 covers it all: the staging path
    // (many bounded pair batches, appended) gets exercised without a
    // quadratic blowup in test time
    val vocab = 40
    val docs = (0 until 120).map { i =>
      val toks = (0 until 30).map(j => s"w${(i * 7 + j * 11) % vocab}")
      graft.index.CodeDoc(f"r${i / 30}%02d", f"f$i%04d.c", "c0", "c",
        toks.mkString(" "))
    }
    val d = tmpDir("pair-staged")
    Builder.build(spark, docs.toDF(), d, Builder.Config(blockSize = 16,
      nBuckets = 8, nSegments = 1, saltTarget = 100000))
    HeadCache.buildPairs(spark, d, maxPairTerms = 256, k = 5, nBuckets = 8,
      pairBatch = 100)
    val h = IndexHandle.open(spark, d, 8)
    val (pairMap, k2) = h.headCache2
    assert(k2 == 5 && pairMap.size > 400) // most of the 780 pairs co-occur
    pairMap.keys.take(5).foreach { case (a, b) =>
      val rel = Searcher.searchTopKRelational(spark, d,
          Seq(Query(1, s"$a $b")), 5, Searcher.And, 8)
        .orderBy("rank").collect()
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(pairMap((a, b)).map(s => (s.doc_id, s.score)) == rel,
        s"pair ($a,$b)")
    }
    h.close()
  }

  test("cache/dictionary crash states heal or degrade gracefully") {
    import spark.implicits._
    import graft.query.{HeadCache, IndexHandle}
    val d = tmpDir("crash-states")
    Builder.build(spark, Synth.corpus(spark, 60, seed = 19L), d,
      Builder.Config(blockSize = 16, nBuckets = 4, nSegments = 1,
        saltTarget = 1000))
    // cache marker WITHOUT data (crash between marker write and a failed
    // rebuild): loaders must report an absent cache, not throw
    graft.util.Fs.write(spark, s"$d/_COMMIT_head_cache2", """{"n":8,"k":5}""")
    assert(HeadCache.loadPairs(spark, d) == (Map.empty, 0))
    graft.util.Fs.delete(spark, s"$d/_COMMIT_head_cache2")
    // searches still work with the dangling marker gone
    assert(Searcher.searchTopK(spark, d,
      Seq(Query(1, "id_0")), 5, Searcher.And, 4).count() > 0)
    // legacy (pre-delta) dictionary crash state: dictionary renamed to an
    // undo log and never restored — recovery must promote it
    graft.util.Fs.rename(spark, s"$d/dictionary", s"$d/dictionary_undo_b7")
    Builder.recoverDictionary(spark, d)
    assert(graft.util.Fs.exists(spark, s"$d/dictionary"))
    IndexHandle.invalidate(spark, d)
    assert(Searcher.searchTopK(spark, d,
      Seq(Query(1, "id_0")), 5, Searcher.And, 4).count() > 0)
  }

  test("posting block ranges are disjoint and sorted per term (WAND invariant)") {
    import spark.implicits._
    val byTerm = spark.read.parquet(s"$indexDir/postings")
      .select($"term", $"doc_id_base", $"doc_id_max")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    byTerm.foreach { case (t, bs) =>
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, max1), (_, base2, _)) =>
          assert(max1 < base2, s"term $t has overlapping blocks")
        case _ =>
      }
    }
    assert(byTerm.nonEmpty)
  }

  test("docmeta sha256 matches source content per row (deindex invariant)") {
    val meta = spark.read.parquet(s"$indexDir/docmeta")
    val src = Builder.withDocIds(corpus)
      .select(col("doc_id"), sha2(col("content"), 256).as("src_sha"))
    val joined = meta.join(src, "doc_id")
    assert(joined.count() == corpus.count())
    assert(joined.filter(col("content_sha256") =!= col("src_sha")).count() == 0)
  }

  test("postings reconstruct per-doc token counts (deindex round-trip)") {
    import spark.implicits._
    val fromIndex = spark.read.parquet(s"$indexDir/postings")
      .select($"term", $"block_id", $"doc_id_base", $"doc_id_max", $"num_docs",
        $"max_tf", $"min_dl", $"doc_deltas", $"tfs", $"dls")
      .as[graft.index.PostingBlock]
      .flatMap(Builder.decodeBlock)
      .groupBy("doc_id").agg(sum("tf").as("sum_tf"))
    val fromMeta = spark.read.parquet(s"$indexDir/docmeta").select($"doc_id", $"dl")
    val bad = fromIndex.join(fromMeta, "doc_id")
      .filter(col("sum_tf") =!= col("dl")).count()
    assert(bad == 0)
    assert(fromIndex.count() == corpus.count())
  }

  test("dictionary df/cf match recomputation from corpus") {
    import spark.implicits._
    val dict = spark.read.parquet(s"$indexDir/dictionary")
    val recomputed = Builder.withDocIds(corpus)
      .select(col("doc_id"), explode(Builder.tokensCol(col("content"))).as("term"))
      .groupBy("term")
      .agg(countDistinct("doc_id").as("df2"), count(lit(1)).as("cf2"))
    val bad = dict.join(recomputed, "term")
      .filter(col("df") =!= col("df2") || col("cf") =!= col("cf2")).count()
    assert(bad == 0)
    assert(dict.count() == recomputed.count())
  }

  test("match counting: engine == oracle, zero-match queries emit rows") {
    val qs = sampleQueries
    val counts = Searcher.countMatches(spark, indexDir, qs, nBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size == qs.size)
    assert(counts(4L) == 0L) // unknown term
    assert(counts(1L) > 0L)
    // oracle: docs containing every distinct term
    val withIds = Builder.withDocIds(corpus).cache()
    val q2terms = Tokenizer.tokens(qs(1).text).distinct
    val oracleCount = withIds.filter(q2terms.map(t =>
      array_contains(Builder.tokensCol(col("content")), t)).reduce(_ && _)).count()
    assert(counts(2L) == oracleCount)
  }

  test("docID assignment parallelizes inside one giant repo (monorepo)") {
    import spark.implicits._
    val n = 20000
    // ONE repo: the r2 per-repo window would funnel all n rows through a
    // single task; the range-sorted assignment must not
    val corpus = spark.range(n).select(
      lit("monorepo").as("repo"),
      format_string("src/%02d/f%08d.c", pmod(col("id"), lit(37)), col("id"))
        .as("path"),
      lit("c0").as("commit"), lit("c").as("lang"),
      concat(lit("alpha beta f"), col("id").cast("string")).as("content"))
    val ids = Builder.withDocIds(corpus)
    assert(ids.rdd.getNumPartitions > 1,
      "single-repo id assignment must run in >1 task")
    val got = ids.select("path", "doc_id").as[(String, Long)]
      .collect().sortBy(_._2)
    // dense 0..n-1, and identical to row_number over (repo, path, commit)
    assert(got.map(_._2).toSeq == (0L until n).toSeq)
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // deterministic across recomputation
    val again = Builder.withDocIds(corpus).select("path", "doc_id")
      .as[(String, Long)].collect().sortBy(_._2)
    assert(again.toSeq == got.toSeq)
  }

  test("resume: deleting one segment commit rebuilds only it, identically") {
    import java.nio.file.{Files, Paths}
    val d = tmpDir("graft-resume")
    val conf = Builder.Config(blockSize = 32, nBuckets = 8, nSegments = 2, saltTarget = 30)
    val small = Synth.corpus(spark, 120, seed = 7L)
    Builder.build(spark, small, d, conf)
    def fingerprint(): Array[(String, Long, Long)] =
      spark.read.parquet(s"$d/postings")
        .groupBy("term").agg(bit_xor(xxhash64(col("doc_deltas"))).as("h"),
          sum("num_docs").cast("long").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    val before = fingerprint()
    // simulate a killed run: segment 1 uncommitted + data gone
    Files.delete(Paths.get(d, "_COMMIT_segment_1"))
    Files.delete(Paths.get(d, "_COMMIT_index"))
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rm); p.delete()
    }
    rm(new java.io.File(s"$d/postings/segment=1"))
    Builder.build(spark, small, d, conf)
    val after = fingerprint()
    assert(after.toSeq == before.toSeq)
    assert(Files.exists(Paths.get(d, "_COMMIT_segment_1")))
  }

  test("docID ordering is pluggable (S4): a permutation reverses ids, index stays sound") {
    import spark.implicits._
    val small = Synth.corpus(spark, 60, seed = 11L)
    val n = 60L
    // permutation = exact reverse of the default (repo, path, commit)
    // order, supplied as a rank table the way a measured ordering would be
    val perm = Builder.withDocIds(small)
      .select(col("repo"), col("path"), col("commit"),
        (lit(n - 1) - col("doc_id")).as("ord"))
    val d = tmpDir("perm-idx")
    Builder.build(spark, Builder.withPermutation(small, perm), d,
      Builder.Config(blockSize = 32, nBuckets = 8, nSegments = 1,
        saltTarget = 30, orderCols = Seq("ord", "repo", "path", "commit")))
    // ids follow the permutation: doc with default id i now has id n-1-i
    val defIds = Builder.withDocIds(small).select("path", "doc_id")
      .as[(String, Long)].collect().toMap
    val gotIds = spark.read.parquet(s"$d/docmeta").select("path", "doc_id")
      .as[(String, Long)].collect().toMap
    assert(gotIds.size == n)
    gotIds.foreach { case (p, id) => assert(id == n - 1 - defIds(p), p) }
    // the reordered index still searches correctly (sha integrity held
    // by the snapshot; check a live query resolves a true match)
    val t = Tokenizer.tokens(Synth.doc(11L, 5L).content)(0)
    val hits = Searcher.searchTopK(spark, d, Seq(Query(1, t)), 5,
      Searcher.And, nBuckets = 8)
    val resolved = Searcher.resolve(spark, d, hits)
      .select("doc_id", "path").as[(Long, String)].collect()
    assert(resolved.nonEmpty)
    resolved.foreach { case (id, p) => assert(gotIds(p) == id) }
    // _META records the ordering for future readers/compactions
    assert(Builder.loadConfig(spark, d).get.orderCols ==
      Seq("ord", "repo", "path", "commit"))
  }

  test("verification: every reported hit's terms occur in the doc content") {
    import spark.implicits._
    val qs = sampleQueries.filter(q => q.query_id != 4 && q.query_id != 7)
    val hits = Searcher.searchTopK(spark, indexDir, qs, 5, Searcher.And, nBuckets = 8)
    val withIds = Builder.withDocIds(corpus)
      .select($"doc_id", $"content")
    val resolved = hits.join(withIds, "doc_id")
      .select($"query_id", $"doc_id", $"content")
      .as[(Long, Long, String)].collect()
    val byQ = qs.map(q => q.query_id -> Tokenizer.tokens(q.text).distinct).toMap
    resolved.foreach { case (qid, _, content) =>
      val docTerms = Tokenizer.tokens(content).toSet
      assert(byQ(qid).forall(docTerms.contains))
    }
  }
}
