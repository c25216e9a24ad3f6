package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today and more"), // near dup of 0
    (3L, "completely different content about spark catalyst optimizer rules and plans"),
    (4L, "spark catalyst optimizer rules and plans are completely different content about"), // shares all tokens w/ 3
    (5L, "unrelated text mentioning databases indexes and storage engines instead")
  ).toDF("doc_id", "text")

  test("exact dedup keeps smallest id per identical text") {
    val kept = Dedup.exact(corpus, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L, 4L, 5L))
  }

  test("minhash dedup drops exact and near duplicates, keeps distinct docs") {
    val kept = Dedup.minhash(corpus, "doc_id", "text",
      k = 3, numHashes = 128, bands = 64, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.contains(0L) && !kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && kept.contains(5L))
  }

  test("ngram jaccard dedup is exact: same verdicts as brute-force jaccard") {
    val kept = Dedup.ngramJaccard(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // brute force reference
    val rows = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    def j(a: String, b: String) = {
      val sa = Dedup.shingleHashes(a, 3).toSet
      val sb = Dedup.shingleHashes(b, 3).toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val expectDrop = rows.flatMap { case (ib, tb) =>
      rows.collect { case (ia, ta) if ia < ib && j(ta, tb) >= 0.5 => ib }
    }.toSet
    assert(kept.toSet == rows.map(_._1).toSet -- expectDrop)
  }

  test("minhashClusters drops transitively where pairwise keep-first cannot") {
    // chain a(1) ~ b(3) ~ c(2), no a~c edge; the middle node's id (3)
    // exceeds the chain tail's (2)
    val w = (1 to 40).map(i => s"w$i")
    val x = (1 to 10).map(i => s"x$i")
    val y = (1 to 10).map(i => s"y$i")
    val a = w.mkString(" ")                                  // w1..w40
    val b = (x ++ w.drop(10)).mkString(" ")                  // first quarter replaced
    val c = (x ++ y ++ w.drop(20)).mkString(" ")             // first two quarters replaced
    val df = Seq((1L, a), (3L, b), (2L, c)).toDF("doc_id", "text")
    val pairwise = Dedup.minhash(df, "doc_id", "text", numHashes = 192, bands = 64)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val clustered = Dedup.minhashClusters(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(pairwise == Seq(1L, 2L)) // c's only duplicate (b=3) has a larger id
    assert(clustered == Seq(1L))    // transitive closure reaches c through b
  }

  test("minhashClustersBest keeps the highest-score member per cluster, ties to smaller id, singletons survive") {
    import org.apache.spark.sql.functions.{col, length}
    val w = (1 to 40).map(i => s"w$i")
    val x = (1 to 10).map(i => s"x$i")
    val a = w.mkString(" ")                       // 40 toks
    val b = (x ++ w.drop(10)).mkString(" ")       // 40 toks, ~0.75 J with a
    val bPlus = b + " bonus tail words here"      // 44 toks: best of cluster
    val lone = (1 to 30).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, bPlus), (9L, lone))
      .toDF("doc_id", "text")
    val best = Dedup.minhashClustersBest(df, "doc_id", "text",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    // {1,2,3} cluster -> 3 (most tokens) wins despite largest id;
    // singleton 9 survives untouched
    assert(best == Seq(3L, 9L), s"got $best")
    // tie on score -> smaller id: drop the bonus tail
    val tie = Seq((5L, a), (4L, a), (9L, lone)).toDF("doc_id", "text")
    val kept = Dedup.minhashClustersBest(tie, "doc_id", "text",
        length(col("text")).cast("long"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(4L, 9L), s"tie must keep the smaller id: $kept")
  }

  test("simhash: identical text => identical hash; near text => small hamming") {
    val a = Dedup.simhash64("the quick brown fox jumps over the lazy dog repeatedly every single day")
    val b = Dedup.simhash64("the quick brown fox jumps over the lazy dog repeatedly every single day")
    assert(a == b)
    val c = Dedup.simhash64("the quick brown fox jumps over the lazy dog repeatedly every single day extra")
    assert(java.lang.Long.bitCount(a ^ c) <= 12) // near text stays close
    val d = Dedup.simhash64("entirely unrelated words about query engines and columnar storage formats")
    assert(java.lang.Long.bitCount(a ^ d) > 12) // far text diverges
  }

  test("simhash dedup drops exact copies via banding") {
    val kept = Dedup.simhash(corpus, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    assert(kept.contains(0L) && !kept.contains(1L))
  }

  test("simhash dedup equals brute-force all-pairs hamming keep-first on the fixture corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val withDups = docs.unionByName(docs.withColumn("doc_id", $"doc_id" + 100000))
    val kept = Dedup.simhash(withDups, "doc_id", "text").select("doc_id")
      .as[Long].collect().toSet
    // brute force: driver-side all-pairs popcount over the 1000 signatures
    val sigs = withDups.select($"doc_id",
        udf((t: String) => Dedup.simhash64(t)).apply($"text").as("sig"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val expected = sigs.zipWithIndex.collect { case ((id, sig), j)
        if !sigs.take(j).exists { case (_, s2) =>
          java.lang.Long.bitCount(sig ^ s2) <= 3 } => id }.toSet
    assert(kept == expected)
  }

  test("exactAgainstBloom == plain anti-join, even with a tiny high-fpp filter") {
    val corpus = Seq((0L, "alpha doc"), (1L, "beta doc"), (2L, "gamma doc"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha doc"), // dup of corpus 0 -> dropped
      (11L, "delta doc"), // new
      (12L, "beta doc"),  // dup of corpus 1 -> dropped
      (13L, "epsilon doc"), // new
      (14L, "delta doc")  // batch-internal dup of 11: NOT collapsed (documented)
    ).toDF("doc_id", "text")
    val expected = batch.join(corpus.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val kept = Dedup.exactAgainstBloom(corpus, batch, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == expected && kept == Seq(11L, 13L, 14L))
    // a deliberately undersized filter (expectedItems=1, fpp=0.5) floods
    // the verify path with false positives; the result must not change —
    // the Bloom filter only ROUTES rows, the anti-join decides
    val keptNoisy = Dedup.exactAgainstBloom(corpus, batch, "text",
        expectedItems = 1L, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptNoisy == expected)
    // schema/column order preserved for downstream unions
    assert(Dedup.exactAgainstBloom(corpus, batch, "text").columns.toSeq
      == Seq("doc_id", "text"))
  }

  test("exactAgainstBloom keeps null-text batch rows, like the NOT-EXISTS oracle") {
    val corpus = Seq((0L, "alpha doc"), (1L, "beta doc")).toDF("doc_id", "text")
    val batch = Seq((10L, Some("alpha doc")), (11L, None), (12L, Some("new doc")),
      (13L, None)).toDF("doc_id", "text")
    // oracle: anti-join null keys never match, so null-text rows are kept
    val expected = batch.join(corpus.select("text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val kept = Dedup.exactAgainstBloom(corpus, batch, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == expected && kept == Seq(11L, 12L, 13L))
  }

  test("imageNearDup: perceptual near-copies collapse, distinct and undecodable survive") {
    import graft.operators.Multimodal
    def blocky(seed: Long, flip: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (Dedup.splitmix64(seed ^ (x / 8 * 31 + y / 8).toLong) >>> 56).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      for (i <- 0 until flip) img.setRGB(i % 64, (i * 7) % 64, 0xFFFFFF)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    val imgs = Seq(
      (0L, blocky(1L, 0)),
      (1L, blocky(1L, 0)), // byte-identical re-render of 0
      (2L, blocky(1L, 12)), // perturbed near-copy of 0
      (3L, blocky(99L, 0)), // unrelated
      (4L, "not an image".getBytes)) // undecodable: must survive
      .toDF("img_id", "blob")
    val kept = Dedup.imageNearDup(imgs, "img_id", "blob", maxHamming = 8)
      .select("img_id").as[Long].collect().sorted
    assert(kept.contains(0L) && !kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("embedding cosine dedup drops scaled copies only") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val withDups = emb.unionByName(emb
      .withColumn("vec_id", $"vec_id" + 100000)
      .withColumn("embedding", transform($"embedding", x => x * lit(2.0f))))
    val kept = Dedup.embeddingCosine(withDups, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.length == 500 && kept.forall(_ < 100000))
  }

  test("minhashAgainst == brute-force bipartite jaccard; corpus never dropped") {
    // corpus = the fixture; batch = one exact copy (must drop), one near
    // copy (must drop), one fresh doc (must keep)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "a quick brown fox jumps over the lazy dog near the river bank today"),
      (102L, "entirely novel sentences with vocabulary shared by no corpus document whatsoever")
    ).toDF("doc_id", "text")
    val kept = Dedup.minhashAgainst(corpus, batch, "doc_id", "text",
        k = 3, numHashes = 128, bands = 64, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // brute-force reference: batch doc dropped iff exact trigram jaccard
    // >= 0.5 against ANY corpus doc
    val corp = corpus.as[(Long, String)].collect()
    val expected = batch.as[(Long, String)].collect().collect {
      case (id, t) if !corp.exists { case (_, c) =>
        Dedup.jaccardGE(Dedup.shingleHashes(c, 3), Dedup.shingleHashes(t, 3), 0.5) } => id
    }.sorted.toSeq
    assert(kept == expected && kept.contains(102L) && !kept.contains(100L))
  }

  test("small-corpus carrier: identical drop set to minhashAgainstPrepared, batch buckets never broadcast") {
    // same fixture orientation as fuzzy decontamination: corpus is the
    // SMALL side (an eval suite), batch the big one (training docs)
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "a quick brown fox jumps over the lazy dog near the river bank today"),
      (102L, "entirely novel sentences with vocabulary shared by no corpus document whatsoever"),
      (103L, "catalyst rewrites logical plans into physical operators using rule based passes")
    ).toDF("doc_id", "text")
    val cp = Dedup.prepareMinhash(corpus, "doc_id", "text")
    val bp = Dedup.prepareMinhash(batch, "doc_id", "text")
    val forward = Dedup.minhashAgainstPrepared(cp, bp)
      .as[Long].collect().sorted.toSeq
    val reversed = Dedup.minhashAgainstPreparedSmallCorpus(cp, bp)
      .as[Long].collect().sorted.toSeq
    assert(forward == reversed && forward.nonEmpty,
      s"carriers must agree: forward=$forward reversed=$reversed")
  }

  test("semanticDedup: in-cell near-dups collapse; cross-cell near-dups survive (the trade)") {
    val centroids = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Seq(
      (1L, Seq(1.0f, 0.01f)),   // cell 1
      (2L, Seq(1.0f, 0.011f)),  // cell 1, cos(1,2)~1   -> drops (keep-first)
      (3L, Seq(0.01f, 1.0f)),   // cell 2, unique there -> survives
      (4L, Seq(0.72f, 0.70f)),  // cell 1 (barely)
      (5L, Seq(0.70f, 0.72f))   // cell 2; cos(4,5)~0.999 but SPLIT cells
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(rows, "vec_id", "embedding", centroids,
        threshold = 0.9)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    // 2 drops against 1; the near-identical 4/5 pair straddles the cell
    // boundary and BOTH survive — cross-cell loss is the documented
    // SemDeDup trade, asserted here so it stays a decision, not a bug
    assert(kept == Seq(1L, 3L, 4L, 5L))
    // sanity: all-pairs exact dedup (one cell) WOULD drop 5
    val oneCell = Dedup.semanticDedup(rows, "vec_id", "embedding",
        Seq(Array(1.0, 0.0)), threshold = 0.9)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(oneCell == Seq(1L, 3L, 4L))
  }

  test("semanticDedup large-k broadcast carrier: bit-identical to the literal path at k=4096, no plan literals") {
    import org.apache.spark.sql.functions.{array, array_max, array_position, typedLit}
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val rnd = new scala.util.Random(7)
    val cents = Seq.fill(4096)(Array.fill(64)(rnd.nextDouble() * 2.0 - 1.0))
    // assignment equality, the load-bearing claim: the scalar argmax
    // (same fused cosine loop, same SQL compare semantics) must pick the
    // IDENTICAL cell as the literal expression for every row — asserted
    // at the SemDeDup-regime-shaped k where the literal carrier is
    // already a 262k-literal plan
    val cos = cents.map(c => graft.functions.vectors.cosine($"v", typedLit(c.toSeq)))
    val literalCells = emb.withColumn("_cos", array(cos: _*))
      .select($"vec_id", array_position($"_cos", array_max($"_cos")).as("cell"))
      .as[(Long, Long)].collect().toMap
    val centArr = cents.toArray
    val scalarCells = emb.as[(Long, Array[Double])].collect()
      .map { case (id, v) => id -> Dedup.nearestCentroid(v, centArr) }.toMap
    assert(literalCells == scalarCells,
      "broadcast-path argmax must be bit-identical to the literal expression")
    // operator-level equality on a fixture with real in-cell duplicates
    // (each vector doubled => its copy must drop on both paths)
    val doubled = emb.unionByName(
      emb.select(($"vec_id" + 100000L).as("vec_id"), $"v"))
    val viaLiteral = Dedup.semanticDedup(doubled, "vec_id", "v", cents,
        threshold = 0.95, maxLiteralK = 4096)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val viaBroadcast = Dedup.semanticDedupBroadcast(doubled, "vec_id", "v", cents,
        threshold = 0.95)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(viaLiteral == viaBroadcast)
    // a copy always shares its original's (deterministic) cell and sees
    // it as a lower-id cos=1 neighbor, so no copy can survive
    assert(viaBroadcast.nonEmpty && viaBroadcast.forall(_ < 100000L))
    // the broadcast carrier must ship ZERO per-centroid plan literals —
    // probed with a distinctive element value that the literal plan
    // necessarily embeds
    val marker = 0.987654321
    val marked = Seq(Array.fill(64)(marker), Array.fill(64)(-marker))
    val litPlan = Dedup.semanticDedup(emb, "vec_id", "v", marked,
      threshold = 0.95).queryExecution.analyzed.toString
    val bcPlan = Dedup.semanticDedupBroadcast(emb, "vec_id", "v", marked,
      threshold = 0.95).queryExecution.analyzed.toString
    assert(litPlan.contains(marker.toString), "sanity: literal plan embeds centroids")
    assert(!bcPlan.contains(marker.toString),
      "broadcast plan must not embed centroid values")
    // auto-dispatch: above maxLiteralK the public entry point takes the
    // broadcast carrier
    val autoPlan = Dedup.semanticDedup(emb, "vec_id", "v", marked,
      threshold = 0.95, maxLiteralK = 1).queryExecution.analyzed.toString
    assert(!autoPlan.contains(marker.toString))
  }

  test("semanticDedupBroadcast: null-casting ids flow through instead of crashing the typed decode") {
    val rows = Seq(
      ("10", Array(1.0, 0.0)),
      ("11", Array(1.0, 0.0000001)), // in-cell near-dup of 10 -> drops
      (null: String, Array(0.9, 0.1)) // null id: passes through, both carriers
    ).toDF("doc_id", "v")
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"doc_id").as[String].collect().map(String.valueOf).sorted.toSeq
    val viaLiteral = ids(Dedup.semanticDedup(rows, "doc_id", "v", cents, threshold = 0.99))
    val viaBroadcast = ids(Dedup.semanticDedupBroadcast(rows, "doc_id", "v", cents,
      threshold = 0.99))
    assert(viaLiteral == viaBroadcast && viaBroadcast == Seq("10", "null"))
  }

  // Brute-force reference for exactSubstr: count every length-L window
  // (all docs, all positions, overlaps included), mark characters covered
  // by any window occurring >= minCount times, keep the rest in order.
  private def substrRef(docs: Seq[(Long, String)], l: Int,
      minCount: Int = 2): Map[Long, String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, t) <- docs; i <- 0 to t.length - l) counts(t.substring(i, i + l)) += 1
    docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - l; if counts(t.substring(i, i + l)) >= minCount;
           j <- i until i + l) covered(j) = true
      id -> t.zipWithIndex.collect { case (c, j) if !covered(j) => c }.mkString
    }.toMap
  }

  test("exactSubstr cuts exactly the brute-force duplicated spans") {
    val boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE GREAT CONTENT EVERY WEEK"
    val docs = Seq(
      (0L, s"alpha bravo charlie delta echo $boiler foxtrot golf hotel india"),
      (1L, s"juliet kilo lima mike november $boiler oscar papa quebec romeo"),
      (2L, "sierra tango uniform victor whiskey xray yankee zulu one two three four"),
      (3L, "repeat block repeat block repeat block repeat block repeat block xyz"),
      (4L, "tiny") // shorter than the window: untouched
    )
    val l = 20
    val expect = substrRef(docs, l)
    // sanity on the fixture itself: boilerplate cut, unique text kept,
    // in-doc self-repeat (doc 3) cut without a second document
    assert(!expect(0L).contains("NEWSLETTER") && expect(0L).contains("alpha bravo"))
    assert(expect(3L).length < docs(3)._2.length)
    assert(expect(2L) == docs(2)._2 && expect(4L) == "tiny")
    val got = Dedup.exactSubstr(docs.toDF("doc_id", "text"), "doc_id", "text",
        windowLen = l)
      .select($"doc_id", $"cleaned", $"kept_chars", $"removed_chars")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    for ((id, t) <- docs) {
      val (cleaned, kept, removed) = got(id)
      assert(cleaned == expect(id), s"doc $id")
      assert(kept == expect(id).length && removed == t.length - expect(id).length)
    }
  }

  test("exactSubstr: minCount raises the duplication bar") {
    val span = "this exact sentence appears in several documents verbatim"
    val docs = (0L to 3L).map(i => (i, s"doc$i unique prefix $i $span unique suffix $i"))
    val twice = Seq((10L, s"only here once $span and nowhere else but doc eleven"),
      (11L, s"second copy lives here $span inside this one document"))
    val all = (docs ++ twice).toDF("doc_id", "text")
    // minCount=6 > 6 occurrences is false (span occurs 6 times) -> cut;
    // minCount=7 -> kept everywhere
    val at6 = Dedup.exactSubstr(all, "doc_id", "text", windowLen = 30, minCount = 6)
      .filter($"removed_chars" > 0).count()
    val at7 = Dedup.exactSubstr(all, "doc_id", "text", windowLen = 30, minCount = 7)
      .agg(sum($"removed_chars")).as[Long].head()
    assert(at6 == 6 && at7 == 0L)
  }

  test("exactSubstr anchorStride: content-defined anchors catch a long dup at ANY alignment") {
    // the same long span pasted at different offsets (different alignment
    // mod stride) in two otherwise-unique docs: content-defined anchoring
    // selects the same interior positions in both copies, so the span is
    // still found; fixed-stride sampling could not guarantee that.
    val span = (1 to 40).map(i => s"boiler$i").mkString(" ") // ~360 chars
    val docs = Seq(
      (0L, "x " * 7 + span + " unique tail zero"),   // offset 14
      (1L, "yyy " + span + " unique tail one"),      // offset 4
      (2L, "entirely unrelated text with no duplicated spans present whatsoever"))
    val out = Dedup.exactSubstr(docs.toDF("doc_id", "text"), "doc_id", "text",
        windowLen = 30, anchorStride = 4)
      .select($"doc_id", $"removed_chars").as[(Long, Int)].collect().toMap
    assert(out(0L) > 250 && out(1L) > 250, s"long dup must be cut: $out")
    assert(out(2L) == 0)
  }

  test("exactSubstrAgainst == exactSubstr over the union, restricted to batch ids") {
    // combined (corpus + batch) window counts decide the cut either way,
    // so running exactSubstr on the union and keeping batch rows is an
    // oracle-by-composition for the incremental sidecar path
    val boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED WORLDWIDE FOREVER"
    val corpus = Seq(
      (100L, s"stored document one with $boiler stamped in the middle part"),
      (101L, "stored document two is entirely free of shared content today"))
    val batch = Seq(
      (1L, s"fresh crawl doc carrying $boiler plus its own novel words"), // corpus hit
      (2L, "totally novel crawl document with nothing repeated anywhere"),
      (3L, "loop segment loop segment loop segment loop segment ending")) // in-batch repeat
    val l = 20
    val side = Dedup.prepareSubstrCounts(corpus.toDF("doc_id", "text"), "text",
      windowLen = l)
    val got = Dedup.exactSubstrAgainst(side, batch.toDF("doc_id", "text"),
        "doc_id", "text", windowLen = l)
      .select($"doc_id", $"cleaned").as[(Long, String)].collect().toMap
    val viaUnion = Dedup.exactSubstr((corpus ++ batch).toDF("doc_id", "text"),
        "doc_id", "text", windowLen = l)
      .filter($"doc_id" < 100)
      .select($"doc_id", $"cleaned").as[(Long, String)].collect().toMap
    assert(got == viaUnion)
    // the fixture exercises all three cases
    assert(!got(1L).contains("COPYRIGHT") && got(1L).contains("novel words"))
    assert(got(2L) == batch(1)._2)
    assert(got(3L).length < batch(2)._2.length)
    // corpus rows never appear in the output
    assert(!got.contains(100L) && got.size == 3)
  }

  test("bucket-skew safety valve: oversized buckets are skipped, not squared") {
    // 200 identical docs -> bucket of 200 > maxBucketSize=50 -> no pairs,
    // nothing dropped (graceful degradation instead of OOM at scale)
    val many = (0 until 200).map(i => (i.toLong, "same text for every single row here yes"))
      .toDF("doc_id", "text")
    val kept = Dedup.minhash(many, "doc_id", "text",
      k = 3, numHashes = 32, bands = 16, threshold = 0.5, maxBucketSize = 50)
    assert(kept.count() == 200)
  }

  test("sorted-neighborhood: window pairs verified by integer-exact jaccard; out-of-window dups missed by design") {
    val d = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta epsilon"), // near dup of 0, adjacent in sort
      (2L, "alpha omega psi chi"),            // same prefix, low overlap
      (3L, "zeta eta theta iota"),
      (4L, "zeta eta theta iota kappa"),      // near dup of 3
      (5L, "mmm nnn ooo ppp")
    ).toDF("doc_id", "text")
    val key = substring(regexp_replace(lower($"text"),
      lit("[^a-z0-9]"), lit("")), 1, 8)
    val pairs = Dedup.sortedNeighborhood(d, "doc_id", "text", key,
        window = 3, thrNum = 1, thrDen = 2)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (3L, 4L)))
    // brute-force equality over ALL in-window pairs: the operator is
    // exactly "window pairs, then exact jaccard", nothing more
    val w = 4
    val all = Dedup.sortedNeighborhood(d, "doc_id", "text", key,
      window = w, thrNum = 0, thrDen = 1).count()
    assert(all == (d.count() - 1) * (w - 1) - ((w - 1) * (w - 2)) / 2)
  }

  test("containment: partial copy found even when symmetric jaccard is dilute; rare-shingle blocking; exact verify") {
    val big = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val d = Seq(
      (0L, big),
      (1L, "three four five six seven eight"), // contained span of 0
      (2L, "totally different words entirely here now"),
      (3L, big + " plus a tail of extra words here")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text",
        n = 3, dfCap = 10, thrNum = 4, thrDen = 5)
      .select($"contained_id", $"container_id").as[(Long, Long)]
      .collect().toSet
    // doc1 ⊂ doc0 and doc1 ⊂ doc3; doc0 ⊂ doc3 (prefix); doc2 nowhere.
    assert(got == Set((1L, 0L), (1L, 3L), (0L, 3L)))
    // symmetric jaccard on the (1,0) pair is dilute — below 1/2 — which
    // is exactly why the directional operator exists
    val j = Dedup.sortedNeighborhood(d.filter($"doc_id".isin(0L, 1L)),
      "doc_id", "text", lit("x"), window = 2, thrNum = 1, thrDen = 2).count()
    assert(j == 0L)
    // blocking valve: with every shingle above the df cap nothing pairs
    val boiler = Seq.tabulate(12)(i => (i.toLong, "same exact boiler text"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(boiler, "doc_id", "text",
      n = 3, dfCap = 10).count() == 0L)
  }
}
