package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()

  private def queryVec(id: Long): Array[Float] =
    emb.filter($"vec_id" === id).select($"embedding").as[Array[Float]].head()

  test("hammingTopK: TakeOrderedAndProject plan, matches brute-force order") {
    val sigs = spark.range(0, 2000).select($"id",
      udf((i: Long) => graft.operators.Dedup.splitmix64(i)).apply($"id").as("sig"))
      .cache()
    try {
      val q = graft.operators.Dedup.splitmix64(7L)
      val topk = Ann.hammingTopK(sigs, "sig", "id", q, k = 15)
      assert(topk.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
        "top-k must plan as per-partition heaps, not a global sort")
      val got = topk.select($"id", $"_dist").as[(Long, Int)].collect().toSeq
      val brute = sigs.as[(Long, Long)].collect()
        .map { case (id, s) => (id, java.lang.Long.bitCount(s ^ q)) }
        .sortBy(t => (t._2, t._1)).take(15).toSeq
      assert(got == brute)
      assert(got.head._1 == 7L && got.head._2 == 0) // self at distance 0
    } finally sigs.unpersist()
  }

  test("hammingWithin: pigeonhole prune is sound — equals the unpruned filter") {
    val sigs = spark.range(0, 4000).select($"id",
      udf((i: Long) => graft.operators.Dedup.splitmix64(i / 7)).apply($"id").as("sig"))
      .cache() // i/7 plants groups of identical sigs -> dist-0 clusters
    try {
      val q = graft.operators.Dedup.splitmix64(100L)
      for (d <- Seq(0, 3, 24, 31)) { // uneven 64/nb band widths included
        val pruned = Ann.hammingWithin(sigs, "sig", q, d)
          .select($"id").as[Long].collect().sorted.toSeq
        val plain = sigs.as[(Long, Long)].collect()
          .collect { case (id, s) if java.lang.Long.bitCount(s ^ q) <= d => id }
          .sorted.toSeq
        assert(pruned == plain, s"maxDist=$d")
        if (d >= 0) assert(plain.contains(700L)) // 700/7 = 100 -> dist 0
      }
    } finally sigs.unpersist()
  }

  test("cell-pruned serving query holds recall@10 >= 0.9 on planted clusters (adversarial for prefix cells)") {
    import graft.operators.VectorIndex
    // the adversarial regime for signature-PREFIX pruning: each query's
    // true neighbors are 15 near-copies at cosine ~0.99 of a planted
    // center, so they concentrate in very few cells — if the ring
    // expansion mis-sized or mis-ordered its neighborhoods, whole
    // clusters would vanish from the shortlist at once (q116's fixture
    // shape, driven through the snapshot index's pruned path)
    val perturb = udf { (v: Seq[Float], center: Long, copy: Int) =>
      val out = new Array[Float](v.length)
      var i = 0
      while (i < v.length) {
        val h = graft.operators.Dedup.splitmix64(
          center * 1315423911L + copy * 2654435761L + i)
        out(i) = v(i) +
          (((h >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 0.1).toFloat
        i += 1
      }
      out
    }
    val members = emb.filter($"vec_id" < 32)
      .select($"vec_id".as("_c"), $"embedding",
        explode(sequence(lit(0), lit(15))).as("_copy"))
      .select(($"_c" * 1000 + $"_copy").cast("long").as("vec_id"),
        perturb($"embedding", $"_c", $"_copy").as("embedding"))
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_cellclust").toString
    val dim = members.select(size($"embedding")).as[Int].head()
    // cells engaged at fixture scale: 4 prefix bits, cellMinRows=2
    // (the q123 sizing), over 512 clustered rows
    val idx = VectorIndex.ensure(spark, s"$dir/c", dim, numBuckets = 2,
      sigCellBits = 4, cellMinRows = 2)
    idx.upsert(members.select(
      $"vec_id".cast("string").as("id"),
      $"embedding".cast("array<float>").as("values"),
      struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata")))
    // 8 member queries (copy 0 of centers 0..7); recall vs the exact
    // query over the same index, pruning REQUIRED to engage each time
    val queryVecs = members.filter($"vec_id" % 1000 === 0 && $"vec_id" < 8000)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    var overlap = 0
    queryVecs.foreach { case (qid, qv) =>
      val exact = idx.query(qv, 10).select($"id").as[String].collect().toSet
      // shortlist 32: the 8x oversample targets 256 of the 512 rows,
      // so ring expansion must actually STOP early (64 would target the
      // whole index and degrade to approx-full by the exactness contract)
      val approx = idx.queryApprox(qv, 10, shortlist = 32)
        .select($"id").as[String].collect().toSeq
      assert(idx.lastApproxMode == "approx-pruned",
        s"pruning must engage for query $qid: ${idx.lastApproxMode}")
      assert(idx.lastProbeFiles < idx.lastManifestFiles,
        s"query $qid probed ${idx.lastProbeFiles}/${idx.lastManifestFiles}")
      assert(approx.head == qid.toString, s"self must be rank 1 for $qid")
      overlap += approx.count(exact)
    }
    assert(overlap >= 72, // recall@10 >= 0.9 over 8 queries
      s"clustered recall through the pruned path too low: $overlap/80")
  }

  test("binary-hash ANN: self found at rank 1, recall vs brute force holds") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
    try {
      val encoded = Ann.encodeBinary(emb, "embedding").cache()
      val queries = emb.filter($"vec_id" % 37 === 0)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().take(10)
      // shortlist sizing honesty: 64-bit signatures are coarse on the
      // near-isotropic fixtures (neighbors at cosine 0.24-0.43), so a
      // 12% shortlist lands ~0.58 mean recall; 25% is the regime where
      // the binary prefilter + exact rescore holds 0.6+ here (real
      // clustered corpora need far less)
      val recalls = queries.map { case (qid, q) =>
        val bin = Ann.queryBinary(encoded, "embedding", "vec_id", q, 10, shortlist = 125)
          .select($"vec_id").as[Long].collect().toSeq
        assert(bin.head == qid, "self must be rank 1 (hamming 0, cosine 1)")
        val bf = Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
          .select($"vec_id").as[Long].collect().toSet
        bin.count(bf) / 10.0
      }
      assert(recalls.sum / recalls.length >= 0.6,
        s"mean recall@10 too low: ${recalls.mkString(",")}")
      // signatures are deterministic and scale-invariant (sign bits)
      val sig1 = encoded.select($"vec_id", $"_bsig").as[(Long, Long)].collect().toMap
      val scaled = emb.withColumn("embedding",
        expr("transform(embedding, x -> x * CAST(3.0 AS FLOAT))"))
      val sig2 = Ann.encodeBinary(scaled, "embedding")
        .select($"vec_id", $"_bsig").as[(Long, Long)].collect().toMap
      assert(sig1 == sig2)
      encoded.unpersist()
    } finally emb.unpersist()
  }

  test("knnJoin: batch result equals per-query bruteForceTopK; WindowGroupLimit plan") {
    val queries = emb.filter($"vec_id" < 6)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val batch = Ann.knnJoin(queries, "qid", "qv", emb, "vec_id", "embedding", k = 7)
    val got = batch.select($"query_id", $"rank", $"id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    val want = (0L until 6L).flatMap { qid =>
      Ann.bruteForceTopK(emb, "embedding", "vec_id", queryVec(qid), 7)
        .select($"vec_id").as[Long].collect().toSeq.zipWithIndex
        .map { case (id, i) => (qid, i + 1, id) }
    }.sorted
    assert(got == want)
    // the per-query top-k filter plans as WindowGroupLimit: partial
    // top-k runs BEFORE the exchange, so the shuffle never carries the
    // scored cross product
    val phys = batch.queryExecution.executedPlan.toString
    assert(phys.contains("WindowGroupLimit"), phys.take(2000))
  }

  test("knnJoinBinary: full shortlist recovers knnJoin exactly; pruned holds recall") {
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val encoded = Ann.encodeBinary(emb, "embedding").cache()
    try {
      val n = emb.count().toInt
      val exact = Ann.knnJoin(queries, "qid", "qv", emb, "vec_id", "embedding", k = 10)
        .select($"query_id", $"rank", $"id").as[(Long, Int, Long)].collect().sorted.toSeq
      val full = Ann.knnJoinBinary(queries, "qid", "qv", encoded, "vec_id",
          "embedding", k = 10, shortlist = n)
        .select($"query_id", $"rank", $"id").as[(Long, Int, Long)].collect().sorted.toSeq
      assert(full == exact, "shortlist >= corpus must recover the exact join")
      // pruned shortlist (25%): recall@10 and self-at-rank-1 hold
      val pruned = Ann.knnJoinBinary(queries, "qid", "qv", encoded, "vec_id",
          "embedding", k = 10, shortlist = n / 4)
        .select($"query_id", $"rank", $"id").as[(Long, Int, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
      val exactSets = exact.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
      val recalls = pruned.map { case (q, ids) =>
        assert(ids.head == q, s"query $q: self must be rank 1")
        ids.count(exactSets(q)) / 10.0
      }
      assert(recalls.sum / recalls.size >= 0.6,
        s"mean recall@10 too low: ${recalls.mkString(",")}")
    } finally encoded.unpersist()
  }

  test("hammingJoin: banded equijoin equals brute-force pairs, no cartesian") {
    // quartets share a base sig, differing in the low 2 bits
    val sigs = spark.range(0, 800).select($"id",
      udf((i: Long) => graft.operators.Dedup.splitmix64(i / 4) ^ (i % 4))
        .apply($"id").as("sig")).cache()
    try {
      val joined = Ann.hammingJoin(sigs, "sig", "id", maxDist = 7)
      assert(!joined.queryExecution.executedPlan.toString.contains("Cartesian"),
        "hammingJoin must stay an equijoin")
      val got = joined.select($"id", $"id_b", $"_dist").as[(Long, Long, Int)]
        .collect().sortBy(t => (t._1, t._2)).toSeq
      val all = sigs.as[(Long, Long)].collect()
      val brute = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        d = java.lang.Long.bitCount(sa ^ sb) if d <= 7
      } yield (a, b, d)).sortBy(t => (t._1, t._2)).toSeq
      assert(got == brute)
      assert(got.size >= 200 * 6) // every quartet contributes its 6 pairs
      // cross-dataset variant: left half vs right half, same brute truth
      val l = sigs.filter($"id" < 400)
      val r = sigs.filter($"id" >= 400)
        .withColumnRenamed("id", "rid").withColumnRenamed("sig", "rsig")
      val crossGot = Ann.hammingJoinBetween(l, "sig", "id", r, "rsig", "rid", 7)
        .select($"id", $"rid").as[(Long, Long)].collect().sorted.toSeq
      val crossBrute = (for {
        (a, sa) <- all if a < 400; (b, sb) <- all if b >= 400
        if java.lang.Long.bitCount(sa ^ sb) <= 7
      } yield (a, b)).sorted.toSeq
      assert(crossGot == crossBrute)
    } finally sigs.unpersist()
  }

  test("persisted Hamming index: partition-pruned probe equals hammingWithin") {
    val sigs = spark.range(0, 800).select($"id",
      udf((i: Long) => graft.operators.Dedup.splitmix64(i / 4) ^ (i % 4))
        .apply($"id").as("sig")).cache()
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_hidx").toString + "/idx"
      Ann.writeHammingIndex(sigs, "sig", "id", tmp, maxDist = 3, buckets = 16)
      val q = graft.operators.Dedup.splitmix64(25L) // quartet ids 100..103
      val res = Ann.queryHammingIndex(spark, tmp, q, maxDist = 3, buckets = 16)
      // the probe must reach the scan as a PARTITION filter (pruning),
      // not just a data filter over a full scan
      val plan = res.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*_band".r.findFirstIn(plan).isDefined,
        s"band probe did not prune partitions:\n$plan")
      val got = res.select($"_hid").as[Long].collect().sorted.toSeq
      val want = Ann.hammingWithin(sigs, "sig", q, 3)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(got == want)
      assert(got.containsSlice(Seq(100L, 101L, 102L, 103L)))
    } finally sigs.unpersist()
  }

  test("index _META: probes resolve layout params; an explicit mismatch throws") {
    val sigs = spark.range(0, 200).select($"id",
      udf((i: Long) => graft.operators.Dedup.splitmix64(i / 4) ^ (i % 4))
        .apply($"id").as("sig"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hmeta").toString + "/idx"
    // NON-default layout: a probe that fell back to the defaults (8/64)
    // would prune the wrong directories and silently under-report
    Ann.writeHammingIndex(sigs, "sig", "id", tmp, maxDist = 3, buckets = 16)
    val q = graft.operators.Dedup.splitmix64(25L)
    val want = Ann.queryHammingIndex(spark, tmp, q, maxDist = 3, buckets = 16)
      .select($"_hid").as[Long].collect().sorted.toSeq
    assert(want.nonEmpty)
    // args omitted entirely: the written _META supplies maxDist/buckets
    val auto = Ann.queryHammingIndex(spark, tmp, q)
      .select($"_hid").as[Long].collect().sorted.toSeq
    assert(auto == want, "unspecified params must resolve from _META")
    // explicitly WRONG params fail fast instead of silently missing
    val e = intercept[IllegalArgumentException] {
      Ann.queryHammingIndex(spark, tmp, q, maxDist = 3, buckets = 64)
    }
    assert(e.getMessage.contains("layout mismatch"))
    intercept[IllegalArgumentException] {
      Ann.probeHammingIndex(spark, tmp,
        sigs.limit(5).toDF("qid", "sig"), "sig", "qid", maxDist = 7)
    }
    // append-with-ids side: same contract (resolution + fail-fast)
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_hmeta2").toString + "/idx"
    Ann.appendHammingIndexWithIds(sigs.limit(50).toDF("id", "sig"),
      "sig", "id", tmp2, maxDist = 2, buckets = 8)
    intercept[IllegalArgumentException] {
      Ann.appendHammingIndexWithIds(sigs.toDF("id", "sig"),
        "sig", "id", tmp2, maxDist = 4, buckets = 8)
    }
    intercept[IllegalArgumentException] {
      Ann.probeHammingIndexIds(spark, tmp2,
        sigs.limit(5).select($"id"), "id", buckets = 64)
    }
    // unspecified append continues the recorded layout; probes agree
    Ann.appendHammingIndexWithIds(
      sigs.filter($"id" >= 50 && $"id" < 60).toDF("id", "sig"), "sig", "id", tmp2)
    val ids = Ann.probeHammingIndexIds(spark, tmp2,
        spark.range(45, 55).select($"id"), "id")
      .as[Long].collect().sorted.toSeq
    assert(ids == (45L until 55L).toSeq,
      s"META-resolved probe must see both appends' ids: $ids")
    // MinHash twin: wrong-buckets probe throws, unspecified resolves
    val docs = Seq((1L, "aaa bbb ccc ddd"), (2L, "eee fff ggg hhh"))
      .toDF("doc_id", "text")
    val prep = graft.operators.Dedup.prepareMinhash(docs, "doc_id", "text")
    val tmp3 = java.nio.file.Files.createTempDirectory("graft_mmeta").toString + "/idx"
    graft.operators.MinhashIndex.append(prep, tmp3, buckets = 8)
    intercept[IllegalArgumentException] {
      graft.operators.MinhashIndex.probeIds(spark, tmp3,
        Seq(1L).toDF("_id"), buckets = 64)
    }
    val taken = graft.operators.MinhashIndex.probeIds(spark, tmp3,
      Seq(1L, 3L).toDF("_id")).as[Long].collect().toSeq
    assert(taken == Seq(1L))
  }

  test("persisted Hamming index: maxDist=0 with a negative signature still matches") {
    // with maxDist=0 the single band is the FULL 64-bit signature; a negative
    // value must bucket identically on the write (SQL pmod) and query
    // (floorMod) sides or the probe targets a nonexistent partition
    val negSig = -0x123456789abcdefL
    val sigs = Seq((1L, negSig), (2L, 42L), (3L, negSig ^ 1L)).toDF("id", "sig")
    val tmp = java.nio.file.Files.createTempDirectory("graft_hidx0").toString + "/idx"
    Ann.writeHammingIndex(sigs, "sig", "id", tmp, maxDist = 0, buckets = 16)
    val got = Ann.queryHammingIndex(spark, tmp, negSig, maxDist = 0, buckets = 16)
      .select($"_hid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L)) // exact match only; id 3 is at distance 1
  }

  test("brute-force top-k: self is rank 1, scores monotone") {
    val top = Ann.bruteForceTopK(emb, "embedding", "vec_id", queryVec(7), 10).collect()
    assert(top.head.getAs[Long]("vec_id") == 7L)
    val scores = top.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("lsh signatures are deterministic and scale-invariant") {
    val v = queryVec(3).map(_.toDouble)
    val s1 = Ann.signature(v, 16, 42L)
    val s2 = Ann.signature(v.map(_ * 2.5), 16, 42L)
    assert(s1 == s2)
  }

  test("banded lsh: recall@10 >= 0.7 over 20 queries on near-isotropic fixtures") {
    // fixtures are weakly clustered (top-10 neighbors at cosine 0.24-0.43),
    // the hard regime for LSH — r=4 x b=16 still holds useful recall
    val indexed = Ann.buildIndex(emb, "embedding").cache()
    val recalls = (0L until 20L).map { qid =>
      val q = queryVec(qid)
      val exact = Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val approx = Ann.queryIndex(indexed, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall $mean, per-query $recalls")
    indexed.unpersist()
  }

  test("PQ: ADC shortlist + exact rescore holds recall on a 20% shortlist") {
    val model = Ann.trainPq(emb, "embedding")
    val encoded = Ann.encodePq(emb, "embedding", model).cache()
    val recalls = (0L until 10L).map { qid =>
      val q = queryVec(qid)
      val exact = Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val pq = Ann.queryPq(encoded, "embedding", "vec_id", model, q, 10, shortlist = 100)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(pq).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall $mean, per-query $recalls")
    // codes really are m bytes (BINARY column)
    assert(encoded.select(length($"_pq")).as[Int].head() == model.m)
    encoded.unpersist()
  }

  test("SQ8: quantization error bounded by half a step; shortlist rescore matches exact") {
    val model = Ann.trainSq(emb, "embedding")
    val dim = model.mins.length
    assert(dim == emb.select(size($"embedding")).as[Int].head())
    // round-trip error per dimension <= step/2 (+ fp slack)
    val v = queryVec(5L).map(_.toDouble)
    val norm = math.sqrt(v.map(x => x * x).sum)
    val nv = v.map(_ / norm)
    val codes = Ann.sqEncode(v, model)
    (0 until dim).foreach { i =>
      val step = (model.maxs(i) - model.mins(i)) / 255.0
      val deq = model.mins(i) + (codes(i) & 0xFF) * step
      assert(math.abs(deq - nv(i)) <= step / 2 + 1e-12,
        s"dim $i: |$deq - ${nv(i)}| > ${step / 2}")
    }
    // scale invariance (normalized before encoding)
    assert(Ann.sqEncode(v.map(_ * 3.25), model).toSeq == codes.toSeq)
    // with a full-size shortlist the rescore IS the exact answer
    val encoded = Ann.encodeSq(emb, "embedding", model).cache()
    val n = emb.count().toInt
    val recalls = (0L until 10L).map { qid =>
      val q = queryVec(qid)
      val exact = Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val sq = Ann.querySq(encoded, "embedding", "vec_id", model, q, 10, shortlist = n)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(sq).size.toDouble / exact.size
    }
    assert(recalls.forall(_ == 1.0), s"full shortlist must be exact: $recalls")
    // and a 20% shortlist still holds high recall (tight quantization)
    val tight = (0L until 10L).map { qid =>
      val q = queryVec(qid)
      val exact = Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val sq = Ann.querySq(encoded, "embedding", "vec_id", model, q, 10, shortlist = n / 5)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(sq).size.toDouble / exact.size
    }
    val mean = tight.sum / tight.size
    assert(mean >= 0.9, s"SQ8 mean recall $mean, per-query $tight")
    encoded.unpersist()
  }

  test("matryoshka: full shortlist recovers brute force; prefix stage actually cuts; refusals") {
    val q = queryVec(3L)
    val n = emb.count().toInt
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").as[Long].collect().toSeq
    // shortlist >= corpus: the two-stage result IS the exact brute force
    val exact = ids(Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 10))
    assert(ids(Ann.matryoshkaTopK(emb, "embedding", "vec_id", q,
      prefixDim = 16, shortlist = n, k = 10)) == exact)
    // prefixDim = full dim: the shortlist stage ranks exactly like the
    // rescore, so ANY shortlist >= k recovers the exact answer
    assert(ids(Ann.matryoshkaTopK(emb, "embedding", "vec_id", q,
      prefixDim = q.length, shortlist = 10, k = 10)) == exact)
    // a genuine prefix at a modest shortlist keeps high recall on these
    // smooth synthetic embeddings, and the self-match always survives
    val pre = ids(Ann.matryoshkaTopK(emb, "embedding", "vec_id", q,
      prefixDim = 16, shortlist = 40, k = 10))
    assert(pre.contains(3L), "self-match must survive the prefix stage")
    assert(exact.toSet.intersect(pre.toSet).size >= 5,
      s"prefix recall collapsed: $pre vs $exact")
    intercept[IllegalArgumentException] {
      Ann.matryoshkaTopK(emb, "embedding", "vec_id", q, 0, 10, 5)
    }
    intercept[IllegalArgumentException] {
      Ann.matryoshkaTopK(emb, "embedding", "vec_id", q, 16, 5, 10)
    }
  }

  test("PQ encoding is deterministic and scale-invariant (normalized)") {
    val model = Ann.trainPq(emb, "embedding")
    val v = queryVec(3L).map(_.toDouble)
    val a = Ann.pqEncode(v, model)
    val b = Ann.pqEncode(v.map(_ * 7.5), model)
    assert(a.toSeq == b.toSeq, "PQ codes must be invariant to vector scale")
    assert(a.toSeq == Ann.pqEncode(v, model).toSeq)
  }

  test("banded lsh prunes: candidate set smaller than the table, self always found") {
    val indexed = Ann.buildIndex(emb, "embedding").cache()
    val counts = (0L until 10L).map { qid =>
      val q = queryVec(qid).map(_.toDouble)
      val buckets = Ann.bucketSet(q, 4, 16, 42L)
      val n = indexed.filter(arrays_overlap($"_buckets", lit(buckets))).count()
      // the query vector itself always collides (same buckets)
      val self = Ann.queryIndex(indexed, "embedding", "vec_id", queryVec(qid), 1)
        .select("vec_id").as[Long].head()
      assert(self == qid)
      n
    }
    val meanCand = counts.sum.toDouble / counts.size
    assert(meanCand < 450, s"mean candidates $meanCand of 500 — no pruning at all")
    indexed.unpersist()
  }

  test("explodeForLayout: one row per band, bucket ids band-disjoint") {
    val exploded = Ann.explodeForLayout(Ann.buildIndex(emb.limit(10), "embedding"))
    assert(exploded.count() == 160) // 10 rows x 16 bands
    val perBand = exploded.groupBy(($"_bucket" / 16).cast("int").as("band"))
      .count().count()
    assert(perBand == 16)
  }
}
