package graft

import graft.operators.{AsOfJoin, Multimodal, SkewJoin, VectorStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 operator additions: as-of join, salted skew join, multimodal
  * binary plumbing, typed Aggregator, IVF ANN. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AsOfJoin.backward attaches the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "ltag")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (2L, 9L, "r@9"))
      .toDF("k", "t", "rtag")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("rtag"))
      .select($"ltag", $"rtag_asof").as[(String, String)].collect().toMap
    // equal timestamps match (backward, inclusive); later right rows don't
    assert(out("l1") == "r@10")
    assert(out("l2") == "r@15")
    assert(out("l3") == null) // right row at t=9 is after left t=5
  }

  test("AsOfJoin.backward: right rows with null payload still match (struct carrier)") {
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 10L, Option.empty[String]), (1L, 5L, Some("early")))
      .toDF("k", "t", "p")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("p"))
      .select($"p_asof").as[Option[String]].head()
    assert(out.isEmpty) // the t=10 null-payload row wins, not the t=5 one
  }

  test("SkewJoin.salted equals the plain inner join (incl. duplicate keys)") {
    val fact = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "fv")
    val dim = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "dv")
    val plain = fact.join(dim, "k").select("k", "fv", "dv")
      .collect().map(_.toSeq).sortBy(_.mkString)
    val salted = SkewJoin.salted(fact, dim, "k", salts = 4).select("k", "fv", "dv")
      .collect().map(_.toSeq).sortBy(_.mkString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("Multimodal.withMeta decodes deterministically through batched mapPartitions") {
    val df = Seq((1L, "abc"), (2L, ""), (3L, "0123456789" * 40)).toDF("id", "s")
      .select($"id", $"s".cast("binary").as("blob"))
    val out = Multimodal.withMeta(df, "blob", batchSize = 2)
      .select($"id", $"media_meta.n_bytes", $"media_meta.width", $"media_meta.height")
      .as[(Long, Long, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 3L, 323, 243)))
    assert(out(1) == ((2L, 0L, 320, 240)))
    assert(out(2) == ((3L, 400L, 320 + 400 % 320, 240 + 400 % 240)))
  }

  test("VectorStats.perDimMinMax matches a posexplode aggregation") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val agg = VectorStats.perDimMinMax(emb, "label", "embedding", 64)
    val ref = emb
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(min("v").as("min_val"), max("v").as("max_val"))
    assert(agg.count() == ref.count())
    val joined = agg.join(ref.withColumnRenamed("min_val", "rmin")
        .withColumnRenamed("max_val", "rmax").withColumn("pos", col("pos").cast("long")),
      Seq("label", "pos"))
    assert(joined.filter(col("min_val") =!= col("rmin") ||
      col("max_val") =!= col("rmax")).count() == 0)
  }

  test("Ids.contiguous assigns 0..n-1 in order across many partitions") {
    val df = spark.range(0, 5000).select(
        (col("id") * 2654435761L % 9973).as("key"), col("id").as("orig"))
      .repartition(16)
    val out = graft.operators.Ids.contiguous(df, Seq(col("key"), col("orig")), "seq")
      .select($"key", $"orig", $"seq").as[(Long, Long, Long)].collect()
    assert(out.length == 5000)
    assert(out.map(_._3).sorted.toSeq == (0L until 5000L))
    // id order == (key, orig) order
    val byId = out.sortBy(_._3).map(r => (r._1, r._2))
    assert(byId.toSeq == out.map(r => (r._1, r._2)).sortBy(identity).toSeq)
  }

  test("Multimodal.sampleFrames: n frames, bytes partition the blob exactly") {
    val df = Seq((1L, "0123456789abc"), (2L, "xy")).toDF("id", "s")
      .select($"id", $"s".cast("binary").as("blob"))
    val frames = df.select($"id",
        posexplode(Multimodal.sampleFrames($"blob", 4)).as(Seq("idx", "frame")))
      .select($"id", $"idx", length($"frame").cast("long").as("fl"))
      .as[(Long, Int, Long)].collect()
    assert(frames.count(_._1 == 1L) == 4)
    assert(frames.filter(_._1 == 1L).map(_._3).sum == 13)
    assert(frames.filter(_._1 == 2L).map(_._3).sum == 2)
  }

  test("Multimodal: REAL image decode via javax.imageio — header, stats, pipeline") {
    // header-only path: format + dims, no full decode
    val png = Multimodal.syntheticPng(37, 23, 200, 100, 50)
    assert(Multimodal.imageHeader(png).contains(("png", 37, 23)))
    // other JDK writers roundtrip too (bmp/gif lossless for solid fills)
    val img = new java.awt.image.BufferedImage(9, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 9, 7, Array.fill(63)(0x102030), 0, 9)
    for (fmt <- Seq("bmp", "gif", "jpg")) {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      val hdr = Multimodal.imageHeader(out.toByteArray)
      assert(hdr.map(h => (h._2, h._3)).contains((9, 7)), s"$fmt dims")
    }
    // garbage bytes: None, not a throw
    assert(Multimodal.imageHeader("not an image at all".getBytes).isEmpty)
    // full-decode stats through the batched mapPartitions pipeline:
    // solid fills decode to exactly the fill color (PNG is lossless)
    val df = Seq(
        (1L, Multimodal.syntheticPng(48, 32, 10, 20, 30)),
        (2L, Multimodal.syntheticPng(64, 40, 250, 0, 128)),
        (3L, "garbage".getBytes),
        (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "blob")
    val stats = Multimodal.withImageStats(df, "blob", batchSize = 2)
      .select($"id", $"image_stats").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(stats(1L).map(s => (s.getString(0), s.getInt(1), s.getInt(2),
      s.getInt(3), s.getInt(4), s.getInt(5))).contains(("png", 48, 32, 10, 20, 30)))
    assert(stats(2L).map(s => (s.getInt(3), s.getInt(4), s.getInt(5)))
      .contains((250, 0, 128)))
    assert(stats(3L).isEmpty && stats(4L).isEmpty) // undecodable -> null struct
  }

  test("Multimodal: REAL resize + perceptual dHash over decoded pixels") {
    // resize: dims change, solid color survives bilinear exactly
    val big = Multimodal.syntheticPng(100, 60, 40, 80, 120)
    val small = Multimodal.resizeImage(big, 25, 15).get
    assert(Multimodal.imageHeader(small).contains(("png", 25, 15)))
    val df = Seq((1L, big), (2L, "junk".getBytes)).toDF("id", "blob")
    val out = Multimodal.withImageStats(
        Multimodal.withResized(df, "blob", "small", 25, 15), "small")
      .select($"id", $"image_stats").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(out(1L).map(s => (s.getInt(1), s.getInt(2), s.getInt(3), s.getInt(4),
      s.getInt(5))).contains((25, 15, 40, 80, 120)))
    assert(out(2L).isEmpty) // undecodable -> null resized -> null stats
    // dHash: a structured image, a near-copy, and an unrelated image.
    // Deterministic block-average grid => identical images hash equal,
    // small perturbations move few bits, different structure moves many.
    def noisy(seed: Long, flip: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (graft.operators.Dedup.splitmix64(seed ^ (x / 8 * 31 + y / 8).toLong)
          >>> 56).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      for (i <- 0 until flip) // perturb a few pixels
        img.setRGB(i % 64, (i * 7) % 64, 0xFFFFFF)
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    val a = Multimodal.dHash(noisy(1L, 0)).get
    val aCopy = Multimodal.dHash(noisy(1L, 0)).get
    val aNear = Multimodal.dHash(noisy(1L, 12)).get
    val other = Multimodal.dHash(noisy(99L, 0)).get
    assert(a == aCopy)
    assert(java.lang.Long.bitCount(a ^ aNear) <= 8, "near-copy should be close")
    assert(java.lang.Long.bitCount(a ^ other) >= 12, "unrelated should be far")
    assert(Multimodal.dHash("nope".getBytes).isEmpty)
    // column form: nullable long through a DataFrame
    val hashed = df.select($"id", Multimodal.dHashCol($"blob").as("h")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashed(1L).isDefined && hashed(2L).isEmpty)
  }

  test("Multimodal.gridFeatures: real pooled-pixel vectors feed the embedding operators") {
    // solid fill: every cell is exactly the normalized fill color
    val solid = Multimodal.syntheticPng(32, 32, 255, 0, 128)
    val f = Multimodal.gridFeatures(solid, grid = 2).get
    assert(f.length == 12)
    (0 until 4).foreach { c =>
      assert(f(3 * c) == 1.0f && f(3 * c + 1) == 0.0f)
      assert(math.abs(f(3 * c + 2) - 128 / 255.0f) < 1e-6)
    }
    // a left-red/right-blue image separates in the grid layout
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xFF0000 else 0x0000FF)
    val o = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", o)
    val g = Multimodal.gridFeatures(o.toByteArray, grid = 2).get
    assert(g(0) == 1.0f && g(2) == 0.0f) // top-left cell: red
    assert(g(3) == 0.0f && g(5) == 1.0f) // top-right cell: blue
    assert(Multimodal.gridFeatures("junk".getBytes).isEmpty)
    // column form composes with cosine ANN: identical images at
    // cosine 1, the red/blue image measurably apart from solid red
    val df = Seq((1L, solid), (2L, solid), (3L, o.toByteArray)).toDF("id", "blob")
    val feats = df.select($"id", Multimodal.gridFeaturesCol($"blob", 2).as("f"))
    val top = graft.operators.Ann.bruteForceTopK(
      feats, "f", "id", Multimodal.gridFeatures(solid, 2).get, 3)
    val ranked = top.select($"id", $"score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ranked.take(2).map(_._1).toSet == Set(1L, 2L))
    assert(math.abs(ranked(0)._2 - 1.0) < 1e-6 && ranked(2)._2 < 0.999)
  }

  test("Multimodal: REAL WAV parse — RIFF chunk walk, extra chunks, malformed input") {
    val wav = Multimodal.syntheticWav(8000, 2, 441, seed = 7L)
    assert(Multimodal.wavHeader(wav).contains(
      Multimodal.AudioMeta("wav", 8000, 2, 16, 441L)))
    // an extra LIST chunk between fmt and data must be skipped, and an
    // odd-sized chunk is word-aligned (+1 pad byte)
    val base = Multimodal.syntheticWav(44100, 1, 10, seed = 1L)
    val listBody = "INFOx".getBytes("US-ASCII") // odd size 5 -> padded
    val bb = java.nio.ByteBuffer
      .allocate(base.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 36) // RIFF..WAVE + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody).put(0.toByte)
    bb.put(base, 36, base.length - 36) // data chunk
    assert(Multimodal.wavHeader(bb.array()).contains(
      Multimodal.AudioMeta("wav", 44100, 1, 16, 10L)))
    // malformed inputs: None, never a throw
    assert(Multimodal.wavHeader("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.wavHeader(Array.fill[Byte](100)(0x55)).isEmpty)
    assert(Multimodal.wavHeader(wav.take(30)).isEmpty) // truncated before data
    // data chunk claiming more bytes than exist: frame count clamps to
    // the bytes actually present
    val lying = wav.clone()
    lying(42) = 0x7F.toByte; lying(43) = 0x7F.toByte // data size field
    val clamped = Multimodal.wavHeader(lying)
    assert(clamped.exists(_.nFrames == 441L))
    // pipeline: audio_meta struct, null for non-WAV
    val df = Seq((1L, wav), (2L, "nope".getBytes)).toDF("id", "blob")
    val metas = Multimodal.withAudioMeta(df, "blob")
      .select($"id", $"audio_meta").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(metas(1L).map(s => (s.getInt(1), s.getInt(2), s.getLong(4)))
      .contains((8000, 2, 441L)))
    assert(metas(2L).isEmpty)
  }

  test("Multimodal.pcmStats: integer-exact energy/peak/zero-crossings over real PCM") {
    // hand-built WAV with known samples: 100, -200, 300, 0, -5
    val samples = Seq[Short](100, -200, 300, 0, -5)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val wav = bb.array()
    // sumSq = 100^2+200^2+300^2+0+5^2 = 140025; peak = 300;
    // crossings: 100->-200, -200->300, 0->-5 (0 counts as non-negative)
    assert(Multimodal.pcmStats(wav).contains((140025L, 300, 3L)))
    // ramp generator parses back with consistent closed-form stats
    val ramp = Multimodal.rampWav(8000, 1, 512) // one full period
    val (sumSq, peak, cross) = Multimodal.pcmStats(ramp).get
    val ref = (0 until 512).map(i => ((i % 512) - 256) * 64)
    assert(sumSq == ref.map(v => v.toLong * v).sum)
    assert(peak == ref.map(math.abs).max)
    assert(cross == ref.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    // non-PCM16 and garbage -> None
    assert(Multimodal.pcmStats("junk".getBytes).isEmpty)
    // pipeline: audio_stats struct, null for undecodable
    val df = Seq((1L, wav), (2L, "nope".getBytes)).toDF("id", "blob")
    val stats = Multimodal.withAudioStats(df, "blob")
      .select($"id", $"audio_stats").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(stats(1L).map(s => (s.getLong(0), s.getInt(1), s.getLong(2)))
      .contains((140025L, 300, 3L)))
    assert(stats(2L).isEmpty)
  }

  test("Multimodal.features: deterministic fixed-width vectors") {
    val df = Seq((1L, "hello"), (2L, "")).toDF("id", "s")
      .select($"id", $"s".cast("binary").as("blob"))
    val out = df.select($"id", Multimodal.features($"blob", dim = 16).as("f"))
      .as[(Long, Array[Float])].collect().toMap
    assert(out(1L).length == 16 && out(2L).length == 16)
    val again = df.select($"id", Multimodal.features($"blob", dim = 16).as("f"))
      .as[(Long, Array[Float])].collect().toMap
    assert(out(1L).toSeq == again(1L).toSeq)
    assert(out(2L).forall(_ == 0.0f))
  }

  test("VectorIndex time travel: scanAt reads older committed snapshots") {
    val spark2 = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    val idx = graft.operators.VectorIndex.ensure(spark2, s"$dir/idx", 2)
    def rec(id: String, v: Seq[Float]) = Seq((id, v)).toDF("id", "values")
      .select($"id", $"values".cast("array<float>"),
        struct(lit(0).as("chunk_index"), lit("t").as("source")).as("metadata"))
    idx.upsert(rec("a", Seq(1f, 0f)))
    idx.upsert(rec("a", Seq(0f, 1f))) // overwrite same id -> new snapshot
    assert(idx.snapshots().size == 2)
    val v0 = idx.scanAt(idx.snapshots().head)
      .select($"values").as[Array[Float]].head()
    val cur = idx.scan().select($"values").as[Array[Float]].head()
    assert(v0.toSeq == Seq(1f, 0f) && cur.toSeq == Seq(0f, 1f))
    intercept[IllegalArgumentException](idx.scanAt(99L))
  }

  test("Graph.connectedComponents == driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // both paths must agree with the reference: the driver union-find
      // fast path (default limit) and the distributed loop (limit=0)
      val gotDriver = graft.operators.Graph.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      val gotDist = graft.operators.Graph.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst", smallGraphLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(gotDriver == gotDist, s"trial $trial: driver vs distributed")
      val got = gotDriver
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      touched.foreach { node =>
        // expected component = min node in the union-find class among touched nodes
        val cls = touched.filter(m => find(m.toInt) == find(node.toInt))
        assert(got(node) == cls.min, s"trial $trial node $node")
      }
    }
  }

  test("Graph.connectedComponents handles a path much longer than the round cap") {
    // 120-node path: plain hash-min needs 120 rounds; pointer jumping
    // converges within the 50-round cap (O(log n))
    val edges = (0L until 119L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = graft.operators.Graph
      .connectedComponents(edges, "src", "dst", smallGraphLimit = 0)
      .as[(Long, Long)].collect()
    assert(comp.length == 120)
    assert(comp.forall(_._2 == 0L))
  }

  test("Graph.triangleCount: closed forms and brute force agree") {
    def count(edges: Seq[(Long, Long)]): (Long, Long) =
      graft.operators.Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].head()
    // K4: C(4,3)=4 triangles, 6 edges; dup/reversed/self edges collapse
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L; if a != b) yield (a, b)
    assert(count(k4 ++ Seq((2L, 2L), (1L, 0L))) == ((6L, 4L)))
    // path and star: zero triangles
    assert(count((0L until 9L).map(i => (i, i + 1)))._2 == 0L)
    assert(count((1L to 50L).map(i => (0L, i)))._2 == 0L)
    // hub + rim (wheel W8): rim closes 8 triangles through the hub —
    // the skewed-degree shape the orientation exists for
    val wheel = (1L to 8L).map(i => (0L, i)) ++
      (1L to 8L).map(i => (i, if (i == 8L) 1L else i + 1))
    assert(count(wheel) == ((16L, 8L)))
    // random graph vs brute force
    val rnd = new scala.util.Random(7)
    val re = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val adj = re.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val nodes = adj.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = (for {
      i <- nodes; j <- nodes if j > i && adj((i, j))
      k <- nodes if k > j && adj((i, k)) && adj((j, k))
    } yield 1).size.toLong
    assert(count(re)._2 == brute)
    // both closure modes agree: broadcast adjacency-intersection
    // (default) vs the distributed wedge-join path (limit 0)
    val viaWedges = graft.operators.Graph.triangleCount(
      re.toDF("src", "dst"), "src", "dst", broadcastCloseLimit = 0L)
      .as[(Long, Long)].head()
    assert(viaWedges._2 == brute && viaWedges._1 == count(re)._1)
  }

  /** Exact-integer reference replica of Graph.pageRank's trajectory —
    * the spec-side "second engine" (the graded q133 uses DuckDB). */
  private def pageRankRef(edges: Seq[(Long, Long)], iterations: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val n = nodes.length.toLong
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val base = (15L * scale) / (100L * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iterations) {
      val dangling = nodes.filterNot(outdeg.contains).map(r).sum
      val share = (85L * dangling) / (100L * n)
      val in = e.groupBy(_._2).map { case (t, es) =>
        t -> es.map { case (s, _) => (85L * r(s)) / (100L * outdeg(s)) }.sum
      }
      r = nodes.map(v => v -> (base + share + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("Graph.pageRank: closed forms — cycle symmetry, star, dangling mass") {
    def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
      graft.operators.Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = iters).as[(Long, Long)].collect().toMap
    // 2-cycle: perfect symmetry, ranks equal, sum ~ scale (floor loss < iters)
    val cyc = run(Seq((1L, 2L), (2L, 1L)), 4)
    assert(cyc(1L) == cyc(2L))
    assert(math.abs(cyc.values.sum - 1000000000000L) < 100L)
    // leaves -> center star: center dominates; center is DANGLING, so
    // its mass redistributes and the total stays ~ scale instead of
    // draining to the base term
    val star = run((1L to 8L).map(i => (i, 0L)), 5)
    assert(star(0L) > star(1L) * 3)
    assert((1L to 8L).forall(i => star(i) == star(1L)))
    assert(math.abs(star.values.sum - 1000000000000L) < 1000L)
    // exact trajectory equality with the reference replica
    assert(run(Seq((1L, 2L), (2L, 1L)), 4) == pageRankRef(Seq((1L, 2L), (2L, 1L)), 4))
    assert(star == pageRankRef((1L to 8L).map(i => (i, 0L)), 5))
  }

  test("Graph.pageRank: random directed graph matches the exact-integer reference") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    for (iters <- Seq(1, 3, 5)) {
      val got = graft.operators.Graph.pageRank(edges.toDF("src", "dst"),
        "src", "dst", iterations = iters).as[(Long, Long)].collect().toMap
      assert(got == pageRankRef(edges, iters), s"iters=$iters")
    }
    // duplicate and null edges: dups collapse, nulls drop
    val withJunk = edges ++ edges.take(50)
    val got = graft.operators.Graph.pageRank(withJunk.toDF("src", "dst"),
      "src", "dst", iterations = 2).as[(Long, Long)].collect().toMap
    assert(got == pageRankRef(edges, 2))
  }

  test("Graph.labelPropagation: dense communities resist a bridge; deterministic") {
    // two triangles joined by one bridge edge: CC would merge them,
    // LPA keeps them separate (the bridge node is outvoted)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = graft.operators.Graph.labelPropagation(edges, "src", "dst",
        rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // bounded-round determinism: same input, same rounds, same labels
    val again = graft.operators.Graph.labelPropagation(edges, "src", "dst",
        rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(again == out)
  }

  test("Graph.labelPropagation: one round is the exact neighbor-mode with min tie-break") {
    // star 10-(1,2,3): round 1 — center adopts min leaf (1), leaves
    // adopt the center's label (10); exact synchronous semantics
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val r1 = graft.operators.Graph.labelPropagation(star, "src", "dst", 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(10L -> 1L, 1L -> 10L, 2L -> 10L, 3L -> 10L))
  }

  test("Graph.kCore: closed forms, cascade peeling, bounded-round semantics") {
    def run(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 50) = {
      val (df, conv) = graft.operators.Graph.kCore(
        edges.toDF("src", "dst"), "src", "dst", k, maxRounds)
      (df.as[(Long, Long)].collect().toMap, conv)
    }
    // K5: 4-core is everything (deg 4), 5-core empty
    val k5 = for (a <- 0L to 4L; b <- 0L to 4L; if a < b) yield (a, b)
    val (c4, conv4) = run(k5, 4)
    assert(conv4 && c4 == (0L to 4L).map(_ -> 4L).toMap)
    val (c5, conv5) = run(k5, 5)
    assert(conv5 && c5.isEmpty)
    // triangle with a 3-node tail: the 2-core is exactly the triangle,
    // reached by CASCADE (tail peels one node per round)
    val triTail = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 5L))
    val (core2, convT) = run(triTail, 2)
    assert(convT && core2 == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // bounded rounds: after ONE round only node 5 (deg 1) is gone and 4
    // became degree-1 but survives the snapshot — deterministic
    // not-yet-converged state, exactly what an R-round oracle states
    val (partial, convP) = run(triTail, 2, maxRounds = 1)
    assert(!convP && partial.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(partial(3L) == 2L && partial(4L) == 1L, s"got $partial")
    // random graph vs reference peel
    val rnd = new scala.util.Random(13)
    val re = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    def ref(k: Int): Map[Long, Long] = {
      val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
      re.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, collection.mutable.Set.empty) += a
      }
      var alive = adj.keySet.toSet
      var changed = true
      while (changed) {
        val drop = alive.filter(n => adj(n).count(alive) < k)
        changed = drop.nonEmpty
        alive --= drop
      }
      alive.map(n => n -> adj(n).count(alive).toLong).toMap
    }
    for (k <- Seq(2, 5, 8)) {
      val (got, conv) = run(re, k)
      assert(conv && got == ref(k), s"k=$k")
    }
  }

  test("Ann.buildIvf/queryIvf: probing all cells reproduces exact top-k") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter($"vec_id" === 3).select($"embedding").as[Array[Float]].head()
    val exact = graft.operators.Ann.bruteForceTopK(emb, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val idx = graft.operators.Ann.buildIvf(emb, "embedding", k = 8)
    val all = graft.operators.Ann.queryIvf(idx, "embedding", "vec_id", q, 5, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(all == exact)
    // cells partition the data
    assert(idx.data.count() == emb.count())
    assert(idx.centroids.length == 8)
  }

  test("Packing.packGreedy: next-fit recurrence, shard resets, oversize items") {
    val items = Seq(
      // shard 0: 100+100 fit (pack 0), 80 overflows -> pack 1, 300 oversize -> pack 2, 10 -> pack 3
      (0, 1L, 100), (0, 2L, 100), (0, 3L, 80), (0, 4L, 300), (0, 5L, 10),
      // shard 1 restarts at pack 0 even though shard 0 ended mid-pack
      (1, 1L, 256), (1, 2L, 1)
    ).toDF("shard", "key", "tok")
    val got = graft.operators.Packing.packGreedy(items, "shard", "key", "tok", budget = 256)
      .as[(Int, Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0, 1L, 100, 0L), (0, 2L, 100, 0L), (0, 3L, 80, 1L), (0, 4L, 300, 2L), (0, 5L, 10, 3L),
      (1, 1L, 256, 0L), (1, 2L, 1L.toInt, 1L)))
    // every pack except possibly a shard's last is either <= budget or a
    // single oversize item — invariant over a larger random-ish input
    val big = (0 until 500).map(i => (i % 7, i.toLong, 1 + (i * 37) % 400))
      .toDF("shard", "key", "tok")
    val packed = graft.operators.Packing.packGreedy(big, "shard", "key", "tok", budget = 512)
    val fills = packed.groupBy($"shard", $"pack")
      .agg(sum($"tok").as("fill"), count(lit(1)).as("n"), max($"tok").as("mx"))
      .as[(Int, Long, Long, Long, Int)].collect()
    assert(fills.forall { case (_, _, fill, n, mx) => fill <= 512 || (n == 1 && mx > 512) })
    assert(packed.count() == 500)
  }

  test("Packing.packGreedy: null token/shard fails with a named-column error, not an NPE") {
    val items = Seq((0, 1L, Some(100)), (0, 2L, None)).toDF("shard", "key", "tok")
    val thrown = intercept[Throwable] {
      graft.operators.Packing.packGreedy(items, "shard", "key", "tok", budget = 256).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val msgs = chain(thrown).map(t => Option(t.getMessage).getOrElse(""))
    assert(msgs.exists(_.contains("packGreedy: null tok")),
      s"expected a named-column error, got: ${msgs.mkString(" | ")}")
    assert(!chain(thrown).exists(_.isInstanceOf[NullPointerException]))
  }

  test("Sampling: deterministic, monotone in rate, and rate-proportional") {
    val ids = (0L until 2000L).toDF("id").withColumn("half", lit(5))
      .withColumn("fifth", lit(2))
    val half = graft.operators.Sampling
      .mixtureSampleFraction(ids, "id", "half", 10L).select("id").as[Long].collect().toSet
    val halfAgain = graft.operators.Sampling
      .mixtureSampleFraction(ids, "id", "half", 10L).select("id").as[Long].collect().toSet
    assert(half == halfAgain, "sampling must be deterministic across runs")
    val fifth = graft.operators.Sampling
      .mixtureSampleFraction(ids, "id", "fifth", 10L).select("id").as[Long].collect().toSet
    assert(fifth.subsetOf(half), "lower rate keeps a subset (monotone threshold)")
    assert(math.abs(half.size - 1000) < 100 && math.abs(fifth.size - 400) < 100,
      s"rates roughly honored: got ${half.size}/2000 at 0.5, ${fifth.size}/2000 at 0.2")
  }

  test("HLL sketches: merge-of-halves equals sketch-of-whole; parquet round-trip stable") {
    val ids = (0L until 5000L).toDF("id")
      .withColumn("g", (col("id") % 4).cast("int"))
      .withColumn("v", concat(lit("val-"), col("id") % 1300))
    val whole = ids.groupBy($"g")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v))").as("est"))
      .as[(Int, Long)].collect().toMap
    val halves = Seq(ids.filter($"id" % 2 === 0), ids.filter($"id" % 2 === 1))
      .map(_.groupBy($"g").agg(expr("hll_sketch_agg(v)").as("sk")))
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    halves.head.write.parquet(dir + "/a") // sketches survive storage
    val merged = spark.read.parquet(dir + "/a").unionByName(halves(1))
      .groupBy($"g").agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[(Int, Long)].collect().toMap
    // HLL union is exact over the register lattice: merging per-batch
    // sketches gives the SAME estimate as sketching everything at once
    assert(merged == whole)
    // and the estimate obeys the accuracy contract vs true distincts
    val exact = ids.groupBy($"g").agg(countDistinct($"v").as("d"))
      .as[(Int, Long)].collect().toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(merged(g) - d) <= d * 0.05, s"g=$g est=${merged(g)} exact=$d")
    }
  }

  test("Sampling.stratifiedTopN: exact counts, hash-order membership, WindowGroupLimit") {
    // three strata of very different sizes, incl. one under n
    val rows = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "mid")) ++
      (2000L until 2005L).map(i => (i, "tiny"))).toDF("id", "stratum")
    val got = graft.operators.Sampling
      .stratifiedTopN(rows, Seq("stratum"), "id", n = 25)
    val byStratum = got.select($"stratum", $"pos", $"id")
      .as[(String, Int, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    assert(byStratum("big").size == 25 && byStratum("mid").size == 25)
    assert(byStratum("tiny").size == 5, "undersized stratum keeps all rows")
    // membership + order = the n smallest by (knuth hash, id) — the
    // same ranking any engine replays
    def rank(ids: Seq[Long], n: Int): Seq[Long] =
      ids.sortBy(i => (((i * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L, i)).take(n)
    assert(byStratum("big") == rank(0L until 900L, 25))
    assert(byStratum("mid") == rank(1000L until 1100L, 25))
    assert(byStratum("tiny") == rank(2000L until 2005L, 25))
    // deterministic across partitionings
    val re = graft.operators.Sampling
      .stratifiedTopN(rows.repartition(13), Seq("stratum"), "id", n = 25)
      .select($"stratum", $"pos", $"id").as[(String, Int, Long)].collect().toSet
    assert(re == got.select($"stratum", $"pos", $"id")
      .as[(String, Int, Long)].collect().toSet)
    // partial top-n runs below the exchange
    val phys = got.queryExecution.executedPlan.toString
    assert(phys.contains("WindowGroupLimit"), phys.take(2000))
  }

  test("Sampling.tokenBudgetSample: greedy fill in hash order, budget prefix-monotone") {
    val rows = ((0L until 200L).map(i => (i, "web", 100L)) ++
      (1000L until 1040L).map(i => (i, "code", 250L)) ++
      (2000L until 2010L).map(i => (i, "books", 50L))).toDF("id", "src", "tok")
    def run(b: Map[String, Long]): Map[String, Seq[Long]] =
      graft.operators.Sampling.tokenBudgetSample(rows, "src", "id", "tok", b)
        .select($"src", $"id").as[(String, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
    val b1 = Map("web" -> 1000L, "code" -> 1999L)
    val got = run(b1)
    // budgets met with at most one crossing doc of overshoot
    assert(got("web").size == 10)   // 10 x 100 == budget exactly
    assert(got("code").size == 8)   // 7 x 250 = 1750 < 1999 -> 8th crosses
    assert(!got.contains("books"), "groups absent from the recipe drop")
    // membership is the hash-order prefix any engine replays
    def hashOrder(ids: Seq[Long]): Seq[Long] =
      ids.sortBy(i => (((i * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L, i))
    assert(got("web").sorted == hashOrder(0L until 200L).take(10).sorted)
    // a raised budget keeps the previous sample as a PREFIX
    val got2 = run(Map("web" -> 2500L, "code" -> 1999L))
    assert(got("web").toSet.subsetOf(got2("web").toSet))
    assert(got2("web").size == 25)
    // a group with fewer tokens than its budget keeps everything
    assert(run(Map("books" -> 100000L))("books").size == 10)
    // deterministic across partitionings
    assert(run(b1) == {
      val re = graft.operators.Sampling.tokenBudgetSample(
        rows.repartition(7), "src", "id", "tok", b1)
      re.select($"src", $"id").as[(String, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
    })
  }

  test("FrequentItems: exact under capacity, bounds hold, sidecars merge, NFN covers truth") {
    import graft.operators.FrequentItems
    // skewed stream: item frequencies 1..60 over two groups
    val rows = (1 to 60).flatMap(f => (0 until f).map(c => (s"item$f", "g" + (f % 2))))
      .toDF("v", "g")
    val exact = rows.groupBy($"g", $"v").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(t => t._2 -> t._3).toMap }
    // two disjoint batch sidecars persist, then merge == whole
    val dir = java.nio.file.Files.createTempDirectory("graft_freq").toString
    FrequentItems.sketch(rows.filter($"v" <= "item3"), "g", "v")
      .write.parquet(dir + "/b0")
    FrequentItems.sketch(rows.filter($"v" > "item3"), "g", "v")
      .write.parquet(dir + "/b1")
    val merged = FrequentItems.merge(spark.read.parquet(dir + "/b*"), "g")
      .as[(String, Array[Byte])].collect().toMap
    merged.foreach { case (g, bytes) =>
      // 60 distinct items << 0.75 * 1024 -> the sketch is EXACT
      assert(FrequentItems.maxError(bytes) == 0L, s"group $g not exact")
      val items = FrequentItems.items(bytes, noFalseNegatives = true)
      assert(items.map(t => t._1 -> t._2).toMap == exact(g))
      // published bound shape: estimate within [lb, ub]
      items.foreach { case (_, est, lb, ub) => assert(lb <= est && est <= ub) }
      assert(FrequentItems.streamLength(bytes) == exact(g).values.sum)
    }
    // approximation regime: tiny map, heavy hitter must survive with
    // its bounds containing the true count
    val skew = ((0 until 5000).map(_ => "hot") ++
      (0 until 2000).map(i => s"cold$i")).toDF("v").withColumn("g", lit("x"))
    val sk = FrequentItems.sketch(skew, "g", "v", maxMapSize = 64)
      .as[(String, Array[Byte])].collect().head._2
    val hot = FrequentItems.items(sk, noFalseNegatives = false)
      .find(_._1 == "hot")
    assert(hot.isDefined, "the dominant item must be provably frequent")
    assert(hot.get._3 <= 5000L && 5000L <= hot.get._4,
      s"true count outside [lb, ub]: $hot")
  }
  test("per-group quality quantile keeps each group's top-q tail, boundary inclusive") {
    import graft.operators.Sampling
    // group a: scores 1..8 (q=0.25 -> pr >= 0.75 -> top 3 of 8: ranks 6,7,8
    // since percent_rank at rank 6 of 8 = 5/7 < 0.75; rank 7 = 6/7 >= .75)
    val df = ((1 to 8).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("b", 10L + i, 100.0 * i))).toDF("g", "id", "score")
    val kept = Sampling.topQuantilePerGroup(df, "g", col("score"), "id", 0.25)
      .select($"id").as[Long].collect().toSet
    // a: pr = (rank-1)/7 >= 0.75 -> rank >= 6.25 -> ranks 7,8 -> ids 7,8
    // b: pr = (rank-1)/3 >= 0.75 -> rank >= 3.25 -> rank 4 -> id 14
    assert(kept == Set(7L, 8L, 14L))
    // ties resolved by the id tiebreak deterministically
    val tied = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
      ("a", 4L, 9.0)).toDF("g", "id", "score")
    val k2 = Sampling.topQuantilePerGroup(tied, "g", col("score"), "id", 0.5)
      .select($"id").as[Long].collect().toSet
    // ascending (score, id): ranks 1,2,3,4 -> pr 0,1/3,2/3,1 -> keep pr>=0.5
    assert(k2 == Set(3L, 4L))
    // q = 1 keeps everything including single-row groups
    assert(Sampling.topQuantilePerGroup(df, "g", col("score"), "id", 1.0)
      .count() == 12L)
  }
  test("weighted sampling (A-ES): deterministic, weight-proportional, zero weights excluded") {
    import graft.operators.Sampling
    val df = ((1L to 50L).map(i => (i, 100.0)) ++
      (51L to 100L).map(i => (i, 1.0)) ++
      Seq((101L, 0.0), (102L, -3.0))).toDF("id", "w")
    val pick = Sampling.weightedTopN(df, "id", col("w"), 20)
      .select($"id").as[Long].collect().toSet
    assert(pick.size == 20)
    assert(!pick.contains(101L) && !pick.contains(102L))
    // weight 100 vs 1: the heavy class dominates the seeded draw
    val heavy = pick.count(_ <= 50L)
    assert(heavy >= 16, s"heavy-weight rows under-selected: $heavy/20")
    // bit-identical across partitionings (pure function of id, w)
    val again = Sampling.weightedTopN(df.repartition(17), "id", col("w"), 20)
      .select($"id").as[Long].collect().toSet
    assert(again == pick)
    // n beyond the eligible population returns all positive-weight rows
    assert(Sampling.weightedTopN(df, "id", col("w"), 500).count() == 100L)
  }

  test("cms join-size estimate: one-sided bound holds, sketches merge cell-exactly") {
    import graft.operators.JoinEstimate
    val rnd = new scala.util.Random(3)
    // zipfish key multiplicities on both sides
    val a = (1 to 3000).map(_ => (rnd.nextInt(rnd.nextInt(49) + 1) + 1).toLong)
      .toDF("k")
    val b = (1 to 2000).map(_ => (rnd.nextInt(rnd.nextInt(29) + 1) + 1).toLong)
      .toDF("k")
    val exact = a.groupBy($"k").count().withColumnRenamed("count", "na")
      .join(b.groupBy($"k").count().withColumnRenamed("count", "nb"), "k")
      .agg(sum($"na" * $"nb")).head().getLong(0)
    val (w, d) = (1024, 5)
    val ca = JoinEstimate.cmsTable(a, "k", w, d).localCheckpoint(true)
    val cb = JoinEstimate.cmsTable(b, "k", w, d).localCheckpoint(true)
    val est = JoinEstimate.estimateJoinSize(ca, cb)
    val bound = JoinEstimate.errorBound(ca, cb, w, d)
    assert(est >= exact, s"CMS must never under-estimate: $est < $exact")
    assert(est <= exact + bound, s"$est > $exact + $bound")
    // two half-sketches merge to EXACTLY the whole sketch (cells add)
    val a1 = JoinEstimate.cmsTable(a.limit(1500), "k", w, d)
    val a2 = JoinEstimate.cmsTable(a.exceptAll(a.limit(1500)), "k", w, d)
    val merged = JoinEstimate.mergeTables(a1, a2)
      .select($"d", $"b", $"cnt").as[(Int, Int, Long)].collect().toSet
    val whole = ca.select($"d", $"b", $"cnt").as[(Int, Int, Long)]
      .collect().toSet
    assert(merged == whole)
    // disjoint key spaces: estimate stays inside the collision bound
    val c = (1 to 2000).map(i => (1000000L + i)).toDF("k")
    val estDisjoint = JoinEstimate.estimateJoinSize(ca,
      JoinEstimate.cmsTable(c, "k", w, d))
    assert(estDisjoint >= 0L && estDisjoint <= bound)
    // NULL-from-empty vs NULL-from-overflow (crafted cells): zero
    // overlapping cells is 0; a decimal(38,0) per-depth sum that
    // overflows must clamp to Long.MaxValue, never read as 0
    val big = Long.MaxValue / 2 // product ~2.1e37 per cell, 5 cells > 1e38
    val left = (0 until 5).map(i => (0, i, big)).toDF("d", "b", "cnt")
    val right = (0 until 5).map(i => (0, i, big)).toDF("d", "b", "cnt")
    assert(JoinEstimate.estimateJoinSize(left, right) == Long.MaxValue)
    val shifted = (0 until 5).map(i => (0, i + 100, big)).toDF("d", "b", "cnt")
    assert(JoinEstimate.estimateJoinSize(left, shifted) == 0L)
  }
  test("Graph.mergeComponents: incremental == full CC under random splits, merges, and new nodes") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(11)
    // random graph over 300 nodes, split into old/new edge batches
    val all = (1 to 500).map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    for (splitAt <- Seq(50, 250, 450)) {
      val (oldE, newE) = all.splitAt(splitAt)
      val labels = Graph.connectedComponents(oldE.toDF("src", "dst"), "src", "dst")
      val inc = Graph.mergeComponents(labels, newE.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toSet
      val full = Graph.connectedComponents(all.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toSet
      assert(inc == full, s"incremental != full at split $splitAt")
    }
    // a batch whose edges run THROUGH brand-new nodes must still merge
    // the old components they bridge (old comps {1,2} and {3,4};
    // new node 999 bridges them transitively)
    val lab2 = Graph.connectedComponents(
      Seq((1L, 2L), (3L, 4L)).toDF("src", "dst"), "src", "dst")
    val bridged = Graph.mergeComponents(lab2,
        Seq((2L, 999L), (999L, 4L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(bridged == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 999L -> 1L))
    // same-component batch edge is a no-op; disjoint new pair appends
    val same = Graph.mergeComponents(lab2,
        Seq((1L, 2L), (700L, 701L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(same == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      700L -> 700L, 701L -> 700L))
  }
  test("privacy: RFC 4231 HMAC vectors; tokens stable and key-separated; k-anonymity audit + generalization") {
    import graft.operators.Privacy
    // RFC 4231 test case 2: key "Jefe", data "what do ya want for nothing?"
    assert(Privacy.hmacSha256("Jefe".getBytes, "what do ya want for nothing?".getBytes)
      .map("%02x".format(_)).mkString ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    // RFC 4231 test case 1: 20 x 0x0b key, data "Hi There"
    assert(Privacy.hmacSha256(Array.fill[Byte](20)(0x0b), "Hi There".getBytes)
      .map("%02x".format(_)).mkString ==
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
    val df = Seq((1L, "alice"), (2L, "bob"), (3L, "alice")).toDF("id", "name")
    def col3(c: org.apache.spark.sql.Column) =
      df.select($"id", c.as("t")).as[(Long, String)].collect().toMap
    for (tok <- Seq(Privacy.tokenizePortable($"name", "k1"),
        Privacy.tokenizeHmac($"name", "k1"))) {
      val m = col3(tok)
      assert(m(1L) == m(3L), "same value must map to the same token")
      assert(m(1L) != m(2L))
      assert(m(1L).length == 64 && m(1L).matches("[0-9a-f]{64}"))
    }
    // key rotation unlinks the token spaces
    assert(col3(Privacy.tokenizePortable($"name", "k1"))(1L) !=
      col3(Privacy.tokenizePortable($"name", "k2"))(1L))
    assert(col3(Privacy.tokenizeHmac($"name", "k1"))(1L) !=
      col3(Privacy.tokenizeHmac($"name", "k2"))(1L))
    // k-anonymity: (dept, age-bucket) groups under k flag; widening
    // the generalization makes the audit pass
    val people = Seq(("eng", 23L), ("eng", 27L), ("eng", 41L),
      ("ops", 33L), ("ops", 34L), ("ops", 35L)).toDF("dept", "age")
    val narrow = Privacy.kAnonymityAudit(people,
      Seq($"dept", Privacy.generalize($"age", 10L)), Seq("dept", "age_r"), 3L)
    // eng: 20-30 has 2 (<3), 40-50 has 1; ops: 30-40 has 3 (passes)
    assert(narrow.select($"dept", $"age_r", $"n")
      .as[(String, String, Long)].collect().toSet ==
      Set(("eng", "20-30", 2L), ("eng", "40-50", 1L)))
    val wide = Privacy.kAnonymityAudit(people,
      Seq($"dept", Privacy.generalize($"age", 100L)), Seq("dept", "age_r"), 3L)
    assert(wide.count() == 0L, "coarser generalization certifies")
  }
  test("dataCard: exact censuses, dup rate via distinct texts, rank median incl. even groups") {
    import graft.operators.DataProfile
    val rows = Seq(
      (1L, "s1", "a b c", "en"), (2L, "s1", "a b c", "en"), // exact dup
      (3L, "s1", "x y", "de"), (4L, "s1", "p q r s t", "en"),
      (5L, "s2", "one", "en"), (6L, "s2", "two three", "en"))
      .toDF("doc_id", "source", "text", "lang")
    val card = DataProfile.dataCard(rows, "source", "doc_id", "text", "lang")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    // s1: docs 4, distinct 3, tokens 3+3+2+5=13, langs 2, min 2, max 5,
    // median = 2nd smallest of (3,3,2,5 sorted: 2,3,3,5) = 3
    assert(card("s1") == (("s1", 4L, 3L, 13L, 2L, 2L, 5L, 3L)), card("s1"))
    // s2 (even n=2): median = 1st smallest = 1
    assert(card("s2") == (("s2", 2L, 2L, 3L, 1L, 1L, 2L, 1L)), card("s2"))
  }

  test("epochOrder: a true permutation per epoch, epochs differ, deterministic") {
    import graft.operators.Denoising
    val docs = (0L until 200L).toDF("id")
    def pos(e: Int) = Denoising.epochOrder(docs, "id", e)
      .as[(Long, Long)].collect().toMap
    val p1 = pos(1)
    assert(p1.values.toSeq.sorted == (0L until 200L), "not a permutation")
    assert(pos(1) == p1, "must be deterministic")
    val p2 = pos(2)
    assert(p2.values.toSeq.sorted == (0L until 200L))
    assert(p1 != p2, "epochs must reshuffle")
    // the permutation genuinely scrambles (not a shift): many fixed
    // points or a constant offset would both fail this
    val moved = (0L until 200L).count(i => p1(i) != i)
    assert(moved > 150, s"epoch 1 barely shuffles: $moved moved")
    intercept[IllegalArgumentException] {
      Denoising.epochOrder(docs, "id", -1)
    }
  }

  test("leakSafeSplit: identical texts share a split, bands roughly proportional, bad bands refuse") {
    import graft.operators.Splits
    val rows = (0 until 300).map { i =>
      (i.toLong, s"text-${i % 120}") // 120 groups, most duplicated
    }.toDF("doc_id", "text")
    val out = Splits.leakSafeSplit(rows, "doc_id", "text",
        Seq(("train", 80), ("val", 90), ("test", 100)))
      .as[(Long, String, String)].collect()
    // every content group maps to exactly one split — the guard
    val perGroup = out.groupBy(_._2).map { case (_, g) =>
      g.map(_._3).distinct.size }
    assert(perGroup.forall(_ == 1), "a duplicate group straddled splits")
    // deterministic; proportions loosely match the bands
    val byS = out.groupBy(_._3).map { case (s, g) => s -> g.size }
    assert(byS("train") > 150 && byS.getOrElse("val", 0) > 0 &&
      byS.getOrElse("test", 0) > 0, s"split mix off: $byS")
    intercept[IllegalArgumentException] {
      Splits.leakSafeSplit(rows, "doc_id", "text", Seq(("a", 50)))
    }
    intercept[IllegalArgumentException] {
      Splits.leakSafeSplit(rows, "doc_id", "text",
        Seq(("a", 90), ("b", 80), ("c", 100)))
    }
  }

  test("fim psm: segments partition the stream exactly, cuts in range, degenerate docs pass through") {
    import graft.operators.Denoising
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val out = Denoising.fimPsm(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
    val orig = docs.as[(Long, String)].collect().toMap.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val psmRe = """<PRE> (.*) <SUF> (.*) <MID> (.*)""".r
    out.foreach { case (id, n, lo, hi, psm) =>
      val o = orig(id)
      assert(n == o.length)
      psm match {
        case psmRe(p, sfx, m) =>
          def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
          // prefix ++ middle ++ suffix rebuilds the original stream
          assert(toks(p) ++ toks(m) ++ toks(sfx) == o,
            s"doc $id does not partition: $psm")
          if (n >= 2) {
            assert(lo >= 1 && lo <= hi && hi <= n - 1, s"doc $id cuts $lo/$hi")
            assert(toks(p).size == lo && toks(m).size == hi - lo)
          } else assert(lo == 0 && hi == 0 && toks(m).isEmpty && toks(sfx).isEmpty)
        case _ => fail(s"doc $id psm shape: $psm")
      }
    }
    // the middle is genuinely exercised: some docs have nonempty middles
    assert(out.count(t => t._4 > t._3) > out.length / 4)
  }

  test("span corruption: inputs+targets reconstruct every original stream; sentinels ordered; rate plausible") {
    import graft.operators.Denoising
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text")
    val out = Denoising.spanCorruption(docs, "doc_id", "text")
      .as[(Long, Long, Long, String, String)].collect()
    val orig = docs.as[(Long, String)].collect().toMap.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val sentRe = "<extra_id_(\\d+)>".r
    var maskedTotal = 0L
    var tokTotal = 0L
    out.foreach { case (id, nTok, nSpan, inputs, targets) =>
      val o = orig(id)
      assert(nTok == o.length, s"doc $id token count")
      // targets parse into k -> span tokens
      val ms = sentRe.findAllMatchIn(targets).toSeq
      assert(ms.size == nSpan, s"doc $id: ${ms.size} sentinels vs $nSpan spans")
      assert(ms.map(_.group(1).toInt) == (0 until nSpan.toInt), s"doc $id order")
      val spans: Map[Int, Seq[String]] = ms.zipWithIndex.map { case (m, i) =>
        val end = if (i + 1 < ms.size) ms(i + 1).start else targets.length
        m.group(1).toInt -> targets.substring(m.end, end).trim
          .split(" ").filter(_.nonEmpty).toSeq
      }.toMap
      spans.values.foreach(s => assert(s.nonEmpty && s.size <= 2,
        s"doc $id span length ${s.size}"))
      // splice the targets back into the inputs: must equal the original
      val rebuilt = (if (inputs.isEmpty) Seq.empty[String]
        else inputs.split(" ").toSeq).flatMap {
        case sentRe(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      assert(rebuilt == o, s"doc $id does not reconstruct")
      maskedTotal += spans.values.map(_.size).sum
      tokTotal += nTok
    }
    // ~2 masked tokens per hit at rate 1/20 => ~10% masked, loosely
    val frac = maskedTotal.toDouble / tokTotal
    assert(frac > 0.02 && frac < 0.25, s"masked fraction off: $frac")
  }

  test("keySkew: exact stats, integer-arithmetic thresholds, heavy keys, salt factor") {
    import graft.operators.DataProfile
    val rows = (Seq.fill(90)("hot") ++ Seq.fill(8)("warm") ++
      Seq("a", "b")).zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "k")
    val r = DataProfile.keySkew(rows, "k", topK = 2, targetRowsPerKey = 30L)
      .as[(String, String, Long)].collect().toSet
    assert(r == Set(
      ("stat", "n_rows", 100L), ("stat", "n_keys", 4L),
      ("stat", "max_count", 90L),
      ("stat", "keys_over_2x", 1L),   // hot: 90*4 > 2*100
      ("stat", "keys_over_10x", 0L),  // hot: 90*4 < 10*100
      ("stat", "salt_factor", 3L),    // ceil(90/30)
      ("top", "hot", 90L), ("top", "warm", 8L)), s"got $r")
    intercept[IllegalArgumentException] {
      DataProfile.keySkew(rows, "k", 0, 10L)
    }
  }

  test("release manifest: round-trip validates, order-independent fingerprint, nulls canonical, tamper detected") {
    import graft.operators.Release
    val dir = java.nio.file.Files.createTempDirectory("graft_rel").toString
    val tbl = Seq((1L, "a"), (2L, null: String), (3L, "c"))
      .toDF("id", "s")
    Release.publish(spark, dir, Seq(("t1", tbl, Seq("id", "s"))))
    val v = Release.validate(spark, dir)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(v.map(_._1) == Seq("t1") && v.head._6, s"clean validate: $v")
    // fingerprint is row-order/partitioning independent and mergeable
    val fp1 = Release.fingerprint(tbl, Seq("id", "s")).head().getLong(1)
    val fp2 = Release.fingerprint(tbl.repartition(7).sortWithinPartitions($"s"),
      Seq("id", "s")).head().getLong(1)
    assert(fp1 == fp2, "layout must not move the fingerprint")
    // null vs the literal string behind the sentinel do differ
    val tblLit = Seq((1L, "a"), (2L, "null"), (3L, "c")).toDF("id", "s")
    assert(Release.fingerprint(tblLit, Seq("id", "s")).head().getLong(1) != fp1)
    // tamper: overwrite the table with one row changed -> ok = false
    Seq((1L, "a"), (2L, null: String), (3L, "X")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$dir/t1")
    val v2 = Release.validate(spark, dir)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(!v2.head._6, s"tamper must fail validation: $v2")
  }

  test("late interaction: maxsim equals a scala brute force, candidate-restricted, oov query terms drop") {
    import graft.operators.LateInteraction
    val docs = Seq(
      (1L, "vector join hash vector index"),
      (2L, "hash hash join tables"),
      (3L, "join the vector space search"),
      (4L, "nothing relevant at all"),
      (5L, "stream vector hash join"))
      .toDF("doc_id", "text")
    val cands = Seq(1L, 2L, 3L, 5L).toDF("doc")
    val terms = Seq("vector", "hash", "zzz_not_in_vocab")
    val got = LateInteraction.maxSimRerank(docs, "doc_id", "text", cands,
        terms, dim = 8, seed = 31L, k = 10)
      .as[(Long, Double)].collect().toSeq
    // brute force with the identical arithmetic
    def comp(r: Long, k: Long): Double =
      (((((r * 1000003L + k * 999983L + 31L) % 2147483648L) * 2654435761L)
        % 4294967296L) % 2001L - 1000L).toDouble / 1000.0
    val corpus = Map(
      1L -> "vector join hash vector index", 2L -> "hash hash join tables",
      3L -> "join the vector space search", 4L -> "nothing relevant at all",
      5L -> "stream vector hash join")
    val vocab = corpus.values.flatMap(_.split(" ")).toSeq.distinct.sorted
      .zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
    def dot(rq: Long, rd: Long): Double =
      (0L until 8L).foldLeft(0.0)((a, k) => a + comp(rq, k) * comp(rd, k))
    val expect = Seq(1L, 2L, 3L, 5L).map { id =>
      val dranks = corpus(id).split(" ").distinct.map(vocab)
      // oov term has no vocab rank -> contributes nothing, like the join
      id -> Seq("vector", "hash").foldLeft(0.0) { (acc, q) =>
        acc + dranks.map(rd => dot(vocab(q), rd)).max
      }
    }.sortBy { case (id, s) => (-s, id) }
    assert(got == expect, s"got $got expected $expect")
    // doc 4 excluded by the candidate set even though it has tokens
    assert(!got.exists(_._1 == 4L))
    // MODEL-BACKED seam (r18): the same MaxSim plan with token vectors
    // from an Embedder-shaped checkpoint double (opaque weights blob,
    // @transient lazy session) — batched mapPartitions scoring must
    // equal a direct driver-side brute force with the same model
    val model = new LinearBlobEmbedder(LinearBlobEmbedder.blob(8, seed = 7L), 8)
    def mdot(a: Array[Float], b: Array[Float]): Double =
      a.iterator.zip(b.iterator).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def bruteM(qterms: Seq[String]) = Seq(1L, 2L, 3L, 5L).map { id =>
      val dvs = corpus(id).split(" ").distinct.toSeq.map(t => model.embed(Seq(t)).head)
      id -> qterms.foldLeft(0.0) { (acc, q) =>
        val qv = model.embed(Seq(q)).head
        acc + dvs.map(dv => mdot(qv, dv)).max
      }
    }.sortBy { case (id, s) => (-s, id) }
    val gotM = LateInteraction.maxSimRerankModel(docs, "doc_id", "text",
        cands, Seq("vector", "hash"), model, k = 10, batchSize = 2)
      .as[(Long, Double)].collect().toSeq
    assert(gotM == bruteM(Seq("vector", "hash")),
      s"model seam: batched must equal direct scoring, got $gotM")
    // a model embeds ANY token: an OOV query term still contributes its
    // max dot (the checkpoint semantics), unlike the vocab-rank default
    val gotOov = LateInteraction.maxSimRerankModel(docs, "doc_id", "text",
        cands, Seq("vector", "hash", "zzz_not_in_vocab"), model, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(gotOov == bruteM(Seq("vector", "hash", "zzz_not_in_vocab")),
      s"oov term must score through the model, got $gotOov")
  }

  test("temperatureMix: small sources upweighted, alpha=1 is natural mix, budget raise keeps subset, deterministic") {
    import graft.operators.Sampling
    val rows = ((0 until 800).map(i => (i.toLong, "big")) ++
      (800 until 850).map(i => (i.toLong, "small")))
      .toDF("id", "g")
    def ids(target: Long, alpha: Double = 0.5) =
      Sampling.temperatureMix(rows, "g", "id", target, alpha)
        .as[(Long, String)].collect().toSeq.sorted
    val s200 = ids(200)
    val byG = s200.groupBy(_._2).view.mapValues(_.size).toMap
    // alpha=0.5: small's share of the mix far exceeds its 1/17 natural
    // share (sqrt(50)/(sqrt(800)+sqrt(50)) ~ 0.20)
    assert(byG("small").toDouble / s200.size > 0.10,
      s"small source not upweighted: $byG")
    // rates bound at 1.0: tiny groups can never oversample
    assert(byG("small") <= 50)
    // determinism + subset-on-raise (hash predicate monotone in rate)
    assert(ids(200) == s200)
    val s400 = ids(400)
    assert(s200.toSet.subsetOf(s400.toSet),
      "raising the budget must keep earlier samples")
    // alpha=1 reproduces the natural proportional mix: per-group rates
    // equalize (target/total for every group)
    val nat = ids(170, alpha = 1.0)
    val natG = nat.groupBy(_._2).view.mapValues(_.size).toMap
    val bigRate = natG("big").toDouble / 800
    val smallRate = natG.getOrElse("small", 0).toDouble / 50
    assert(math.abs(bigRate - smallRate) < 0.12,
      s"alpha=1 must sample every group at the same rate: $natG")
    intercept[IllegalArgumentException] { ids(0) }
    intercept[IllegalArgumentException] { ids(10, alpha = 1.5) }
  }

  test("contrastive: cropping halves exactly, negatives never self, deterministic, in-corpus") {
    import graft.operators.Contrastive
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon"), // 5 toks -> 3 | 2
      (20L, "one two three four"),             // 4 -> 2 | 2
      (30L, "single"),                         // dropped
      (40L, "a b"), (50L, "x y z"), (60L, "p q r s"))
      .toDF("doc_id", "text")
    val pairs = Contrastive.croppedPairs(docs, "doc_id", "text")
    val m = pairs.as[(Long, String, String, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(!m.contains(30L), "sub-2-token docs cannot form two views")
    assert(m(10L) == ((10L, "alpha beta gamma", "delta epsilon", 3L, 2L)))
    assert(m(20L) == ((20L, "one two", "three four", 2L, 2L)))
    assert(m(40L) == ((40L, "a", "b", 1L, 1L)))
    val negs = Contrastive.negativeSample(pairs, k = 3, seed = 5L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(negs.size == 5 * 3, s"3 negatives per surviving doc: $negs")
    assert(negs.forall { case (id, _, neg) => neg != id },
      "a negative must never be the anchor itself")
    val corpusIds = m.keySet
    assert(negs.forall { case (_, _, neg) => corpusIds.contains(neg) })
    assert(negs == Contrastive.negativeSample(pairs, 3, 5L)
      .as[(Long, Long, Long)].collect().toSeq.sorted, "must be deterministic")
    assert(negs != Contrastive.negativeSample(pairs, 3, 6L)
      .as[(Long, Long, Long)].collect().toSeq.sorted, "seed must matter")
    intercept[IllegalArgumentException] {
      Contrastive.negativeSample(pairs.limit(1), 2, 1L)
    }
  }

  test("groupOls: exact line recovered, noisy slope correct, degenerate x yields nulls") {
    import graft.operators.DataProfile
    val pts = Seq(
      ("lin", 0L, "1.00"), ("lin", 1L, "3.00"), ("lin", 2L, "5.00"),
      ("lin", 3L, "7.00"),                       // y = 1 + 2x exactly
      ("noisy", 0L, "0.00"), ("noisy", 1L, "2.00"), ("noisy", 2L, "2.00"),
      ("flat", 5L, "9.00"), ("flat", 5L, "11.00")) // all x equal
      .toDF("g", "x", "ys")
      .select($"g", $"x", $"ys".cast("decimal(18,2)").as("y"))
    val r = DataProfile.groupOls(pts, Seq("g"), $"x", $"y")
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("lin") == ((4L, Some(2.0), Some(1.0))))
    // noisy: n=3, sx=3, sxx=5, sy=4, sxy=6 -> slope=(18-12)/(15-9)=1,
    // intercept=(4-3)/3
    assert(r("noisy")._2 == Some(1.0) &&
      r("noisy")._3 == Some((4.0 - 3.0) / 3.0))
    assert(r("flat") == ((2L, None, None)), "degenerate x must yield nulls")
  }

  test("random projection: one-hot exactness, JL distance preservation, seed sensitivity, balanced signs") {
    import graft.operators.RandomProjection
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select($"vec_id", $"embedding").localCheckpoint(true)
    def proj(seed: Long) = emb
      .select($"vec_id",
        RandomProjection.project($"embedding", 64, 16, seed).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val p7 = proj(7L)
    assert(p7.values.forall(_.size == 16))
    assert(proj(7L) == p7, "must be bit-deterministic")
    assert(proj(8L) != p7, "seed must matter")
    // one-hot input: output j is exactly ±1/4 (sign of matrix cell)
    val oneHot = Seq((0L, Array.fill(64)(0f).updated(3, 1f).toSeq))
      .toDF("vec_id", "embedding")
    val oh = oneHot.select(
      RandomProjection.project($"embedding", 64, 16, 7L)).as[Seq[Double]].head()
    assert(oh.forall(v => v == 0.25 || v == -0.25), s"one-hot gave $oh")
    // signs are roughly balanced across the 64x16 matrix
    val pos = oh.count(_ > 0) // 16 cells of row 3; widen with more rows
    val ohAll = (0 until 64).map { r =>
      Seq((0L, Array.fill(64)(0f).updated(r, 1f).toSeq))
        .toDF("vec_id", "embedding")
        .select(RandomProjection.project($"embedding", 64, 16, 7L))
        .as[Seq[Double]].head().count(_ > 0)
    }.sum
    assert(ohAll > 1024 * 0.38 && ohAll < 1024 * 0.62,
      s"sign imbalance: $ohAll/1024 positive")
    // JL: squared-distance ratios concentrate around 1 for real pairs
    val ids = p7.keys.toSeq.sorted.take(21)
    val orig = emb.as[(Long, Seq[Float])].collect().toMap
    val ratios = ids.sliding(2).collect { case Seq(a, b) =>
      val d0 = orig(a).zip(orig(b)).map { case (x, y) =>
        (x - y).toDouble * (x - y) }.sum
      val d1 = p7(a).zip(p7(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      d1 / d0
    }.toSeq
    // per-pair ratios are heavy-tailed at k=16 on these structured
    // synthetic vectors (sparse difference vectors blow up the cross
    // terms); the testable JL claims are positivity, boundedness, and
    // mean concentration near 1
    assert(ratios.forall(r => r > 0.02 && r < 8.0),
      s"distance distortion out of range: $ratios")
    assert(ratios.sum / ratios.size > 0.5 && ratios.sum / ratios.size < 2.0,
      s"mean ratio off: ${ratios.sum / ratios.size}")
    intercept[IllegalArgumentException] {
      RandomProjection.project($"embedding", 64, 0, 1L)
    }
  }

  test("dp counts: derandomized Laplace noise, suppression, per-group independence, exact epsilon scaling") {
    import graft.operators.Privacy
    val rows = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(12)("c") ++
      Seq.fill(3)("tiny")).zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "g")
    def rel(eps: Double) = Privacy.dpCounts(rows, Seq("g"), eps,
        seed = "s1", minCount = 5L)
      .as[(String, Double)].collect().toMap
    val r = rel(0.5)
    // suppression: the size-3 group never appears in the release
    assert(r.keySet == Set("a", "b", "c"))
    // determinism: identical rerun, bit-for-bit
    assert(rel(0.5) == r)
    // noise is bounded-plausible Laplace(b=2): nonzero, not absurd
    val noises = Map("a" -> (r("a") - 40.0), "b" -> (r("b") - 25.0),
      "c" -> (r("c") - 12.0))
    noises.values.foreach(n =>
      assert(n != 0.0 && math.abs(n) < 40.0, s"implausible noise $n"))
    // independent draws per group
    assert(noises.values.toSet.size == 3)
    // a different seed redraws the noise
    assert(Privacy.dpCounts(rows, Seq("g"), 0.5, seed = "s2", minCount = 5L)
      .as[(String, Double)].collect().toMap != r)
    // epsilon scales the SAME draw proportionally: noise(eps=1) * 2 ==
    // noise(eps=0.5) (to rounding — the noise is recovered by
    // subtracting n from the released sum, which costs a few ulps)
    val r1 = rel(1.0)
    assert(math.abs((r1("a") - 40.0) * 2.0 - noises("a")) < 1e-9,
      s"${(r1("a") - 40.0) * 2.0} vs ${noises("a")}")
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(rows, Seq("g"), 0.0, "s")
    }
  }

  test("zstd dict compression: lossless round-trip, dict beats raw on small docs, deterministic") {
    import graft.operators.DictCompress
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select($"doc_id", $"text").localCheckpoint(true)
    val dict = DictCompress.trainDict(docs, "text", dictKb = 16, sampleRows = 200)
    assert(dict.length > 1024, s"dict too small: ${dict.length}")
    val rt = docs
      .withColumn("z", DictCompress.compressCol($"text", dict))
      .withColumn("raw", DictCompress.compressRawCol($"text"))
      .withColumn("back", DictCompress.decompressCol($"z", dict))
    val agg = rt.agg(
      sum(when($"back" === $"text", 0L).otherwise(1L)).as("bad"),
      sum(length($"z").cast("long")).as("zb"),
      sum(length($"raw").cast("long")).as("rb"),
      sum(length($"text").cast("long")).as("tb")).head()
    assert(agg.getLong(0) == 0L, "round-trip must be lossless")
    val (zb, rb, tb) = (agg.getLong(1), agg.getLong(2), agg.getLong(3))
    assert(zb < rb, s"dict ($zb) must beat dictless ($rb) on small docs")
    assert(zb < tb, s"compressed ($zb) must beat plain ($tb)")
    // unicode + empty survive
    val edge = Seq((1L, "naïve – ünïcode ★"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val eb = edge.withColumn("z", DictCompress.compressCol($"text", dict))
      .withColumn("back", DictCompress.decompressCol($"z", dict))
      .select($"doc_id", $"back").as[(Long, String)].collect().toMap
    assert(eb(1L) == "naïve – ünïcode ★" && eb(2L) == "" && eb(3L) == null)
    // deterministic bytes across partitionings
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("z", DictCompress.compressCol($"text", dict))
      .select(sum(crc32($"z"))).head().getLong(0)
    assert(sig(docs) == sig(docs.repartition(13)))
  }

  test("rerank seam: batched mapPartitions scoring == direct scorer; top-k deterministic") {
    import graft.core.{Rerank, TokenOverlapReranker}
    val cands = Seq(
      (1L, "vector join hash"),        // exact overlap 3/ (3+3) -> F1 = 1
      (2L, "vector join hash extra"),  // 3 of 4
      (3L, "vector only here"),
      (4L, "nothing relevant"),
      (5L, "")                          // empty -> 0
    ).toDF("doc_id", "text")
    val r = new TokenOverlapReranker
    val got = Rerank.rerank(cands, "doc_id", "text", "vector join hash", r,
        k = 5, batchSize = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.head._2 == 1.0)
    assert(got(1)._2 == 2.0 * 3 / 7)
    assert(got(3)._2 == 0.0 && got(4)._2 == 0.0)
    // equal across batch sizes and partitionings (pure function)
    val again = Rerank.rerank(cands.repartition(7), "doc_id", "text",
      "vector join hash", r, k = 5, batchSize = 3).as[(Long, Double)].collect().toSeq
    assert(again == got)
  }
}
