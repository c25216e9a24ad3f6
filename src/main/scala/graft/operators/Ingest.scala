package graft.operators

import graft.core.{Chunker, Embedder, HashingEmbedder, IngestError}
import graft.sources.TextExtractor
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ingestion pipeline, Spark-first (SURVEY.md §3.4):
  *
  *   scan -> extract text -> chunk (1->N) -> embed (batched) -> ids ->
  *   metadata -> dimension check -> vector records
  *
  * Reference flow: `/root/reference/streamlit_app.py:129-148`. Each
  * stage is a narrow transformation — the only shuffles are the
  * optional range-partition for reference-style global ids; in
  * `ScopedIds` mode (the 100 TB default) the whole pipeline is
  * shuffle-free and pipelined in one stage per input split.
  */
object Ingest {

  sealed trait IdMode
  /** `doc-{i}` with a single global enumeration — byte-compatible with
    * the reference (streamlit_app.py:102), including its id-collision-
    * across-runs upsert behavior. Costs a range shuffle. */
  case object ReferenceIds extends IdMode
  /** `doc-{docId}-{chunkIndex}` — collision-free, shuffle-free; the
    * sane default at scale (SURVEY.md §2.D D1 note). */
  case object ScopedIds extends IdMode

  final case class Config(
      chunkSize: Int = Chunker.DefaultChunkSize,
      chunkOverlap: Int = Chunker.DefaultChunkOverlap,
      separator: String = Chunker.DefaultSeparator,
      embedBatchSize: Int = 32, // mirrors sentence-transformers' default [dep]
      source: String = "uploaded_pdf", // streamlit_app.py:147
      idMode: IdMode = ScopedIds,
      expectedDim: Option[Int] = None)

  /** Read a directory of binary documents (op A1) and extract text (A2/A3).
    * Output: (doc_id string, text string). */
  def readBinaryDocs(
      spark: SparkSession,
      dir: String,
      extractor: TextExtractor,
      glob: String = "*.pdf"): DataFrame = {
    val extractUdf = udf((b: Array[Byte]) => extractor.extract(b))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path").as("doc_id"), extractUdf(col("content")).as("text"))
  }

  /** Read webdataset-style tar shards (op A1 at corpus scale): one row
    * per regular-file member. Shard-sized archives are the intended
    * unit — `binaryFile` loads a shard per task and the members stream
    * out of one sequential buffer, which is exactly why multimodal
    * corpora ship as tar shards instead of billions of tiny files.
    * Output: (shard string, member string, content binary). */
  def readTarMembers(spark: SparkSession, dir: String,
      glob: String = "*.tar"): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
    val schema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("member", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    raw.mapPartitions { it =>
      it.flatMap { r =>
        val path = r.getString(0)
        graft.sources.Tar.members(r.getAs[Array[Byte]](1))
          .map { case (name, bytes) => Row(path, name, bytes) }
      }
    }(enc)
  }

  /** Read WARC crawl shards (op A1 at web-corpus scale): one row per
    * record, gzip'd (whole-file or Common-Crawl per-record member) or
    * plain. The same shard-per-task sequential-read shape as
    * [[readTarMembers]]; header fields surface as columns so a
    * `warc_type = 'response'` filter prunes request/metadata records
    * before any payload work. Output: (shard string, warc_type,
    * target_uri, record_id, content_type string, content binary). */
  def readWarcRecords(spark: SparkSession, dir: String,
      glob: String = "*.warc*"): DataFrame =
    warcRecords(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir))

  /** Explode a (path, content)-shaped shard DataFrame into WARC record
    * rows — factored out of [[readWarcRecords]] so the SAME transform
    * runs on a STREAMING `binaryFile` source (a crawl drop-directory
    * ingested as shards land, feeding dedup-on-ingest). */
  def warcRecords(shards: DataFrame): DataFrame = {
    val raw = shards.select(col("path"), col("content"))
    val schema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("record_id", StringType, nullable = false),
      StructField("content_type", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    raw.mapPartitions { it =>
      it.flatMap { r =>
        val path = r.getString(0)
        graft.sources.Warc.records(r.getAs[Array[Byte]](1)).map { rec =>
          Row(path, rec.warcType, rec.targetUri, rec.recordId,
            rec.contentType, rec.block)
        }
      }
    }(enc)
  }

  /** The EXPORT half of the webdataset story ([[readTarMembers]] is
    * the ingest half): pack (member, content) rows into shard-sized
    * tar files — the layout training loaders actually consume, chosen
    * so a worker reads one large sequential file instead of millions
    * of small ones. Each Spark partition rolls its rows greedily into
    * shards of <= `maxShardBytes` member payload (one member never
    * splits; an oversize member gets its own shard), writes
    * `part-<partition>-<seq>.tar` via the filesystem API, and reports
    * one summary row per shard. Deterministic GIVEN a deterministic
    * partitioning+order — callers wanting byte-stable output should
    * `repartitionByRange(...).sortWithinPartitions(...)` first (the
    * gate does). Summary: (shard, members LONG, bytes LONG). */
  def writeTarShards(df: DataFrame, memberCol: String, contentCol: String,
      dir: String, maxShardBytes: Long = 1L << 30): DataFrame = {
    require(maxShardBytes > 0, "maxShardBytes must be positive")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("members", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val out = df.select(col(memberCol).cast("string"), col(contentCol))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // a fresh Configuration on the executor: the shard dir's URI
        // scheme picks the filesystem (Hadoop's Configuration is not
        // serializable, and Spark's serializable wrapper is
        // private[spark]); session-level fs tuning does not reach
        // here — acceptable for a bulk sequential writer
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
        var seq = 0
        val buf = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
        var bufBytes = 0L
        val summaries = scala.collection.mutable.ArrayBuffer[Row]()
        def flush(): Unit = if (buf.nonEmpty) {
          val name = f"part-$pid%05d-$seq%05d.tar"
          val p = new org.apache.hadoop.fs.Path(dir, name)
          val os = fs.create(p, false)
          try os.write(graft.sources.Tar.archive(buf.toSeq)) finally os.close()
          summaries += Row(name, buf.length.toLong, bufBytes)
          buf.clear(); bufBytes = 0L; seq += 1
        }
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](1)
          if (bufBytes + bytes.length > maxShardBytes) flush()
          buf += ((r.getString(0), bytes))
          bufBytes += bytes.length
        }
        flush()
        summaries.iterator
      }(enc)
    // the write is the mapPartitions' side effect — materialize it once
    // and hand back the stable summary
    out.localCheckpoint(true)
  }

  /** Group tar members into webdataset SAMPLES: key = member name up
    * to the first '.', extension maps to the member bytes — so
    * `0001.png` + `0001.txt` become one row (shard, key "0001",
    * parts {png -> bytes, txt -> bytes}). Webdataset guarantees a
    * sample's members are CONTIGUOUS in the shard, so this is a
    * per-partition adjacency fold over [[readTarMembers]] output —
    * ZERO shuffle at any corpus size (the groupBy formulation would
    * shuffle every byte of every image). Input must be readTarMembers-
    * shaped (shard, member, content) in archive order. */
  def pairTarMembers(members: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("key", StringType, nullable = false),
      StructField("parts",
        MapType(StringType, BinaryType, valueContainsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val si = members.schema.fieldIndex("shard")
    val mi = members.schema.fieldIndex("member")
    val ci = members.schema.fieldIndex("content")
    members.mapPartitions { it =>
      new Iterator[Row] {
        private var pending: Row = null // first member of the next sample
        private def keyOf(name: String) = {
          val dot = name.indexOf('.')
          if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
        }
        override def hasNext: Boolean = pending != null || it.hasNext
        override def next(): Row = {
          val first = if (pending != null) { val p = pending; pending = null; p }
            else it.next()
          val shard = first.getString(si)
          val (key, ext0) = keyOf(first.getString(mi))
          val parts = scala.collection.mutable.LinkedHashMap[String, Array[Byte]](
            ext0 -> first.getAs[Array[Byte]](ci))
          var done = false
          while (!done && it.hasNext) {
            val r = it.next()
            val (k, e) = keyOf(r.getString(mi))
            if (r.getString(si) == shard && k == key)
              parts(e) = r.getAs[Array[Byte]](ci)
            else { pending = r; done = true }
          }
          Row(shard, key, parts.toMap)
        }
      }
    }(enc)
  }

  /** Chunk + embed + id + metadata + dim-check. Input needs columns
    * (doc_id, text); output schema:
    * (id string, values array<float>, metadata struct<chunk_index int,
    *  source string>, doc_id, chunk_index int, chunk_text string). */
  def pipeline(
      docs: DataFrame,
      embedder: Embedder = new HashingEmbedder(),
      cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // E3 guard: the reference errors on zero chunks (streamlit_app.py:133-134).
    // `isEmpty` only reads the first partition — cheap relative to a count.
    if (docs.isEmpty) throw new IngestError("No documents to ingest")

    val size = cfg.chunkSize; val over = cfg.chunkOverlap; val sep = cfg.separator
    val chunkUdf = udf((text: String) => Chunker.split(text, size, over, sep))
    val chunked = docs
      .select(col("doc_id").cast(StringType).as("doc_id"), col("text"))
      .select(col("doc_id"), posexplode(chunkUdf(col("text"))).as(Seq("chunk_index", "chunk_text")))

    // E1: batched embedding via mapPartitions — one embedder per partition,
    // batches of embedBatchSize, mirroring model.encode's internal batching.
    val emb = embedder
    val batch = cfg.embedBatchSize
    val expected = cfg.expectedDim
    val outSchema = StructType(chunked.schema.fields :+
      StructField("values", ArrayType(FloatType, containsNull = false), nullable = false))
    val embedded = spark.createDataFrame(
      chunked.rdd.mapPartitions { it =>
        it.grouped(batch).flatMap { rows =>
          val vecs = emb.embed(rows.map(_.getString(2)))
          rows.lazyZip(vecs).map { (r, v) =>
            // E2: dimension check, fail-fast in the executor
            // (ref asserts width==384, streamlit_app.py:142-143)
            expected.foreach { d =>
              if (v.length != d)
                throw new IngestError(s"embedding dim ${v.length} != index dim $d")
            }
            Row.fromSeq(r.toSeq :+ v)
          }
        }
      },
      outSchema)

    // D1 ids + D2 metadata
    val withId = cfg.idMode match {
      case ScopedIds =>
        embedded.withColumn("id",
          concat(lit("doc-"), col("doc_id"), lit("-"), col("chunk_index")))
      case ReferenceIds =>
        Ids.contiguous(embedded, Seq(col("doc_id"), col("chunk_index")), "_seq")
          .withColumn("id", concat(lit("doc-"), col("_seq")))
          .drop("_seq")
    }
    withId.withColumn("metadata",
        struct(col("chunk_index"), lit(cfg.source).as("source")))
      .select($"id", $"values", $"metadata", $"doc_id", $"chunk_index", $"chunk_text")
  }
}
