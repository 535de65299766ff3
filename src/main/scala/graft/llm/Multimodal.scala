package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Tables

/** Multimodal-column plumbing: opaque `binary` payload columns with typed
  * metadata, batch-shaped decode/feature-extract over partitions.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecodeFeatures`): it derives a
  * fixed-length feature vector from the payload bytes' hash. Everything
  * around it — the binary column, the metadata struct, the partition-
  * parallel batch shape, pushdown-friendly metadata predicates — is the
  * real production plumbing a codec would drop into.
  */
object Multimodal {

  /** Stand-in media payload: the document text bytes as an opaque blob
    * (in production: image/audio bytes read from object storage). */
  private def blobbed(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          octet_length(col("text").cast("binary")).as("n_bytes"),
          lit("text/plain").as("mime"),
          col("lang").as("lang_hint")).as("meta"))

  /** Metadata extraction over binary payloads — fully oracled (byte length,
    * hex prefix, metadata predicates), no decode involved. */
  def meta(spark: SparkSession, dir: String): DataFrame =
    blobbed(spark, dir)
      .filter(col("meta.n_bytes") > 100)
      .select(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.mime").as("mime"),
        hex(substring(col("payload"), 1, 4)).as("head_hex"))
      .orderBy(col("doc_id"))

  /** STUB decode → feature extraction: a real codec (JPEG decode, mel
    * spectrogram, frame sampling) would replace `fakeDecodeFeatures`; the
    * batch shape (binary in, fixed-width float vector out, map-side only)
    * is what a Pandas-UDF/mapInPandas equivalent needs at scale.
    *
    * The stub features are md5-nibble-derived (feature i = i-th hex digit
    * of md5(payload) scaled to [0,1)) — deterministic AND reproducible in
    * the DuckDB oracle, unlike a Spark-private hash. The vector leaves the
    * query serialized (fixed %.4f CSV): the driver's pandas compare can't
    * hash raw array cells, and the fixed-point rendering sidesteps
    * float-formatting drift between engines. */
  def fakeDecodeFeatures(spark: SparkSession, dir: String, nFeatures: Int = 4): DataFrame = {
    val features = (0 until nFeatures).map { i =>
      val nibble = expr(s"instr('0123456789abcdef', substring(md5(payload), ${i + 1}, 1)) - 1")
      format_string("%.4f", nibble.cast("double") / 16.0)
    }
    blobbed(spark, dir)
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
        concat_ws(",", features: _*).as("features_csv"))
      .orderBy(col("doc_id"))
  }

  /** One sampled "frame" of a media payload (STUB: a fixed-stride byte
    * chunk standing in for a decoded video frame / audio window). */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Int, n_bytes: Int,
                   checksum: Long)

  /** STUB frame sampling via mapPartitions — the imperative per-partition
    * batch path a real codec needs (iterator in, iterator out, no
    * driver involvement, memory bounded by one row's payload at a time).
    * Samples every `stride`-th fixed-size chunk of the payload; a video
    * decoder would instead seek keyframes. Column-expression ops can't
    * express per-element imperative decode loops, which is exactly the
    * case where mapPartitions (Scala) / mapInPandas (Python) is the right
    * tool — everything before and after stays declarative. */
  def frameSample(spark: SparkSession, dir: String,
                  frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    val frames = blobbed(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, payload) =>
          val nChunks = (payload.length + frameBytes - 1) / frameBytes
          (0 until nChunks by stride).iterator.map { chunk =>
            val off = chunk * frameBytes
            val len = math.min(frameBytes, payload.length - off)
            // STUB "decode": FNV-1a over the chunk stands in for the
            // decoded frame tensor; deterministic for the oracle-less test
            var h = 0xcbf29ce484222325L
            var i = off
            while (i < off + len) { h = (h ^ (payload(i) & 0xff)) * 0x100000001b3L; i += 1 }
            Frame(docId, chunk / stride, off, len, h)
          }
        }
      }
    frames.toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** One resized row of a media payload (STUB: 1-D block-average
    * downsample standing in for an image resize kernel). */
  case class Resized(doc_id: Long, n_bytes: Int, resized_csv: String)

  /** STUB resize via mapPartitions — completes the decode / feature-extract
    * / resize / frame-sample multimodal quartet. The payload byte stream is
    * downsampled to `target` "pixels" by area averaging (block i covers
    * [⌊iL/T⌋, ⌊(i+1)L/T⌋), value = floor-mean of its bytes) — the 1-D
    * analogue of the box filter an image resize applies per channel, in
    * the same imperative per-partition batch shape a real kernel needs.
    * All arithmetic is integer (sum / count floor division), so the DuckDB
    * oracle replays it exactly; output leaves as CSV ints for the driver's
    * pandas compare. */
  def resizeStub(spark: SparkSession, dir: String, target: Int = 16): DataFrame = {
    import spark.implicits._
    blobbed(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2.length >= target).map { case (id, p) =>
          val L = p.length
          val vals = (0 until target).map { i =>
            val s = (i.toLong * L / target).toInt
            val e = ((i + 1).toLong * L / target).toInt
            var sum = 0L
            var j = s
            while (j < e) { sum += (p(j) & 0xff); j += 1 }
            (sum / (e - s)).toString // integer floor-mean: exact both engines
          }
          Resized(id, L, vals.mkString(","))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_resize" -> ((s, d) => resizeStub(s, d)),
    "mm_meta" -> meta,
    "mm_decode_features" -> ((s, d) => fakeDecodeFeatures(s, d)),
    "mm_frame_sample" -> ((s, d) => frameSample(s, d))
  )

  val oracles: Map[String, String] = Map(
    // block-average downsample replayed with integer arithmetic (`//` is
    // floor division; unicode(text[j]) == byte for the ASCII corpus)
    "mm_resize" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS L
        |           FROM documents WHERE octet_length(encode(text)) >= 16),
        |b AS (SELECT doc_id, L, i,
        |        (i * L) // 16 AS s, ((i + 1) * L) // 16 AS e
        |      FROM d, generate_series(0, 15) AS t(i)),
        |v AS (SELECT b.doc_id, b.L, b.i,
        |        CAST(list_sum(list_transform(range(b.s + 1, b.e + 1),
        |          j -> unicode(d.text[j]))) AS BIGINT) // (b.e - b.s) AS pix
        |      FROM b JOIN d ON b.doc_id = d.doc_id)
        |SELECT doc_id, CAST(max(L) AS INTEGER) AS n_bytes,
        |  string_agg(CAST(pix AS VARCHAR), ',' ORDER BY i) AS resized_csv
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // replays the mapPartitions stride/chunk walk and the FNV-1a checksum
    // in SQL (HUGEINT mod-2^64; the 8-bit xor folds through BIGINT xor on
    // the low byte) — ASCII corpus, so string index == byte offset
    "mm_frame_sample" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents),
        |f AS (
        |  SELECT doc_id, c AS chunk, (c*64) AS off, LEAST(64, L - c*64) AS n_bytes, text
        |  FROM d, unnest(generate_series(0, CAST(ceil(L/64.0) AS INTEGER) - 1, 4)) AS t(c)),
        |chk AS (
        |  SELECT doc_id, chunk // 4 AS frame_idx, off, n_bytes,
        |    list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(off + 1, off + n_bytes + 1),
        |          i -> CAST(unicode(text[i]) AS HUGEINT))),
        |      (acc, b) -> (((acc - acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT)) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |    ) AS m
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(off AS INTEGER) AS "offset", CAST(n_bytes AS INTEGER) AS n_bytes,
        |  CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
        |            THEN m - 18446744073709551616::HUGEINT ELSE m END AS BIGINT) AS checksum
        |FROM chk ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_decode_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  printf('%.4f', (strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) / 16.0)
        |    || ',' || printf('%.4f', (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1) / 16.0)
        |    || ',' || printf('%.4f', (strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) / 16.0)
        |    || ',' || printf('%.4f', (strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1) / 16.0)
        |    AS features_csv
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  'text/plain' AS mime,
        |  hex(encode(substring(text, 1, 4))) AS head_hex
        |FROM documents WHERE octet_length(encode(text)) > 100
        |ORDER BY doc_id""".stripMargin
  )
}
