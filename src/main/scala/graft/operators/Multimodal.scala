package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Multimodal-column plumbing: media as opaque BINARY payloads + typed
  * metadata, with decode / frame-sample / feature-extract stages.
  *
  * The container has no image/audio codecs, so the decode step is a
  * STUB ([[StubCodec]] — a deterministic fake standing in for e.g. a
  * JNI JPEG/PCM decoder). Everything around it — schema, typed Dataset
  * plumbing, per-partition batch decode shape, the declarative
  * feature-aggregation downstream — is real and tested; swapping in a
  * real codec changes one function.
  *
  * The media table itself derives deterministically from `documents`
  * (payload = UTF-8 bytes of `text`, metadata from `doc_id`/length), so
  * the metadata query has a full DuckDB oracle.
  *
  * Scale notes: decode runs via mapPartitions — the one legitimate use
  * (SURVEY.md §7.3: imperative per-partition logic); each task decodes
  * its partition's payloads in a tight loop, no driver involvement, no
  * shuffle until the (much smaller) feature rows aggregate. At 100 TB,
  * payload columns should be stored in their own parquet column chunk
  * (they are — column pruning keeps metadata-only queries from reading
  * bytes) and partitions sized by `spark.sql.files.maxPartitionBytes`
  * so a task's decoded batch fits executor memory.
  */
object Multimodal {

  val FRAME_PX = 64 // 8×8 fake pixels per frame

  /** media_id, kind, payload BINARY, width, height, n_frames. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(16) + (col("doc_id") % 8) * 16).cast("int").as("width"),
      (lit(16) + (col("doc_id") % 4) * 16).cast("int").as("height"),
      (col("n_chars") % 4 + 1).cast("int").as("n_frames"))

  private val sqlMediaTable: String =
    """SELECT doc_id AS media_id,
      |       ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |       encode(text) AS payload,
      |       CAST(16 + (doc_id % 8) * 16 AS INT) AS width,
      |       CAST(16 + (doc_id % 4) * 16 AS INT) AS height,
      |       CAST(n_chars % 4 + 1 AS INT) AS n_frames
      |FROM documents""".stripMargin

  /** Pluggable decode: payload → n_frames × FRAME_PX pixel ints. */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte], nFrames: Int): Array[Array[Int]]
  }

  /** STUB standing in for a real image/audio decoder (no codec libs in
    * this container). Deterministic fake: pixel p of frame f is byte
    * ((f*31 + p*7) mod len) of the payload, unsigned. */
  object StubCodec extends Codec {
    def decode(payload: Array[Byte], nFrames: Int): Array[Array[Int]] = {
      val len = math.max(payload.length, 1)
      Array.tabulate(nFrames, FRAME_PX) { (f, p) =>
        if (payload.isEmpty) 0 else payload((f * 31 + p * 7) % len) & 0xFF
      }
    }
  }

  /** Decoded frame row. */
  case class Frame(media_id: Long, frame_no: Int, pixels: Array[Int])

  /** Batch decode: per-partition imperative loop over (id, payload,
    * n_frames) rows — the Scala analogue of an Arrow-batch decode UDF. */
  def decodeFrames(media: DataFrame, codec: Codec = StubCodec): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("n_frames"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        it.flatMap { case (id, payload, nFrames) =>
          codec.decode(payload, nFrames).iterator.zipWithIndex.map {
            case (px, f) => Frame(id, f, px)
          }
        }
      }
  }

  /** Frame sampling: keep every `stride`-th frame (video thinning). */
  def sampleFrames(frames: Dataset[Frame], stride: Int): Dataset[Frame] =
    frames.filter(col("frame_no") % stride === 0)

  /** Block-average "resize" of the fake 8×8 frame to 4×4 (stub math,
    * real array plumbing: higher-order functions over the pixel array). */
  def resizeFrames(frames: DataFrame): DataFrame =
    frames.withColumn("pixels_4x4",
      transform(sequence(lit(0), lit(15)), i => {
        val r = floor(i / 4).cast("int") * 2; val c = (i % 4) * 2
        val at = (rr: org.apache.spark.sql.Column, cc: org.apache.spark.sql.Column) =>
          element_at(col("pixels"), (rr * 8 + cc + 1).cast("int"))
        floor((at(r, c) + at(r, c + 1) + at(r + 1, c) + at(r + 1, c + 1)) / 4).cast("int")
      }))

  // ------------------------------------------------------------ queries

  /** Metadata-only stats per kind — never touches payload bytes beyond
    * length (column pruning keeps the binary column unread for width/
    * height aggregates at scale). Full DuckDB oracle. */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(length(col("payload"))).as("total_bytes"),
        davg(col("width")).as("avg_width"),
        davg(col("height")).as("avg_height"),
        sum(col("n_frames")).cast("long").as("total_frames"))
      .orderBy("kind")

  val mediaMetadataSql: String =
    s"""WITH m AS ($sqlMediaTable)
       |SELECT kind, count(*) AS n_media,
       |       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       |       ${sqlDavg("width")} AS avg_width,
       |       ${sqlDavg("height")} AS avg_height,
       |       CAST(sum(n_frames) AS BIGINT) AS total_frames
       |FROM m GROUP BY kind ORDER BY kind""".stripMargin

  /** Decode → per-media pixel features. The decode itself runs through
    * the [[Codec]] seam (mapPartitions), but [[StubCodec]]'s byte→pixel
    * math is pure arithmetic over the UTF-8 payload — and the synthetic
    * corpus is pure ASCII (octet == character, verified in
    * MultimodalSpec), so the DuckDB oracle re-derives every pixel with
    * substr/ascii and the query is fully hash-checked. A real codec
    * would flip this back to rows-only + spec-tested, like any JNI
    * boundary. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFrames(mediaTable(spark, dir))
      .select(col("media_id"), col("frame_no"), explode(col("pixels")).as("px"))
      .groupBy(col("media_id"))
      .agg(
        (max(col("frame_no")) + 1).cast("int").as("n_frames"),
        count(lit(1)).as("n_pixels"),
        davg(col("px")).as("mean_px"),
        min(col("px")).as("min_px"),
        max(col("px")).as("max_px"))
      .orderBy("media_id")

  /** DuckDB replica of [[StubCodec]]: pixel p of frame f is byte
    * ((f*31 + p*7) mod len), unsigned — on the pure-ASCII corpus the
    * byte at index i IS ascii(substr(text, i+1, 1)). generate_series
    * cannot take lateral bounds in DuckDB, so frames enumerate the
    * CONSTANT 0..3 range (mediaTable caps n_frames at `% 4 + 1` ≤ 4)
    * and filter to each row's n_frames. The empty-payload branch
    * mirrors StubCodec's zero-fill exactly (codec: `if (payload
    * .isEmpty) 0`, with len clamped via greatest so the modulo never
    * divides by zero even when DuckDB evaluates both CASE arms
    * vectorized) — without it an empty-text document is NULL here and
    * 0 in the codec, an opaque cross-engine hash flip. The
    * MultimodalSpec ASCII/non-empty precondition test stays as
    * belt-and-braces. */
  val mediaFeaturesSql: String =
    """WITH m AS (SELECT doc_id AS media_id, text,
      |                  CAST(n_chars % 4 + 1 AS INT) AS n_frames,
      |                  length(text) AS len FROM documents),
      |px AS (
      |  SELECT media_id, f.f AS frame_no,
      |         CASE WHEN len = 0 THEN 0
      |              ELSE ascii(substr(text, ((f.f*31 + p.p*7) % greatest(len, 1)) + 1, 1))
      |         END AS px
      |  FROM m, generate_series(0, 3) AS f(f), generate_series(0, 63) AS p(p)
      |  WHERE f.f < m.n_frames)
      |SELECT media_id, CAST(max(frame_no) + 1 AS INT) AS n_frames,
      |       CAST(count(*) AS BIGINT) AS n_pixels,
      |       CAST(sum(CAST(px AS DECIMAL(18,2))) AS DOUBLE) / count(px) AS mean_px,
      |       CAST(min(px) AS INT) AS min_px, CAST(max(px) AS INT) AS max_px
      |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin

  /** Exact media dedup — md5 over the raw BINARY payload (codec-free:
    * byte-identical copies dedupe regardless of what the bytes encode,
    * the first pass every media pipeline runs before any perceptual
    * hash). Per kind: volumes, unique payloads, dup fraction, and bytes
    * reclaimable by keeping one copy per digest. One digest shuffle on
    * the scan-local md5; the payload column itself never shuffles
    * (only its length and 16-byte digest do) — the property that makes
    * this viable when payloads are megabytes. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("kind"), md5(col("payload")).as("digest"),
        length(col("payload")).cast("long").as("nbytes"))
      .groupBy(col("kind"), col("digest"))
      .agg(count(lit(1)).as("copies"), min(col("media_id")).as("keeper"),
        max(col("nbytes")).as("nbytes"))
      .groupBy(col("kind"))
      .agg(sum(col("copies")).as("n_media"),
        count(lit(1)).as("n_unique"),
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("copies")))
          .as("dup_frac"),
        // overflow-safe by construction: Σ(copies−1)·nbytes < Σ payload
        // bytes = corpus size (~10¹⁴ at 100 TB) ≪ 2⁶³ (OverflowSweepSpec)
        sum((col("copies") - 1) * col("nbytes")).as("reclaimable_bytes"))
      .orderBy("kind")

  val mediaDedupSql: String =
    s"""WITH m AS ($sqlMediaTable),
       |d AS (SELECT kind, md5(CAST(payload AS VARCHAR)) AS digest,
       |             CAST(count(*) AS BIGINT) AS copies,
       |             min(media_id) AS keeper,
       |             CAST(max(octet_length(payload)) AS BIGINT) AS nbytes
       |      FROM m GROUP BY 1, 2)
       |SELECT kind, CAST(sum(copies) AS BIGINT) AS n_media,
       |       CAST(count(*) AS BIGINT) AS n_unique,
       |       CAST(1.0 AS DOUBLE) - CAST(count(*) AS DOUBLE) / sum(copies) AS dup_frac,
       |       CAST(sum((copies - 1) * nbytes) AS BIGINT) AS reclaimable_bytes
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------- format sniffing
  /** Magic-byte container sniffing — the REAL first stage of any
    * multimodal ingest (never trust the claimed kind/extension; a
    * mislabeled payload sent to the wrong decoder is a crash or a
    * silent garbage feature). Detects by header bytes: PNG signature,
    * JPEG SOI, GIF87a/89a, RIFF (WAV/AVI containers), PDF, else
    * "data" (no content guessing beyond the magic — a printable-text
    * probe would need byte-level regex the two engines can't share
    * safely across multibyte boundaries). Composed entirely from
    * codegen'd builtins (binary substring + literal compare) —
    * preference (a), no custom Expression and no codec library; the
    * byte probes read ≤ 8 bytes per row.
    *
    * On the synthetic corpus every payload is UTF-8 text → "data",
    * and the oracle agrees byte-for-byte; detection of real containers
    * is proven on planted PNG/JPEG/GIF/RIFF/PDF headers in
    * `MultimodalSpec`. */
  def sniffKind(payload: Column): Column = {
    def pfx(n: Int) = substring(payload, 1, n)
    def bytesLit(xs: Int*) = lit(xs.map(_.toByte).toArray)
    when(pfx(8) === bytesLit(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "png")
      .when(pfx(3) === bytesLit(0xFF, 0xD8, 0xFF), "jpeg")
      .when(pfx(4) === bytesLit(0x47, 0x49, 0x46, 0x38), "gif")
      .when(pfx(4) === bytesLit(0x52, 0x49, 0x46, 0x46), "riff")
      .when(pfx(5) === bytesLit(0x25, 0x50, 0x44, 0x46, 0x2D), "pdf")
      .otherwise("data")
  }

  def mediaSniff(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("kind").as("claimed_kind"), sniffKind(col("payload")).as("detected"),
        length(col("payload")).cast("long").as("nbytes"))
      .groupBy(col("claimed_kind"), col("detected"))
      .agg(count(lit(1)).as("n_media"), sum(col("nbytes")).as("total_bytes"))
      .orderBy("claimed_kind", "detected")

  val mediaSniffSql: String =
    s"""WITH m AS ($sqlMediaTable),
       |s AS (SELECT kind AS claimed_kind,
       |        CASE WHEN lower(left(to_hex(payload), 16)) = '89504e470d0a1a0a' THEN 'png'
       |             WHEN lower(left(to_hex(payload), 6)) = 'ffd8ff' THEN 'jpeg'
       |             WHEN lower(left(to_hex(payload), 8)) = '47494638' THEN 'gif'
       |             WHEN lower(left(to_hex(payload), 8)) = '52494646' THEN 'riff'
       |             WHEN lower(left(to_hex(payload), 10)) = '255044462d' THEN 'pdf'
       |             ELSE 'data' END AS detected,
       |        CAST(octet_length(payload) AS BIGINT) AS nbytes
       |      FROM m)
       |SELECT claimed_kind, detected, CAST(count(*) AS BIGINT) AS n_media,
       |       CAST(sum(nbytes) AS BIGINT) AS total_bytes
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_sniff"    -> mediaSniff _,
    "q_media_metadata" -> mediaMetadata _,
    "q_media_features" -> mediaFeatures _,
    "q_media_dedup"    -> mediaDedup _)

  val oracles: Map[String, String] = Map(
    "q_media_sniff"    -> mediaSniffSql,
    "q_media_metadata" -> mediaMetadataSql,
    "q_media_features" -> mediaFeaturesSql,
    "q_media_dedup"    -> mediaDedupSql)
}
