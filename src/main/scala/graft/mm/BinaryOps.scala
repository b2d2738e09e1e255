package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal / binary-column operators (builder brief §multimodal;
  * SURVEY §1.2-1.3 binary payload discipline).
  *
  * Images / audio / video ride as opaque `BinaryType` payload columns
  * with TYPED metadata columns alongside — the same two-tier design the
  * copy path uses for documents (opaque bytes + extracted key). The
  * reference round-trips BSON binary subtypes 1-4 as opaque bytes
  * (sim.go:322-331, bson_reader_test.go:22-24); here the payload gets
  * first-class Spark operators: metadata extraction, content-hash dedup,
  * fixed-size chunking (the frame/sample shape for media), and a decode
  * stage.
  *
  * Everything is expression-only (codegen'd, no UDFs): hashing, byte
  * slicing, and chunk explosion all run inside whole-stage codegen, and
  * per-doc work is narrow — no shuffle until an explicit aggregation.
  */
object BinaryOps {

  /** Attach typed metadata to a binary payload: byte length, md5 content
    * hash, magic-bytes prefix (format sniffing — e.g. x89504E47 = PNG),
    * and the fixed-size chunk count. */
  def withMetadata(df: DataFrame, bin: Column, chunkBytes: Int = 256): DataFrame =
    df.withColumn("n_bytes", length(bin).cast("long"))
      .withColumn("content_hash", md5(bin))
      .withColumn("magic_hex", upper(hex(substring(bin, 1, 4))))
      .withColumn("n_chunks",
        ceil(length(bin).cast("double") / chunkBytes).cast("long"))

  /** Exact dedup over binary content — one map-side-combined hash
    * aggregate, the binary twin of [[graft.text.Dedup.exact]]. */
  def contentDedup(df: DataFrame, idCol: String, bin: Column): DataFrame =
    df.groupBy(md5(bin).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Fixed-size chunking: one row per `chunkBytes` slice with its
    * 0-based sequence number and md5 — the frame-sampling / rolling-hash
    * shape for media payloads (and the unit of chunk-level dedup).
    * Pure per-row explosion: |output| = Σ ceil(bytes/chunkBytes), no
    * shuffle, arbitrarily wide payloads never skew a partition beyond
    * their own chunk count. */
  def chunks(df: DataFrame, idCol: String, bin: Column,
      chunkBytes: Int = 256): DataFrame = {
    df.select(col(idCol), bin.as("__bin"))
      .select(col(idCol), posexplode(transform(starts_of(col("__bin"), chunkBytes),
        st => md5(col("__bin").substr(st, lit(chunkBytes))))))
      .withColumnRenamed("pos", "chunk_seq")
      .withColumnRenamed("col", "chunk_md5")
  }

  private def starts_of(bin: Column, chunkBytes: Int): Column =
    sequence(lit(1L), greatest(length(bin).cast("long"), lit(1L)), lit(chunkBytes.toLong))

  /** Decode / feature-extract stage.
    *
    * STUB CODEC: this container ships no image/audio libraries, so the
    * decode is a clearly-marked deterministic fake — width/height/format
    * derived from the payload hash and magic bytes. The SPARK-SIDE
    * PLUMBING is the real deliverable and is what production swaps a
    * codec into: same output schema (id, width, height, format,
    * decode_ok), same narrow per-row shape; a real deployment replaces
    * the three fake expressions with a codec UDF (or `mapInPandas` +
    * PIL on the Python surface) and NOTHING downstream changes. */
  def decodeStub(df: DataFrame, idCol: String, bin: Column): DataFrame = {
    val h = md5(bin)
    df.select(
      col(idCol),
      (conv(substring(h, 1, 4), 16, 10).cast("long") % 4096 + 1).as("width"),
      (conv(substring(h, 5, 4), 16, 10).cast("long") % 4096 + 1).as("height"),
      when(upper(hex(substring(bin, 1, 4))) === "89504E47", "png")
        .when(upper(hex(substring(bin, 1, 3))) === "FFD8FF", "jpeg")
        .otherwise("raw").as("format"),
      (length(bin) > 0).as("decode_ok"))
  }

  /** One decoded payload — the row shape every codec produces. */
  final case class Decoded(id: Long, width: Long, height: Long,
      format: String, decode_ok: Boolean)

  /** Imperative codec stage — the JVM twin of a `mapInPandas` + PIL
    * pipeline: a typed `mapPartitions` whose `codecFactory` runs ONCE
    * per partition (this is the load-bearing part of the batch shape —
    * real codecs pay native-library / model-weights init that must
    * amortize over a partition, never per row), and whose per-row
    * decode failures are CAPTURED as `decode_ok = false` rows rather
    * than thrown (one corrupt payload in 100 TB must not kill the
    * stage). Plan stays narrow: no shuffle, partitioning preserved.
    *
    * The expression stub [[decodeStub]] is the declarative fast path
    * for metadata-only decodes; this is the seam a REAL codec plugs
    * into — swap `codecFactory` and nothing downstream changes.
    * [[stubCodec]] (deterministic, library-free) pins the plumbing. */
  def decodeWith(df: DataFrame, idCol: String, bin: Column)
      (codecFactory: () => Array[Byte] => Decoded): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), bin.cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codecFactory() // once per partition, by construction
        it.map { case (id, bytes) =>
          try {
            val d = decode(if (bytes == null) Array.emptyByteArray else bytes)
            d.copy(id = id)
          } catch {
            case scala.util.control.NonFatal(_) =>
              Decoded(id, 0L, 0L, "error", decode_ok = false)
          }
        }
      }
  }

  /** The deterministic stand-in codec (no media libraries in this
    * container): md5-derived dimensions + magic-bytes format, exactly
    * [[decodeStub]]'s arithmetic — BinaryOpsSpec pins the two equal. */
  def stubCodec(): Array[Byte] => Decoded = {
    val md = java.security.MessageDigest.getInstance("MD5")
    bytes => {
      md.reset()
      val h = md.digest(bytes).map("%02x".format(_)).mkString
      val magic = bytes.take(4).map("%02X".format(_)).mkString
      val fmt =
        if (magic == "89504E47") "png"
        else if (magic.startsWith("FFD8FF")) "jpeg"
        else "raw"
      Decoded(0L,
        java.lang.Long.parseLong(h.substring(0, 4), 16) % 4096 + 1,
        java.lang.Long.parseLong(h.substring(4, 8), 16) % 4096 + 1,
        fmt, bytes.nonEmpty)
    }
  }
}
