package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.io.{ByteArrayInputStream, FileOutputStream, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** S4 — the gz spool-file reader (BSONReader, bson_reader.go:17-44):
  * gzip streams of length-prefixed frames, where each frame's first 4
  * bytes are its OWN total length, little-endian (the BSON document
  * wire layout). Frames larger than 16 MB or smaller than 5 bytes
  * terminate the stream, exactly like the reference.
  *
  * The streaming pipeline itself has no spool (checkpointed sources
  * replaced it — SURVEY §1.1), so this survives as the migration tool
  * for EXISTING spool files: `read` maps a directory of `.bson.gz`
  * files onto a DataFrame of opaque frames via the binaryFile source +
  * a typed flatMap splitter — one task per file, frames stay opaque
  * bytes (the copy path's payload discipline). Spool files are ≤64 MB
  * by construction (CacheDataSizeLimit, oplog_streamer.go:25-28), so
  * whole-file decompression per task is bounded.
  */
object Spool {
  val MaxFrame: Int = 16 * 1024 * 1024 // BSONSizeLimit, bson_reader.go:35

  /** Split a decompressed stream into frames. Each returned array is the
    * FULL frame including its 4-byte length header (as the reference
    * returns `data` with the header copied in, bson_reader.go:36-43). */
  def frames(in: InputStream): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var nextFrame: Array[Byte] = advance()
    private def readFully(buf: Array[Byte], off: Int, len: Int): Boolean = {
      var done = 0
      while (done < len) {
        val n = in.read(buf, off + done, len - done)
        if (n < 0) return false
        done += n
      }
      true
    }
    private def advance(): Array[Byte] = {
      val header = new Array[Byte](4)
      if (!readFully(header, 0, 4)) return null
      val size = (header(0) & 0xff) | ((header(1) & 0xff) << 8) |
        ((header(2) & 0xff) << 16) | ((header(3) & 0xff) << 24)
      if (size > MaxFrame || size < 5) return null // terminate, like the reference
      val data = new Array[Byte](size)
      System.arraycopy(header, 0, data, 0, 4)
      if (!readFully(data, 4, size - 4)) return null
      data
    }
    override def hasNext: Boolean = nextFrame != null
    override def next(): Array[Byte] = {
      val f = nextFrame; nextFrame = advance(); f
    }
  }

  /** Read a spool file glob into (path, frame_seq, frame) rows. */
  def read(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val in = new GZIPInputStream(new ByteArrayInputStream(content))
        try frames(in).zipWithIndex.map { case (f, i) => (path, i.toLong, f) }.toVector
        finally in.close()
      }
      .toDF("path", "frame_seq", "frame")
  }

  /** Prefix a payload with its little-endian total length — the inverse
    * of [[frames]], for tests and spool generation. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val size = payload.length + 4
    val out = new Array[Byte](size)
    out(0) = (size & 0xff).toByte
    out(1) = ((size >> 8) & 0xff).toByte
    out(2) = ((size >> 16) & 0xff).toByte
    out(3) = ((size >> 24) & 0xff).toByte
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }

  /** Write framed payloads as one gz spool file (the writer side the
    * reference runs at cache time, oplog_streamer.go:147-151). */
  def write(file: String, payloads: Seq[Array[Byte]]): Unit = {
    val out = new GZIPOutputStream(new FileOutputStream(file))
    try payloads.foreach(p => out.write(frame(p)))
    finally out.close()
  }
}
