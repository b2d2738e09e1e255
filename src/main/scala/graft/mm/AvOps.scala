package graft.mm

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio/video CONTAINER-METADATA operators — the `imageIoCodec`
  * header-only discipline ([[BinaryOps]]) extended to the other two
  * media families a multimodal training pipeline carries: WAV/RIFF
  * (audio) and MP4/ISO-BMFF (video). The JDK ships no audio/video
  * PIXEL decoders, but the container HEADERS are plain structured
  * bytes — a chunk walk (RIFF) and a box walk (ISO-BMFF) recover
  * duration / sample rate / channels / display dimensions without
  * decoding a single sample or frame, which is exactly the right cost
  * for a metadata pass over 100 TB of media (full decode stays behind
  * the [[BinaryOps.decodeWith]] factory seam for when a real codec
  * library is present).
  *
  * Everything runs through the same `mapPartitions` batch shape as the
  * image codecs: narrow, no shuffle, per-row failures captured as
  * `decode_ok = false` rather than thrown (one corrupt payload in
  * 100 TB must not kill the stage). */
object AvOps {

  /** One payload's container metadata — the row shape both parsers
    * produce: audio rows fill (duration_ms, sample_rate, channels),
    * video rows fill (duration_ms, width, height); absent fields are
    * 0. */
  final case class AvMeta(id: Long, container: String, duration_ms: Long,
      sample_rate: Long, channels: Long, width: Long, height: Long,
      decode_ok: Boolean)

  /** Imperative metadata stage — [[BinaryOps.decodeWith]]'s shape for
    * [[AvMeta]]: `codecFactory` runs once per partition, failures come
    * back as `decode_ok = false` rows. */
  def metaWith(df: DataFrame, idCol: String, bin: Column)
      (codecFactory: () => Array[Byte] => AvMeta): Dataset[AvMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), bin.cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codecFactory() // once per partition, by construction
        it.map { case (id, bytes) =>
          try decode(if (bytes == null) Array.emptyByteArray else bytes)
            .copy(id = id)
          catch {
            case scala.util.control.NonFatal(_) =>
              AvMeta(id, "error", 0L, 0L, 0L, 0L, 0L, decode_ok = false)
          }
        }
      }
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def le16(b: Array[Byte], o: Int): Long =
    ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) ""
    else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private val NoMeta = AvMeta(0L, "unknown", 0L, 0L, 0L, 0L, 0L,
    decode_ok = false)

  /** Header-only WAV/RIFF parse: a real CHUNK WALK (not fixed
    * offsets — writers legally put `LIST`/`fact` chunks before
    * `data`), reading `fmt ` for (channels, sample rate, bits) and
    * `data` for the payload size; duration derives as
    * `data_bytes * 1000 / byte_rate` (floor). Bytes after the header
    * are never touched — the RIFF chunk lengths let the walk SKIP the
    * sample payload, the header-only discipline. */
  def wavMeta(bytes: Array[Byte]): AvMeta = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "WAVE") return NoMeta
    var off = 12L
    var rate = 0L; var channels = 0L; var bits = 0L; var dataBytes = -1L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val ct = tag(bytes, o)
      val sz = le32(bytes, o + 4) // unsigned 32-bit — NEVER truncate to Int
      if (ct == "fmt " && o + 24 <= bytes.length) {
        channels = le16(bytes, o + 10)
        rate = le32(bytes, o + 12)
        bits = le16(bytes, o + 22)
      } else if (ct == "data") dataBytes = sz
      // chunks are word-aligned: odd sizes carry a pad byte. The
      // advance stays in Long: a corrupt size >= 0x80000000 truncated
      // to Int goes negative and can zero the step — an executor-thread
      // hang no NonFatal catch reaches. A size past the buffer is
      // equally corrupt; both bail to NoMeta (fail-soft contract).
      if (sz > bytes.length - off - 8) return NoMeta
      off += 8L + sz + (sz & 1L)
    }
    val byteRate = rate * channels * (bits / 8)
    // bits in 1..7 passes bits>0 but floors bits/8 to 0 → byteRate 0;
    // guard the divisor itself so direct callers never throw.
    if (rate <= 0 || channels <= 0 || byteRate <= 0 || dataBytes < 0) NoMeta
    else AvMeta(0L, "wav", dataBytes * 1000L / byteRate, rate, channels,
      0L, 0L, decode_ok = true)
  }

  /** Header-only MP4/ISO-BMFF parse: a real BOX WALK — top-level boxes
    * to `moov`, `moov` children for `mvhd` (movie timescale +
    * duration → duration_ms, floor) and the first `trak`'s `tkhd`
    * (display width/height, stored 16.16 fixed-point). Version-1
    * (64-bit) mvhd/tkhd variants are handled; `mdat` is SKIPPED by its
    * box length — the media payload is never read. The two legal
    * non-literal size encodings are honored: size == 0 means "box
    * extends to the end of the enclosing span" (last-box shorthand)
    * and size == 1 means "read the 64-bit largesize that follows the
    * type" (standard for > 4 GB mdat) — both common in real-world
    * files, both corrupt-guarded (a largesize past the buffer bails to
    * NoMeta, never loops or overflows). */
  def mp4Meta(bytes: Array[Byte]): AvMeta = {
    if (bytes.length < 12 || tag(bytes, 4) != "ftyp") return NoMeta
    var durationMs = -1L; var width = 0L; var height = 0L
    def walk(from: Int, until: Int, f: (String, Int, Int) => Unit): Unit = {
      var off = from
      while (off + 8 <= until) {
        val sz32 = be32(bytes, off)
        var hdr = 8L
        val sz: Long =
          if (sz32 == 0L) (until - off).toLong // box runs to span end
          else if (sz32 == 1L) { // 64-bit largesize after the type
            if (off + 16 > until) return
            hdr = 16L
            be64(bytes, off + 8)
          } else sz32
        // sz > until - off (not off + sz > until): the subtraction
        // form cannot overflow on an adversarial 64-bit largesize
        if (sz < hdr || sz > until - off) return
        f(tag(bytes, off + 4), off + hdr.toInt, off + sz.toInt)
        off += sz.toInt
      }
    }
    walk(0, bytes.length, { (t, s, e) =>
      if (t == "moov") walk(s, e, { (t2, s2, e2) =>
        if (t2 == "mvhd" && s2 + 4 <= e2) {
          val v = bytes(s2) & 0xff
          // v0: ctime/mtime 4+4, timescale 4, duration 4;
          // v1: ctime/mtime 8+8, timescale 4, duration 8
          if (v == 0 && s2 + 20 <= e2) {
            val ts = be32(bytes, s2 + 12)
            if (ts > 0) durationMs = be32(bytes, s2 + 16) * 1000L / ts
          } else if (v == 1 && s2 + 32 <= e2) {
            val ts = be32(bytes, s2 + 20)
            val dur = (be32(bytes, s2 + 24) << 32) | be32(bytes, s2 + 28)
            if (ts > 0) durationMs = dur * 1000L / ts
          }
        } else if (t2 == "trak" && width == 0L) walk(s2, e2, { (t3, s3, e3) =>
          if (t3 == "tkhd" && s3 + 4 <= e3) {
            val v = bytes(s3) & 0xff
            // width/height close the box: 16.16 fixed, last 8 bytes
            if (e3 - s3 >= (if (v == 1) 92 else 80)) {
              width = be32(bytes, e3 - 8) >> 16
              height = be32(bytes, e3 - 4) >> 16
            }
          }
        })
      })
    })
    if (durationMs < 0) NoMeta
    else AvMeta(0L, "mp4", durationMs, 0L, 0L, width, height,
      decode_ok = true)
  }

  /** The sniffing metadata codec for [[metaWith]]: RIFF magic → WAV
    * chunk walk, `ftyp` at offset 4 → ISO-BMFF box walk, anything
    * else → `decode_ok = false` (the corrupt-payload contract). */
  def avMetaCodec(): Array[Byte] => AvMeta = bytes =>
    if (bytes.length >= 12 && tag(bytes, 0) == "RIFF") wavMeta(bytes)
    else if (bytes.length >= 12 && tag(bytes, 4) == "ftyp") mp4Meta(bytes)
    else NoMeta

  // ---- deterministic fixture generators (the syntheticPngs
  // discipline: REAL container bytes whose metadata is a pure function
  // of the id, so an oracle recomputes the rule arithmetically while
  // the engine must actually walk the bytes) ----

  private def leBytes32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def leBytes16(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
  }
  private def beBytes32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def tagBytes(out: java.io.ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** A real PCM-16 WAV payload: RIFF/fmt/data with `nSamples`
    * id-deterministic samples. */
  def syntheticWav(id: Long, sampleRate: Int, channels: Int,
      nSamples: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dataBytes = nSamples * channels * 2
    tagBytes(out, "RIFF"); leBytes32(out, 36L + dataBytes)
    tagBytes(out, "WAVE")
    tagBytes(out, "fmt "); leBytes32(out, 16L)
    leBytes16(out, 1L) // PCM
    leBytes16(out, channels.toLong)
    leBytes32(out, sampleRate.toLong)
    leBytes32(out, sampleRate.toLong * channels * 2) // byte rate
    leBytes16(out, channels.toLong * 2) // block align
    leBytes16(out, 16L) // bits
    tagBytes(out, "data"); leBytes32(out, dataBytes.toLong)
    var i = 0
    while (i < nSamples * channels) {
      leBytes16(out, (id * 31 + i * 7) & 0xffffL)
      i += 1
    }
    out.toByteArray
  }

  /** A real minimal ISO-BMFF payload: ftyp + moov(mvhd@timescale 1000
    * + trak(tkhd with 16.16 width/height)) + an mdat of
    * id-deterministic bytes the walk must SKIP. */
  def syntheticMp4(id: Long, width: Int, height: Int,
      durationMs: Int, mdatBytes: Int = 64): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // ftyp
    beBytes32(out, 16L); tagBytes(out, "ftyp")
    tagBytes(out, "isom"); beBytes32(out, 0L)
    // moov = header(8) + mvhd(108) + trak(8 + tkhd 92)
    beBytes32(out, 8L + 108L + 100L); tagBytes(out, "moov")
    beBytes32(out, 108L); tagBytes(out, "mvhd")
    beBytes32(out, 0L) // version 0 + flags
    beBytes32(out, 0L); beBytes32(out, 0L) // ctime, mtime
    beBytes32(out, 1000L) // timescale: ms
    beBytes32(out, durationMs.toLong)
    beBytes32(out, 0x00010000L) // rate 1.0
    beBytes32(out, 0x01000000L) // volume 1.0 + reserved
    out.write(new Array[Byte](8)) // reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(beBytes32(out, _)) // unity matrix
    out.write(new Array[Byte](24)) // pre_defined
    beBytes32(out, 2L) // next track id
    beBytes32(out, 100L); tagBytes(out, "trak")
    beBytes32(out, 92L); tagBytes(out, "tkhd")
    beBytes32(out, 7L) // version 0 + flags (enabled)
    beBytes32(out, 0L); beBytes32(out, 0L) // ctime, mtime
    beBytes32(out, 1L) // track id
    beBytes32(out, 0L) // reserved
    beBytes32(out, durationMs.toLong)
    out.write(new Array[Byte](8)) // reserved
    beBytes32(out, 0L) // layer + alternate group
    beBytes32(out, 0L) // volume + reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(beBytes32(out, _))
    beBytes32(out, width.toLong << 16)
    beBytes32(out, height.toLong << 16)
    // mdat the box walk must skip by length
    beBytes32(out, 8L + mdatBytes); tagBytes(out, "mdat")
    val payload = Array.tabulate(mdatBytes)(i => ((id * 13 + i) & 0xff).toByte)
    out.write(payload)
    out.toByteArray
  }

  /** Deterministic mixed-media fixture frame: WAV payloads where
    * `kindCol` = "wav" (rule columns: rate, channels, samples), MP4
    * where "mp4" (rule columns: width, height, duration ms) — the
    * generator for the real-metadata oracle (`q_mm_av_meta`). Output:
    * (idCol, payload). */
  def syntheticAv(df: DataFrame, idCol: String, kindCol: Column,
      a: Column, b: Column, c: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), kindCol.cast("string"),
        a.cast("int"), b.cast("int"), c.cast("int"))
      .as[(Long, String, Int, Int, Int)]
      .mapPartitions { it =>
        it.map {
          case (id, "wav", rate, ch, n) => (id, syntheticWav(id, rate, ch, n))
          case (id, _, w, h, d) => (id, syntheticMp4(id, w, h, d))
        }
      }
      .toDF(idCol, "payload")
  }
}
