package graft.mm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio/video container-metadata walks: real RIFF chunk walk and
  * ISO-BMFF box walk over deterministic generated payloads, payload
  * bytes skipped by length, corrupt payloads fail-soft. */
class AvOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wavMeta: chunk walk recovers rate/channels/duration; payload skipped; pads honored") {
    val m = AvOps.wavMeta(AvOps.syntheticWav(7L, 16000, 2, 800))
    assert(m.container == "wav" && m.decode_ok)
    assert(m.sample_rate == 16000L && m.channels == 2L)
    assert(m.duration_ms == 800L * 1000 / 16000) // 50ms, floor
    assert(m.width == 0L && m.height == 0L)
    // a LIST chunk (odd size → pad byte) BEFORE fmt/data: writers
    // legally emit metadata chunks first, the walk must not assume
    // fixed offsets
    val base = AvOps.syntheticWav(7L, 8000, 1, 400)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 12) // RIFF....WAVE
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0, 0, 0)) // size 5 (odd: pad follows)
    out.write("INFOx".getBytes("US-ASCII"))
    out.write(0) // pad byte
    out.write(base, 12, base.length - 12)
    val shifted = AvOps.wavMeta(out.toByteArray)
    assert(shifted.decode_ok && shifted.sample_rate == 8000L &&
      shifted.channels == 1L && shifted.duration_ms == 50L)
    // truncated header and wrong magic fail soft
    assert(!AvOps.wavMeta(base.take(10)).decode_ok)
    assert(!AvOps.wavMeta("RIFFxxxxJUNK".getBytes("US-ASCII")).decode_ok)
  }

  test("mp4Meta: box walk recovers duration and 16.16 dims; mdat skipped by length") {
    val bytes = AvOps.syntheticMp4(9L, 640, 360, 12345, mdatBytes = 256)
    val m = AvOps.mp4Meta(bytes)
    assert(m.container == "mp4" && m.decode_ok)
    assert(m.duration_ms == 12345L && m.width == 640L && m.height == 360L)
    assert(m.sample_rate == 0L && m.channels == 0L)
    // mdat FIRST (streaming layout): the walk skips it by box length
    // and still finds moov
    val ftypLen = 16
    val moovStart = ftypLen
    val mdatStart = bytes.length - (8 + 256)
    val rearranged = bytes.take(ftypLen) ++
      bytes.slice(mdatStart, bytes.length) ++
      bytes.slice(moovStart, mdatStart)
    val m2 = AvOps.mp4Meta(rearranged)
    assert(m2.decode_ok && m2.duration_ms == 12345L && m2.width == 640L)
    // garbage and truncation fail soft
    assert(!AvOps.mp4Meta(bytes.take(20)).decode_ok)
    assert(!AvOps.mp4Meta(Array.fill(64)(0x41.toByte)).decode_ok)
  }

  test("wavMeta: adversarial chunk sizes fail soft PROMPTLY — no non-progress hang") {
    // A size field >= 0x80000000 truncated to Int goes negative; the
    // old Int advance could step by ZERO (0xFFFFFFF8 → -8, even;
    // 0xFFFFFFF7 → -9 +1 pad) — an executor-thread infinite loop no
    // NonFatal catch reaches. The Long walk must bail to NoMeta.
    def wavWithChunk(szBytes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array[Byte](0x24, 0, 0, 0))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("JUNK".getBytes("US-ASCII"))
      out.write(szBytes)
      out.write(Array.fill(32)(0x55.toByte)) // some trailing bytes
      out.toByteArray
    }
    // 0xFFFFFFF8: Int -8 → old step exactly 0
    assert(!AvOps.wavMeta(wavWithChunk(Array(0xF8, 0xFF, 0xFF, 0xFF)
      .map(_.toByte))).decode_ok)
    // 0xFFFFFFF7: Int -9, odd → +1 pad → old step exactly 0
    assert(!AvOps.wavMeta(wavWithChunk(Array(0xF7, 0xFF, 0xFF, 0xFF)
      .map(_.toByte))).decode_ok)
    // size merely past the buffer (no wraparound): equally corrupt
    assert(!AvOps.wavMeta(wavWithChunk(Array(0x00, 0x10, 0x00, 0x00)
      .map(_.toByte))).decode_ok)
  }

  test("wavMeta: sub-byte sample widths (4-bit ADPCM) fail soft, never divide by zero") {
    val base = AvOps.syntheticWav(3L, 8000, 1, 100)
    val patched = base.clone()
    patched(34) = 4; patched(35) = 0 // bits-per-sample ← 4
    val m = AvOps.wavMeta(patched) // direct call: must NOT throw
    assert(!m.decode_ok)
  }

  test("mp4Meta: size==0 (box to EOF) and size==1 (64-bit largesize) parse; corrupt largesize fails soft") {
    val bytes = AvOps.syntheticMp4(9L, 640, 360, 12345, mdatBytes = 256)
    val ftypLen = 16
    val mdatStart = bytes.length - (8 + 256)
    // moov LAST with size == 0: legal last-box shorthand
    val moovLast = bytes.take(ftypLen) ++
      bytes.slice(mdatStart, bytes.length) ++
      bytes.slice(ftypLen, mdatStart)
    val moovOff = ftypLen + (8 + 256)
    val zeroSized = moovLast.clone()
    zeroSized(moovOff) = 0; zeroSized(moovOff + 1) = 0
    zeroSized(moovOff + 2) = 0; zeroSized(moovOff + 3) = 0
    val m0 = AvOps.mp4Meta(zeroSized)
    assert(m0.decode_ok && m0.duration_ms == 12345L && m0.width == 640L)
    // mdat with size == 1 + 64-bit largesize: the >4GB encoding; the
    // walk must skip by largesize and still find moov behind it
    def be64bytes(v: Long): Array[Byte] =
      (0 until 8).map(i => ((v >> (56 - 8 * i)) & 0xff).toByte).toArray
    val payload = Array.fill(64)(0x22.toByte)
    val large = bytes.take(ftypLen) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      be64bytes(16L + 64L) ++ payload ++
      bytes.slice(ftypLen, mdatStart)
    val m1 = AvOps.mp4Meta(large)
    assert(m1.decode_ok && m1.duration_ms == 12345L && m1.height == 360L)
    // adversarial largesize: sign-bit set (negative as Long) and
    // huge-positive both bail to NoMeta — no loop, no overflow
    val negLarge = bytes.take(ftypLen) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      be64bytes(0xFFFFFFFFFFFFFFF8L) ++ payload
    assert(!AvOps.mp4Meta(negLarge).decode_ok)
    val hugeLarge = bytes.take(ftypLen) ++
      Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      be64bytes(Long.MaxValue) ++ payload
    assert(!AvOps.mp4Meta(hugeLarge).decode_ok)
  }

  test("metaWith: per-partition codec over a mixed feed; corrupt rows fail soft, not loud") {
    val rows = Seq(
      (1L, AvOps.syntheticWav(1L, 44100, 1, 4410)),
      (2L, AvOps.syntheticMp4(2L, 320, 240, 5000)),
      (3L, Array.fill(33)(7.toByte)),
      (4L, Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val got = AvOps.metaWith(rows, "doc_id", col("payload"))(
        AvOps.avMetaCodec _)
      .collect().map(m => m.id -> m).toMap
    assert(got(1L).container == "wav" && got(1L).duration_ms == 100L &&
      got(1L).sample_rate == 44100L)
    assert(got(2L).container == "mp4" && got(2L).width == 320L &&
      got(2L).height == 240L && got(2L).duration_ms == 5000L)
    assert(!got(3L).decode_ok && !got(4L).decode_ok)
  }
}
