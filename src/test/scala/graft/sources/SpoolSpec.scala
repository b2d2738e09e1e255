package graft.sources

import graft.SparkSpec

import java.io.ByteArrayInputStream
import java.nio.file.Files
import java.util.zip.GZIPInputStream
import scala.util.Random

class SpoolSpec extends SparkSpec {

  private def payloads(n: Int, seed: Int): Seq[Array[Byte]] = {
    val r = new Random(seed)
    Seq.fill(n) {
      val b = new Array[Byte](r.nextInt(200) + 1)
      r.nextBytes(b)
      b
    }
  }

  test("frame round-trip through a gz spool file (bson_reader.go:17-44)") {
    val dir = Files.createTempDirectory("graft-spool")
    val ps = payloads(50, 7)
    Spool.write(s"$dir/a.bson.gz", ps)

    val rows = Spool.read(spark, s"$dir/*.bson.gz")
      .collect().sortBy(_.getLong(1))
    assert(rows.length == 50)
    rows.zip(ps).foreach { case (row, p) =>
      val f = row.getAs[Array[Byte]]("frame")
      assert(f.length == p.length + 4)
      assert(f.drop(4).toSeq == p.toSeq, "payload bytes must round-trip")
    }
  }

  test("oversized or undersized frame terminates the stream, like the reference") {
    val good = Spool.frame(Array[Byte](1, 2, 3))
    // header claims 32 MB — reader must stop without allocating it
    val huge = Array[Byte](0, 0, 0, 2) // 0x02000000 = 33554432 LE
    val tiny = Array[Byte](4, 0, 0, 0) // size 4 < 5
    def split(bytes: Array[Byte]) =
      Spool.frames(new ByteArrayInputStream(bytes)).toSeq
    assert(split(good ++ huge ++ good).map(_.toSeq) == Seq(good.toSeq))
    assert(split(good ++ tiny).map(_.toSeq) == Seq(good.toSeq))
    // truncated tail (header promises more than present) is dropped
    assert(split(good ++ good.dropRight(2)).map(_.toSeq) == Seq(good.toSeq))
  }

  test("multiple spool files map to one frame DataFrame, one task per file") {
    val dir = Files.createTempDirectory("graft-spool2")
    Spool.write(s"$dir/a.bson.gz", payloads(5, 1))
    Spool.write(s"$dir/b.bson.gz", payloads(7, 2))
    val df = Spool.read(spark, s"$dir/*.bson.gz")
    assert(df.count() == 12)
    val perFile = df.groupBy("path").count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(perFile == Map("a.bson.gz" -> 5L, "b.bson.gz" -> 7L))
    // round-trip through gunzip matches the driver-side splitter
    val gz = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/a.bson.gz"))
    val local = Spool.frames(new GZIPInputStream(new ByteArrayInputStream(gz))).toSeq
    assert(local.size == 5)
  }
}
