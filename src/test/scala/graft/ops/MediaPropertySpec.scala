package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MediaUtil, ZOrderUtil}

/** Property tests for the byte-level native expressions: the JPEG
  * segment walker must recover planted dims under arbitrary preceding
  * segment layouts and never loop/crash on arbitrary bytes; the Morton
  * interleave must be a bijection (exact deinterleave round trip).
  * Deterministic seeds for reproducibility (same style as
  * Md5TwinPropertySpec). */
class MediaPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
    val len = body.length + 2
    Array[Byte](0xFF.toByte, marker.toByte, (len >> 8).toByte, (len & 0xFF).toByte) ++ body
  }

  private val appSegment: Gen[Array[Byte]] = for {
    marker <- Gen.oneOf((0xE0 to 0xEF) :+ 0xFE) // APPn or COM
    n <- Gen.choose(0, 200)
    body <- Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127).map(_.toByte))
  } yield seg(marker, body)

  test("planted SOF dims are recovered behind ANY chain of APPn/COM segments") {
    val gen = for {
      segs <- Gen.listOf(appSegment)
      h <- Gen.choose(1, 65535)
      w <- Gen.choose(1, 65535)
    } yield (segs, h, w)
    (1 to 200).foreach { seed =>
      val (segs, h, w) = sample(gen, seed.toLong)
      val sof = seg(0xC0, Array[Byte](8,
        (h >> 8).toByte, (h & 0xFF).toByte, (w >> 8).toByte, (w & 0xFF).toByte, 1))
      val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
        segs.toArray.flatten ++ sof
      assert(MediaUtil.jpegDimsPacked(jpeg) == (h.toLong << 16 | w.toLong),
        s"seed $seed (${segs.size} segments before SOF)")
    }
  }

  test("arbitrary bytes never crash or hang the walker") {
    val bytesGen = Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte))
    (1 to 500).foreach { seed =>
      val bytes = sample(bytesGen, seed.toLong)
      val packed = MediaUtil.jpegDimsPacked(bytes) // must terminate
      assert(packed == -1L || packed >= 0L, s"seed $seed")
    }
  }

  test("morton2 is a bijection: exact deinterleave round trip") {
    def unspread(v: Long): Long = {
      var x = v & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
      x
    }
    val pairGen = for {
      a <- Gen.choose(0L, 0xFFFFFFFFL)
      b <- Gen.choose(0L, 0xFFFFFFFFL)
    } yield (a, b)
    (1 to 500).foreach { seed =>
      val (a, b) = sample(pairGen, seed.toLong)
      val z = ZOrderUtil.morton2(a, b)
      assert(unspread(z) == a && unspread(z >> 1) == b, s"seed $seed ($a, $b)")
    }
  }
}
