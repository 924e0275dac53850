package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the md5-twin hash material: the hex-nibble bit
  * extraction that simhashMd5 builds its votes from must agree with a
  * direct 64-bit parse of the digest, for arbitrary unicode tokens —
  * this is the seam where an off-by-one in nibble indexing or bit order
  * would silently produce a self-consistent but WRONG twin (both
  * engines would still match each other on the oracle side only if they
  * make the same mistake, so the property pins the Spark side to an
  * independent ground truth). Deterministic seeds for reproducibility. */
class Md5TwinPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("simhashMd5 single-token signature equals the parsed md5 bits, any unicode") {
    import graft.dedup.Dedup
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // A single-token doc's signature IS the token hash's bit pattern
    // (every vote is +-1 with no cancellation).
    val tokenGen = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.listOfN(6, Gen.oneOf('中', '文', 'ß', 'é', 'ж', 'λ', '9', 'x'))
        .map(_.mkString))
    val tokens = (1L to 60L).map(s => sample(tokenGen, s)).distinct
    val docs = df("doc_id bigint, text string")(
      tokens.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
    val got = Dedup.simhashMd5(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    tokens.zipWithIndex.foreach { case (t, i) =>
      val h = java.lang.Long.parseUnsignedLong(md5hex(t).take(16), 16)
      val expHi = h >>> 32
      val expLo = h & 0xffffffffL
      assert(got(i.toLong) == ((expHi, expLo)), s"token '$t'")
    }
  }

  test("affine minhash permutation values equal a pure-Scala recomputation, any unicode") {
    import graft.dedup.Dedup
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val shingleGen = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.listOfN(5, Gen.oneOf('中', 'ß', 'é', 'ж', 'λ', ' ', '0')).map(_.mkString))
    val shingles = (100L to 140L).map(s => sample(shingleGen, s)).distinct
    // One shingle per doc: the k-wide signature IS that shingle's k
    // affine permutation values — pin them to an independent recompute
    // of (w1 + i*w2) mod 2^32 from the Java digest.
    val sets = df("doc_id bigint, shingle string")(
      shingles.zipWithIndex.map { case (sh, i) => Row(i.toLong, sh) })
    val k = 8
    val got = Dedup.minhashSignaturesFromSetsMd5(sets, "doc_id", k).collect()
      .map(r => r.getLong(0) -> (1 to k).map(j => r.getLong(j))).toMap
    shingles.zipWithIndex.foreach { case (sh, i) =>
      val hex = md5hex(sh)
      val w1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val w2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val exp = (0 until k).map(p => (w1 + p * w2) % 4294967296L)
      assert(got(i.toLong) == exp, s"shingle '$sh'")
    }
  }

  test("minhash md5 signatures are permutation-stable under shingle order") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.functions._
    // The signature is a min over a SET — shuffling the set rows can
    // never change it (aggregation-order independence of the twin).
    val shingles = (1 to 40).map(i => s"sh$i gram$i")
    val fwd = df("doc_id bigint, shingle string")(
      shingles.map(s => Row(1L, s)))
    val rev = df("doc_id bigint, shingle string")(
      shingles.reverse.map(s => Row(1L, s)))
    val a = Dedup.minhashSignaturesFromSetsMd5(fwd, "doc_id", 16)
      .orderBy("doc_id").collect()(0).toSeq
    val b = Dedup.minhashSignaturesFromSetsMd5(rev.repartition(7, col("shingle")), "doc_id", 16)
      .orderBy("doc_id").collect()(0).toSeq
    assert(a == b)
  }
}
