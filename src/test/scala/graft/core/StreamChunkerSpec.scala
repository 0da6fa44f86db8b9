package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The streaming chunker must produce byte-identical output to the batch
  * chunker over the same input, for BOTH boundary profiles, regardless of
  * how the InputStream fragments its reads — that equivalence is what lets
  * writeStream ingest arbitrarily large objects without changing identity. */
class StreamChunkerSpec extends AnyFunSuite {

  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 60)(f: (A, B) => Unit): Unit = {
    var seed = Seed(77L)
    (0 until n).foreach { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val b = gb.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      f(a, b)
    }
  }

  private val settingsGen: Gen[DedupeSettings] = for {
    min <- Gen.oneOf(256, 320, 512)
    maxMult <- Gen.choose(8, 12)
    shift <- Gen.oneOf(2, 8, 32)
    b <- Gen.choose(1, 2)
    profile <- Gen.oneOf(DedupeSettings.Md5Profile, DedupeSettings.GearProfile)
  } yield DedupeSettings(min, ((min * maxMult + 63) / 64) * 64, shift, b, profile)

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(1, 6 * 2048)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  /** InputStream that returns at most `dribble` bytes per read — exercises
    * the refill loop across arbitrary read fragmentation. */
  private final class DribblingStream(data: Array[Byte], dribble: Int)
      extends java.io.InputStream {
    private var pos = 0
    override def read(): Int =
      if (pos >= data.length) -1 else { val b = data(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= data.length) return -1
      val n = math.min(math.min(len, dribble), data.length - pos)
      System.arraycopy(data, pos, b, off, n)
      pos += n
      n
    }
  }

  private def assertSame(data: Array[Byte], s: DedupeSettings, dribble: Int): Unit = {
    val batch = s.chunkWithData(data)
    val streamed = Chunker.chunkStream(new DribblingStream(data, dribble), s).toIndexedSeq
    assert(streamed.map(_.ref) === batch.map(_.ref),
      s"refs diverge (profile=${s.profile}, n=${data.length}, dribble=$dribble)")
    for ((sc, bc) <- streamed.zip(batch))
      assert(java.util.Arrays.equals(sc.data, bc.data),
        s"payload slice diverges at pos ${bc.ref.position}")
  }

  test("chunkStream == chunkWithData for random inputs, both profiles, fragmented reads") {
    forAll(settingsGen, bytesGen) { (s, data) =>
      assertSame(data, s, dribble = 7)
      assertSame(data, s, dribble = Int.MaxValue)
    }
  }

  test("chunkStream matches batch at size edge cases") {
    val profiles = Seq(DedupeSettings.Md5Profile, DedupeSettings.GearProfile)
    for (p <- profiles) {
      val s = DedupeSettings(256, 2048, 8, 1, p)
      val r = new scala.util.Random(5)
      for (n <- Seq(1, 255, 256, 257, s.maxChunkSize - 1, s.maxChunkSize,
          s.maxChunkSize + 1, s.maxChunkSize + s.shiftCount, 5 * s.maxChunkSize + 13)) {
        val data = new Array[Byte](n); r.nextBytes(data)
        assertSame(data, s, dribble = 3)
      }
    }
  }

  test("chunkStream on an empty stream yields no chunks") {
    val s = DedupeSettings(256, 2048, 8, 1)
    val it = Chunker.chunkStream(new java.io.ByteArrayInputStream(Array.emptyByteArray), s)
    assert(!it.hasNext)
    intercept[NoSuchElementException](it.next())
  }
}
