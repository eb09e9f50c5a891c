package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** The banded-Hamming PIGEONHOLE LAW itself, over generated codes (r11
  * verdict #6): `RoundElevenProps` proves the operator end-to-end
  * (blocked ⊆ exact, within-radius pairs found); this pins the
  * mathematical guarantee the operator's scale posture rests on,
  * independent of any Spark plan — flipping fewer bits than there are
  * bands MUST leave at least one band untouched (`dedup_simhash`'s
  * table-scheme argument, Manku et al.). The band extraction replicates
  * `Similarity.hammingTopKBlocked`'s definition bit for bit: band `b` of
  * a packed code = bits `[b*bandBits, (b+1)*bandBits)` of word
  * `b / (32/bandBits)`.
  */
object RoundTwelveProps extends Properties("RoundTwelve") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200) // pure arithmetic — no Spark, cheap

  private def bandsOf(words: Seq[Long], bandBits: Int): Seq[Long] = {
    val nSub = 32 / bandBits
    val mask = if (bandBits == 32) 0xffffffffL else (1L << bandBits) - 1L
    words.flatMap(w => (0 until nSub).map(s => (w >>> (s * bandBits)) & mask))
  }

  // A base code, a band split, and a PLANTED mutation: exactly `r`
  // distinct bit positions flipped with r < numBands — the regime where
  // the law bites (uniform random pairs almost never sit inside the
  // radius, so planting is what makes the property non-vacuous).
  private val plantedGen: Gen[(List[Long], Int, Seq[Int])] = for {
    nWords <- Gen.choose(1, 4)
    bandBits <- Gen.oneOf(4, 8, 16, 32)
    base <- Gen.listOfN(nWords, Gen.choose(0L, 0xFFFFFFFFL))
    numBands = nWords * (32 / bandBits)
    r <- Gen.choose(0, numBands - 1)
    flips <- Gen.pick(r, 0 until nWords * 32)
  } yield (base, bandBits, flips.toSeq)

  private def flip(words: List[Long], positions: Seq[Int]): List[Long] =
    positions.foldLeft(words) { (ws, p) =>
      ws.updated(p / 32, ws(p / 32) ^ (1L << (p % 32)))
    }

  property("pigeonhole: flipping r < numBands bits always leaves an " +
      "intact band, and differing bands never exceed r") =
    forAll(plantedGen) { case (base, bandBits, flips) =>
      val mutated = flip(base, flips)
      val a = bandsOf(base, bandBits)
      val b = bandsOf(mutated, bandBits)
      val differing = a.zip(b).count { case (x, y) => x != y }
      // (1) the law: r < numBands distinct flipped bits cannot touch
      //     every band, so at least one (band, bits) value collides;
      // (2) each differing band holds >= 1 flipped bit, so the count of
      //     differing bands is bounded by the Hamming distance r.
      differing < a.length && differing <= flips.size
    }

  property("band equality is exactly zero XOR on the band's bits") =
    forAll(plantedGen) { case (base, bandBits, flips) =>
      val mutated = flip(base, flips)
      val nSub = 32 / bandBits
      val mask = if (bandBits == 32) 0xffffffffL else (1L << bandBits) - 1L
      bandsOf(base, bandBits).zip(bandsOf(mutated, bandBits))
        .zipWithIndex.forall { case ((x, y), i) =>
          val w = i / nSub
          val s = i % nSub
          val bandXor = ((base(w) ^ mutated(w)) >>> (s * bandBits)) & mask
          (x == y) == (bandXor == 0L)
        }
    }
}
