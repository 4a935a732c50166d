package graft.expr

import graft.SparkSpec
import graft.functions.MultimodalFunctions.AudioCodec
import graft.functions.DedupFunctions
import org.apache.spark.sql.functions._

/** Pins the audio-fingerprint contract ([[Afp64Expr]]): the WAV
  * round-trip feeds the exact integer formula into the energies, the
  * hash is invariant to the edits a fingerprint must survive (global
  * gain, small perturbations) while distinct tones stay far apart, and
  * the kernel is distributed and type-safe. Everything is integer
  * arithmetic — no float margins exist in this family. */
class AudioPhashSpec extends SparkSpec {
  import spark.implicits._

  private def samples(id: Int): Array[Short] = Array.tabulate(1024) { n =>
    (((id + 3).toLong * ((n.toLong * n) % 977) + 17L * n) % 4096 - 2048).toShort
  }

  private def wav(id: Int): Array[Byte] = AudioCodec.pcm16Wav(samples(id), 8000)

  private def energiesOf(x: Array[Short]): Array[Long] =
    AudioCodec.bandEnergies(AudioCodec.pcm16Wav(x, 8000)).get

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("WAV round-trip: band energies equal the direct-formula computation") {
    // an independently-coded WHT over the raw samples (no container)
    def direct(x: Array[Short]): Array[Long] = {
      val out = new Array[Long](5 * 17)
      for (t <- 0 until 5; b <- 0 until 17) {
        var e = 0L
        for (j <- 0 until 3) {
          val k = b * 3 + j + 1
          var w = 0L
          for (n <- 0 until 64)
            w += (if (java.lang.Integer.bitCount(n & k) % 2 == 0) x(t * 64 + n)
                  else -x(t * 64 + n)).toLong
          e += w * w
        }
        out(t * 17 + b) = e
      }
      out
    }
    for (id <- 0 until 4)
      assert(AudioCodec.bandEnergies(wav(id)).get.sameElements(direct(samples(id))))
  }

  test("invariances: global gain preserves every bit; small noise collides") {
    val h0 = Afp64.hash(energiesOf(samples(0)))
    // halving the PCM scales every energy by 1/4 — all difference signs
    // survive any positive gain by construction
    val half = samples(0).map(s => (s / 2).toShort)
    assert(Afp64.hash(energiesOf(half)) === h0)
    // +1 on every 7th sample: zero flipped bits on this battery
    val noisy = samples(0).zipWithIndex.map { case (s, i) =>
      if (i % 7 == 0) (s + 1).toShort else s
    }
    assert(ham(Afp64.hash(energiesOf(noisy)), h0) <= 4)
  }

  test("distinct tones stay far apart; hamming64 composes over the afp column") {
    val rows = (0 until 16).map(i => (i.toLong, wav(i))) :+
      (99L, "not a wav".getBytes("UTF-8"))
    val df = graft.functions.MultimodalFunctions.audioPhash(
      rows.toDF("media_id", "content").repartition(4), "media_id", "content")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 16 && !got.contains(99L)) // non-audio dropped
    for (i <- 0 until 16)
      assert(got(i.toLong) === Afp64.hash(energiesOf(samples(i))))
    val minDist = df.as("a").join(df.as("b"), col("a.media_id") < col("b.media_id"))
      .select(DedupFunctions.hamming64(col("a.afp"), col("b.afp"))
        .cast("long").as("d"))
      .agg(min(col("d"))).head().getLong(0)
    assert(minDist >= 12, s"closest distinct pair at $minDist bits")
  }

  test("afp64 expression: wrong-length grid is null; short audio is dropped") {
    val out = Seq((1L, Array(1L, 2L)), (2L, Array.fill(85)(7L)))
      .toDF("id", "e")
      .select(col("id"), NativeFunctions.afp64(col("e")).as("h"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && !out(2L))
    // fewer than 320 samples: bandEnergies refuses (no partial frames)
    val short = AudioCodec.pcm16Wav(Array.fill[Short](300)(5), 8000)
    assert(AudioCodec.bandEnergies(short).isEmpty)
  }
}
