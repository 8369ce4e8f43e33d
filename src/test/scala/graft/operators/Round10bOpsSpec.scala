package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 second batch: Hodges–Lehmann pseudo-median, deterministic
  * Poisson bootstrap, Yule–Walker AR(2), leakage-free splits, the
  * discrete-geometric DP release, and the WAV codec seam. */
class Round10bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hodgesLehmann: pseudo-median shrugs off the outlier day the " +
      "mean would chase") {
    // daily values 1..7 except day 4 carries 1000. Walsh averages of
    // {1,2,3,1000,5,6,7}: the pseudo-median stays near the clean
    // center while the mean is ~146.
    val rows = (0 until 7).map { k =>
      val v = if (k == 3) 1000.0 else (k + 1).toDouble
      (ts(s"2024-01-0${k + 1} 10:00:00"), "view", v)
    }
    val out = AnalyticsOps.hodgesLehmann(rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Double)].collect()
    assert(out.length == 1)
    val (_, nPairs, hl) = out.head
    assert(nPairs == 28, "7 days -> 7*8/2 Walsh pairs incl. singletons")
    assert(hl > 1.0 && hl < 10.0,
      s"pseudo-median must stay with the clean mass, got $hl")
  }

  test("hodgesLehmann: exact value on a tiny series") {
    // days with y = 1, 3: Walsh set {1, 2, 3} (odd count) -> median 2
    val rows = Seq((ts("2024-01-01 00:00:00"), "c", 1.0),
      (ts("2024-01-02 00:00:00"), "c", 3.0))
    val out = AnalyticsOps.hodgesLehmann(rows.toDF("ts", "event_type", "value"))
      .as[(String, Long, Double)].collect().head
    assert(out._2 == 3L)
    assert(out._3 == 2.0)
  }

  test("bootstrapMeanCi: deterministic, ordered, and centered") {
    val rows = (1 to 500).map(i =>
      (ts(f"2024-01-${1 + i % 28}%02d 00:00:00"), "view", i.toLong,
        (i % 50).toDouble))
    val df = rows.toDF("ts", "event_type", "event_id", "value")
    val out = AnalyticsOps.bootstrapMeanCi(df)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.length == 1)
    val (_, n, mean, lo, hi) = out.head
    assert(n == 500)
    assert(lo <= hi, s"CI must be ordered: [$lo, $hi]")
    assert(lo <= mean && mean <= hi,
      s"point estimate outside its own CI: $mean not in [$lo, $hi]")
    // resampling noise shrinks as 1/sqrt(n): the CI must be tight
    // around the true mean (~24.5), not degenerate and not wild
    assert(hi - lo > 0.0 && hi - lo < 10.0, s"CI width ${hi - lo}")
    val again = AnalyticsOps.bootstrapMeanCi(df)
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(again == out.head, "hash-seeded bootstrap must be bit-stable")
  }

  test("yuleWalkerAr2: recovers the sign structure of an alternating " +
      "series and forecasts with the closed form") {
    // strictly alternating daily counts 10, 20, 10, 20, ... ->
    // r1 < 0, r2 > 0; forecast must equal the phi formula applied to
    // the last two days exactly (the op's own output is the witness)
    val rows = (0 until 20).flatMap { k =>
      val n = if (k % 2 == 0) 10 else 20
      (0 until n).map(j =>
        (ts(f"2024-01-${k + 1}%02d 0${j % 9}:00:00"), "a"))
    }
    val out = AnalyticsOps.yuleWalkerAr2(rows.toDF("ts", "event_type"))
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().head
    val (_, n, r1, r2, phi1, phi2, forecast) = out
    assert(n == 20)
    assert(r1 < 0, s"alternating series must have negative r1: $r1")
    assert(r2 > 0, s"and positive r2: $r2")
    val ybar = 15.0
    val expected = ybar + phi1 * (20.0 - ybar) + phi2 * (10.0 - ybar)
    assert(forecast == expected, s"$forecast != $expected")
    // the AR(2) of an alternating series predicts the flip: next is low
    assert(forecast < ybar, s"must forecast the alternation: $forecast")
  }

  test("leakageSplit: cluster members share a split; fractions are " +
      "roughly 80/10/10; singletons still split") {
    val docs = (0L until 300L).toDF("doc_id")
    // clusters: {0..9} -> rep 0, {10..14} -> rep 10; rest singletons
    val reps = ((0L until 10L).map(i => (i, 0L)) ++
      (10L until 15L).map(i => (i, 10L))).toDF("doc_id", "cluster_rep")
    val out = PipelineOps.leakageSplit(docs, reps)
      .as[(Long, Long, String)].collect()
    assert(out.length == 300)
    val byDoc = out.map(r => r._1 -> r._3).toMap
    assert((0L until 10L).map(byDoc).toSet.size == 1,
      "cluster {0..9} must land in ONE split")
    assert((10L until 15L).map(byDoc).toSet.size == 1,
      "cluster {10..14} must land in ONE split")
    val frac = out.groupBy(_._3).view.mapValues(_.length / 300.0).toMap
    assert(frac.getOrElse("train", 0.0) > 0.6, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.25, frac.toString)
    assert(frac.getOrElse("test", 0.0) < 0.25, frac.toString)
  }

  test("dpNoisyCounts: noise bounded to [-5, 5], deterministic in the " +
      "salt, release floored at zero") {
    val df = (1 to 100).map(i => s"g${i % 20}").toDF("g")
    val out = AnalyticsOps.dpNoisyCounts(df, "g")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 20)
    assert(out.forall { case (_, _, k, _) => k >= -5 && k <= 5 })
    assert(out.forall { case (_, n, k, rel) =>
      rel == math.max(n + k, 0L) })
    val again = AnalyticsOps.dpNoisyCounts(df, "g")
      .as[(String, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // a different salt is a different coin: some group must differ
    val other = AnalyticsOps.dpNoisyCounts(df, "g", salt = "dp2")
      .as[(String, Long, Long, Long)].collect()
    assert(other.map(r => r._1 -> r._3).toMap !=
      out.map(r => r._1 -> r._3).toMap,
      "independent salts should not reproduce the identical noise map")
  }

  test("dpNoisyMean: clipping bounds the sensitivity, noise scales " +
      "by it, and the release is deterministic") {
    val df = ((1 to 50).map(i => ("a", 5.0)) ++
      (1 to 50).map(i => ("a", 1e9)) ++ // clipped to 100
      (1 to 40).map(i => ("b", 10.0)))
      .toDF("g", "value")
    val out = AnalyticsOps.dpNoisyMean(df, "g", "value", clip = 100.0)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val a = out("a")
    // clipped sum: 50*5.0 + 50*100.0 in 1e-4 units
    assert(a._3 == (50L * 50000 + 50L * 1000000),
      s"clip must bound the huge values: ${a._3}")
    // noisy sum differs from the true sum by k*clipUnits, k in [-5,5]
    val kSum = (a._5 - a._3) / 1000000
    assert((a._5 - a._3) % 1000000 == 0 && kSum >= -5 && kSum <= 5)
    assert(math.abs(a._4 - a._2) <= 5, "count noise at unit scale")
    assert(a._6 == a._5.toDouble / 10000.0 / a._4.toDouble)
    val again = AnalyticsOps.dpNoisyMean(df, "g", "value", 100.0)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == out, "hash-coined release must be bit-stable")
  }

  test("WavCodec: encode/decode round-trip recovers the PCM samples " +
      "and the header fields") {
    val data = "hello wav world!".getBytes("US-ASCII")
    val wav = Multimodal.WavCodec.encode(data, sampleRate = 16000)
    val pcm = Multimodal.WavCodec.decode(wav)
    assert(pcm.sampleRate == 16000)
    assert(pcm.samples.length == 8)
    // first sample: 'h' + 256*'e' little-endian
    assert(pcm.samples(0) == ('h' + 256 * 'e').toShort)
  }

  test("WavCodec: odd payload pads one space byte") {
    val wav = Multimodal.WavCodec.encode("abc".getBytes("US-ASCII"))
    val pcm = Multimodal.WavCodec.decode(wav)
    assert(pcm.samples.length == 2)
    assert(pcm.samples(1) == ('c' + 256 * ' ').toShort)
  }

  test("WavCodec: decode skips unknown chunks and rejects truncation " +
      "and non-PCM") {
    val good = Multimodal.WavCodec.encode("abcd".getBytes("US-ASCII"))
    // splice an unknown chunk between WAVE and fmt
    val extra = java.nio.ByteBuffer
      .allocate(good.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(good, 0, 12)
    extra.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
    extra.put(good, 12, good.length - 12)
    val pcm = Multimodal.WavCodec.decode(extra.array())
    assert(pcm.samples.length == 2, "unknown chunk must be skipped")
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(good.take(30))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode("RIFXbadmagicpayload".getBytes("US-ASCII"))
    }
  }

  test("extractWavFeatures: malformed payload degrades to null " +
      "columns, never task failure") {
    val media = Seq(
      (1L, Multimodal.WavCodec.encode("abcd".getBytes("US-ASCII")), "audio/wav"),
      (2L, "not a wav at all".getBytes("US-ASCII"), "audio/wav"))
      .toDF("media_id", "payload", "media_type")
    val out = Multimodal.extractWavFeatures(spark, media)
      .collect().sortBy(_.media_id)
    assert(out(0).n_samples.contains(2L))
    assert(out(0).sample_rate.contains(8000))
    assert(out(0).peak_amp.exists(_ > 0))
    assert(out(1).n_samples.isEmpty && out(1).mean_amp.isEmpty,
      "malformed payload must yield nulls")
    assert(out(1).byte_len == 16L)
  }
}
