package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}

/** REAL audio codec on the JDK's own `javax.sound.sampled` — no new
  * dependency: WAV (RIFF) container parsing plus PCM payloads ship
  * with Java 17 (AIFF/AU too). This is the production audio half of
  * the media plane, the same move [[ImageCodec]] made for images:
  * [[Multimodal]] routes `kind = "audio"` rows here and falls back to
  * the deterministic stub only when the payload isn't a decodable
  * audio file. ([[VideoCodec]] covers the video half for uncompressed
  * Y4M streams; compressed video remains stubbed — no codec exists in
  * the JDK.)
  *
  * Everything is per-row pure computation meant to run inside
  * `mapPartitions` on executors: decode streams from a byte array
  * (no temp files, no audio device is ever opened — only the parser
  * and converters are touched, so headless executors are fine).
  */
object AudioCodec {

  /** Decoded-audio facts plus the exact-integer sample digest the
    * oracle replays: `sampleSum` is the sum of all samples in
    * UNSIGNED 8-bit space — for a WAV synthesized from known bytes
    * this proves the decode round-trip sample-for-sample.
    */
  case class AudioMeta(
      sampleRate: Int, channels: Int, nFrames: Long,
      nSamples: Long, sampleSum: Long)

  /** Encode UNSIGNED 8-bit mono PCM samples as a canonical WAV. The
    * container is lossless for PCM: [[tryDecode]] returns exactly
    * `samples` back (spec-verified), which is what lets an oracle
    * re-derive every decoded quantity from the source bytes without
    * parsing RIFF itself.
    */
  def encodePcmWav(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty, "PCM payload must have at least one frame")
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** `Some((format, pcmBytes))` iff the payload parses with a
    * registered audio file reader (WAV/AIFF/AU on a stock JDK);
    * `None` for non-audio bytes — the stub-fallback gate, so a
    * corrupted blob never kills a 100 TB job.
    */
  def tryDecode(payload: Array[Byte]): Option[(AudioFormat, Array[Byte])] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try Some((ais.getFormat, ais.readAllBytes()))
      finally ais.close()
    } catch {
      case _: UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Per-sample values in UNSIGNED 8-bit space (0..255), decoded from
    * the raw PCM frame bytes. 8-bit PCM is one byte per sample
    * (unsigned by WAV convention; signed encodings are shifted up by
    * 128); 16-bit PCM is folded to its top byte in unsigned space —
    * one consistent integer domain for sums/energies regardless of
    * the source bit depth.
    */
  def unsignedSamples(fmt: AudioFormat, pcm: Array[Byte]): Array[Int] = {
    val bits = fmt.getSampleSizeInBits
    val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
    if (bits <= 8) {
      val out = new Array[Int](pcm.length)
      var i = 0
      while (i < pcm.length) {
        val v = pcm(i) & 0xff
        out(i) = if (signed) (v + 128) & 0xff else v
        i += 1
      }
      out
    } else {
      // 16-bit: two bytes per sample; take the high-order byte and
      // re-center signed values into unsigned space
      val n = pcm.length / 2
      val out = new Array[Int](n)
      val hi = if (fmt.isBigEndian) 0 else 1
      var i = 0
      while (i < n) {
        val v = pcm(2 * i + hi) & 0xff
        out(i) = if (signed) (v + 128) & 0xff else v
        i += 1
      }
      out
    }
  }

  /** Real metadata from real decoded samples. */
  def decodeMeta(fmt: AudioFormat, pcm: Array[Byte]): AudioMeta = {
    val s = unsignedSamples(fmt, pcm)
    var sum = 0L
    var i = 0
    while (i < s.length) { sum += s(i); i += 1 }
    val ch = math.max(1, fmt.getChannels)
    AudioMeta(
      sampleRate = fmt.getSampleRate.toInt,
      channels = ch,
      nFrames = s.length.toLong / ch,
      nSamples = s.length.toLong,
      sampleSum = sum)
  }

  /** Real sample-rate conversion by linear interpolation over the
    * UNSIGNED 8-bit sample sequence (mono): output frame k sits at
    * source position `k · (n-1) / (m-1)` and blends its two
    * neighbours. Deterministic integer-in/integer-out DSP (the blend
    * rounds half-up), so specs can hand-compute expected samples.
    */
  def resampleLinear(samples: Array[Int], outFrames: Int): Array[Int] = {
    require(outFrames > 0, s"bad target length $outFrames")
    val n = samples.length
    if (n == 0) return new Array[Int](0)
    if (n == 1 || outFrames == 1) return Array.fill(outFrames)(samples(0))
    val out = new Array[Int](outFrames)
    var k = 0
    while (k < outFrames) {
      // fixed-point position: numerator over (outFrames-1)
      val num = k.toLong * (n - 1)
      val den = (outFrames - 1).toLong
      val i = (num / den).toInt
      val rem = num % den
      out(k) =
        if (rem == 0L) samples(i)
        else {
          val a = samples(i).toLong
          val b = samples(i + 1).toLong
          // linear blend, rounded half-up in exact integer arithmetic
          ((a * (den - rem) + b * rem + den / 2) / den).toInt
        }
      k += 1
    }
    out
  }

  /** Resample a decoded clip to `toRate`, preserving duration:
    * `outFrames = round(nFrames · toRate / fromRate)` (at least 1).
    */
  def resampleToRate(samples: Array[Int], fromRate: Int, toRate: Int): Array[Int] = {
    require(fromRate > 0 && toRate > 0, s"bad rates $fromRate -> $toRate")
    val outFrames = math.max(1L,
      (samples.length.toLong * toRate + fromRate / 2) / fromRate).toInt
    resampleLinear(samples, outFrames)
  }

  /** Energy-band acoustic fingerprint over real decoded samples — the
    * audio slot of the perceptual-hash family (a chromaprint-shaped
    * signature without the FFT: temporal energy envelope instead of
    * spectral bands). The clip is cut into `windows` equal-share
    * time windows (sample k → window `k·windows/n`, the same integer
    * grid the oracle replays); bit w is set iff that window's energy
    * `Σ v²` sits at or above the per-window mean
    * (`e_w · windows >= totalEnergy`, exact integer compare). Loudness
    * envelope is what survives re-encoding and mild noise, so
    * near-identical clips collide — the property perceptual dedup
    * needs — while the bits stay a pure function of the samples.
    */
  def energyFingerprint(samples: Array[Int], windows: Int = 64): Long = {
    require(windows >= 1 && windows <= 64, s"windows must be 1..64, got $windows")
    val n = samples.length
    if (n == 0) return 0L
    val energy = new Array[Long](windows)
    var total = 0L
    var k = 0
    while (k < n) {
      val v = samples(k).toLong
      val e = v * v
      energy((k.toLong * windows / n).toInt) += e
      total += e
      k += 1
    }
    var fp = 0L
    var w = 0
    while (w < windows) {
      // multiply-through compare: e_w/1 >= total/windows without division
      if (energy(w) * windows >= total) fp |= (1L << w)
      w += 1
    }
    fp
  }
}
