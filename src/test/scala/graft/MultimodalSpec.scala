package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "another payload"), (3L, "third doc"))
      .toDF("id", "text"),
    "id", "text", "image")

  test("asMedia produces the typed media schema") {
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "kind", "payload", "meta"))
    val m = media.filter($"media_id" === 1L)
      .select($"meta.n_bytes", $"meta.mime").as[(Long, String)].head()
    assert(m === ((11L, "text/plain")))
  }

  test("batchDecodeFeatures (mapPartitions batch path) matches per-row decode") {
    val perRow = media
      .withColumn("features", Multimodal.decodeFeatures(col("payload"), 8))
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    val batched = Multimodal.batchDecodeFeatures(media, dim = 8, batchSize = 2)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(batched === perRow)
    assert(batched(1L).length === 8)
  }

  test("resizeStub rewrites payload and metadata to the target dimensions") {
    import org.apache.spark.sql.types.StructType
    val out = Multimodal.resizeStub(media, width = 8, height = 8)
    def shape(dt: org.apache.spark.sql.types.DataType) =
      dt.asInstanceOf[StructType].fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(out.schema("meta").dataType) === shape(media.schema("meta").dataType))
    val m = out.filter($"media_id" === 1L)
      .select($"meta.width", $"meta.height", $"meta.n_bytes").as[(Int, Int, Long)].head()
    assert(m._1 === 8 && m._2 === 8)
    assert(m._3 > 0 && m._3 <= 8 * 8 * 3)
  }

  test("Ppm: synth payload decodes to the closed-form stats; hand-built file too") {
    import graft.multimodal.Ppm
    // hand-built 2x1 P6 with comments + odd whitespace: a real parser
    // must skip both, not just the synth's exact header layout
    val hand = ("P6 # trailing comment\n# full comment line\n  2\t1 " +
      "\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val st = Ppm.decodeStats(hand)
    assert(st != null)
    assert((0 until 5).map(st.getLong) === Seq(2L, 1L, 50L, 70L, 90L))
    // synth formula round-trip for a few ids
    for (id <- Seq(0L, 3L, 17L)) {
      val w = 4 + (id % 5); val h = 3 + (id % 4)
      val exp = (0 until 3).map(c =>
        (0L until w * h).map(p => (id * 31 + (3 * p + c) * 7) % 256).sum)
      val s2 = Ppm.decodeStats(Ppm.synthPayload(id))
      assert((0 until 5).map(s2.getLong) === Seq(w, h, exp(0), exp(1), exp(2)))
    }
  }

  test("Ppm: malformed payloads decode to null (quarantine, not job kill)") {
    import graft.multimodal.Ppm
    val good = Ppm.synthPayload(5L)
    assert(Ppm.decodeStats(good) != null)
    assert(Ppm.decodeStats("P5\n1 1\n255\n ".getBytes("US-ASCII")) == null, "wrong magic")
    assert(Ppm.decodeStats(good.dropRight(1)) == null, "truncated raster")
    assert(Ppm.decodeStats(good :+ 0.toByte) == null, "trailing junk")
    assert(Ppm.decodeStats("P6\n2 2\n999\n".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(1)) == null, "maxval > 255")
    // expression path: null flows through, malformed row is null, good row decodes
    val df = Seq((1L, good), (2L, null.asInstanceOf[Array[Byte]]),
        (3L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .select($"id", Ppm.stats($"payload").as("st")).orderBy("id").collect()
    assert(!df(0).isNullAt(1) && df(1).isNullAt(1) && df(2).isNullAt(1))
  }

  test("Ppm resize: 1:1 resize is stat-identical; upscale preserves corner pixel") {
    import graft.multimodal.Ppm
    val id = 9L
    val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
    val src = Ppm.synthPayload(id)
    val same = Ppm.resize(src, w, h)
    val a = Ppm.decodeStats(src); val b = Ppm.decodeStats(same)
    assert((0 until 5).map(a.getLong) === (0 until 5).map(b.getLong))
    // 1x1 resize samples exactly source pixel (0,0)
    val one = Ppm.decodeStats(Ppm.resize(src, 1, 1))
    val exp = (0 until 3).map(c => (id * 31 + c * 7) % 256)
    assert((2 until 5).map(one.getLong) === exp)
  }

  test("Ppm aHash: uniform image is 0, half-split image is the exact bit pattern") {
    import graft.multimodal.Ppm
    def p6(w: Int, h: Int, px: Array[Byte]) =
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
    // uniform: every lum equals the mean, strict > sets no bit
    assert(Ppm.aHash64(p6(3, 2, Array.fill[Byte](18)(100.toByte))) === 0L)
    // 2x1 black|white: target cells x>=4 sample the white pixel ->
    // bits 4..7 of every row -> 0xF0 per byte
    val bw = p6(2, 1, Array[Byte](0, 0, 0) ++ Array.fill[Byte](3)(255.toByte))
    assert(Ppm.aHash64(bw).longValue() === 0xF0F0F0F0F0F0F0F0L)
    // malformed -> null
    assert(Ppm.aHash64(Array[Byte](1, 2, 3)) == null)
    // the perceptual property: a one-byte corruption lands the hash a
    // SMALL Hamming distance away — far below the ~32 expected between
    // unrelated images (robustness is the whole point of aHash; whether
    // a given pair clears q182's <=6 reporting threshold is the oracle's
    // business, both sides deriving the same hashes) — while byte-wise
    // the payloads differ in exactly one place
    val dists = (0L until 31L).map { id =>
      val a = Ppm.synthPayload(id); val b = Ppm.synthPerturbedPayload(id)
      assert(a.length === b.length)
      assert(a.zip(b).count { case (x, y) => x != y } === 1)
      val d = java.lang.Long.bitCount(
        Ppm.aHash64(a).longValue() ^ Ppm.aHash64(b).longValue())
      assert(d <= 16, s"id=$id pristine-vs-perturbed hamming $d — not perceptual")
      d
    }
    // fixture non-vacuousness: plenty of planted pairs land inside q182's
    // <=6 inter-path window (and some at 0, feeding the intra path)
    assert(dists.count(_ <= 6) >= 10, s"distances $dists")
  }

  test("batchDecodeFeatures with the REAL Ppm codec matches the per-row expression") {
    import graft.multimodal.Ppm
    val m2 = media.withColumn("payload", Ppm.synth($"media_id"))
    val perRow = m2.select($"media_id", Ppm.stats($"payload").as("st"))
      .select($"media_id", expr("transform(st, x -> cast(x as float))").as("f"))
      .as[(Long, Seq[Float])].collect().toMap
    val batched = Multimodal.batchDecodeFeatures(
        m2, dim = 5, batchSize = 2, codec = Ppm.computeBatchStats)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(batched === perRow)
  }

  test("Wav: synth decodes to the closed-form stats; hand-built and malformed cases") {
    import graft.multimodal.Wav
    // synth formula round-trip
    for (id <- Seq(0L, 7L, 49L)) {
      val n = 50 + (id % 50)
      val vals = (0L until n).map(k => (id * 37 + k * 11) % 4001 - 2000)
      val st = Wav.decodeStats(Wav.synthPayload(id))
      assert(st != null)
      assert((0 until 5).map(st.getLong) ===
        Seq(1L, 8000L, n, vals.map(math.abs).sum, vals.map(math.abs).max))
    }
    // hand-built: stereo, junk chunk with ODD size (pad byte exercised),
    // negative samples read sign-correct little-endian
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val junk = "xtra".getBytes("US-ASCII") ++ le32(3) ++ "abc".getBytes("US-ASCII") ++
      Array[Byte](0) // odd size -> pad byte
    val data = "data".getBytes("US-ASCII") ++ le32(8) ++
      le16(-32768) ++ le16(32767) ++ le16(-1) ++ le16(0)
    val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ data
    val hand = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val st = Wav.decodeStats(hand)
    assert(st != null)
    assert((0 until 5).map(st.getLong) ===
      Seq(2L, 44100L, 4L, 32768L + 32767L + 1L, 32768L))
    // malformed -> null, each corruption class
    assert(Wav.decodeStats("RIFX".getBytes("US-ASCII") ++ hand.drop(4)) == null,
      "bad magic")
    assert(Wav.decodeStats(hand.dropRight(1)) == null, "data overruns payload")
    val nonPcm = hand.clone(); nonPcm(12 + junk.length + 8) = 3 // fmt code 3
    assert(Wav.decodeStats(nonPcm) == null, "non-PCM format")
    val bits8 = hand.clone(); bits8(12 + junk.length + 8 + 14) = 8
    assert(Wav.decodeStats(bits8) == null, "8-bit samples out of scope")
    // expression path: good decodes, garbage is null
    val df = Seq((1L, Wav.synthPayload(3L)), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
      .select($"id", Wav.stats($"payload").as("st")).orderBy("id").collect()
    assert(!df(0).isNullAt(1) && df(1).isNullAt(1))
  }

  test("Wav: audioSig64 span thresholds, chirp perturbation distance, strictness") {
    import graft.multimodal.Wav
    // reference signature straight from the documented definition
    def refSig(vals: Seq[Long]): Long = {
      val n = vals.length; val total = vals.sum
      (0 until 64).foldLeft(0L) { (bits, q) =>
        val s = (q.toLong * n / 64).toInt; val e = ((q + 1).toLong * n / 64).toInt
        val ws = vals.slice(s, e).sum
        if (ws * n > total * (e - s)) bits | (1L << q) else bits
      }
    }
    for (id <- Seq(0L, 7L, 28L)) {
      val n = 50 + (id % 50)
      val lin = (0L until n).map(k => math.abs((id * 37 + k * 11) % 4001 - 2000))
      assert(Wav.audioSig64(Wav.synthPayload(id)).longValue() === refSig(lin))
      val ch = (0L until n).map(k => math.abs((id * 37 + k * k * 11) % 4001 - 2000))
      assert(Wav.audioSig64(Wav.synthChirpPayload(id)).longValue() === refSig(ch))
      // a one-sample re-encode stays within a few Hamming bits
      val d = java.lang.Long.bitCount(
        Wav.audioSig64(Wav.synthChirpPayload(id)).longValue() ^
          Wav.audioSig64(Wav.synthChirpPerturbedPayload(id)).longValue())
      assert(d <= 4, s"id=$id perturbed distance $d")
    }
    // malformed -> null; trailing junk now rejected (strictness parity
    // with Ppm: the decode validates every chunk to the payload end)
    assert(Wav.audioSig64(Array[Byte](1, 2, 3)) == null)
    assert(Wav.decodeStats(Wav.synthPayload(5L) ++ Array[Byte](0)) == null,
      "trailing junk after the chunk list must quarantine")
  }

  test("PpmSeq: stream walk, stride sampling, malformed streams quarantine") {
    import graft.multimodal.PpmSeq
    for (id <- Seq(0L, 5L, 13L)) {
      val nf = 5
      val p = PpmSeq.synthPayload(id, nf)
      assert(PpmSeq.frameCount(p).longValue() === nf.toLong)
      val st = PpmSeq.sampleStats(p, 2)
      assert(st.numElements() === 3) // frames 0, 2, 4
      val w = 4 + (id % 5); val h = 3 + (id % 4)
      for ((f, i) <- Seq(0, 2, 4).zipWithIndex) {
        val row = st.getArray(i)
        assert(row.getLong(0) === f.toLong)
        assert(row.getLong(1) === w && row.getLong(2) === h)
        val exp = (0 until 3).map(c =>
          (0L until w * h).map(px => (id * 31 + f * 13 + (3 * px + c) * 7) % 256).sum)
        assert((3 until 6).map(row.getLong) === exp)
      }
    }
    // stride 1 decodes every frame; stride > nFrames keeps frame 0 only
    val p3 = PpmSeq.synthPayload(3L, 3)
    assert(PpmSeq.sampleStats(p3, 1).numElements() === 3)
    assert(PpmSeq.sampleStats(p3, 7).numElements() === 1)
    // malformed: truncated last raster, trailing junk, garbage mid-stream
    assert(PpmSeq.frameCount(p3.dropRight(1)) == null, "truncated raster")
    assert(PpmSeq.frameCount(p3 ++ Array[Byte](42)) == null, "trailing junk")
    assert(PpmSeq.sampleStats(p3.dropRight(1), 2) == null,
      "sampling must not mask corruption in frames it skips")
    assert(PpmSeq.frameCount(Array.empty[Byte]) == null)
    // expression path: good streams decode, garbage is null
    val df = Seq((1L, PpmSeq.synthPayload(1L, 4)), (2L, Array[Byte](9, 9)))
      .toDF("id", "payload")
      .select($"id", PpmSeq.frames($"payload").as("nf"),
        PpmSeq.sampleStatsCol($"payload", 2).as("st"))
      .orderBy("id").collect()
    assert(df(0).getLong(1) === 4L && !df(0).isNullAt(2))
    assert(df(1).isNullAt(1) && df(1).isNullAt(2))
  }

  test("PpmSeq: frame aHashes key video near-dups; one corrupted frame drops one element") {
    import graft.multimodal.{Ppm, PpmSeq}
    val id = 7L
    val p = PpmSeq.synthPayload(id, 5)
    val fh = PpmSeq.frameAHashes(p, 2)
    assert(fh.numElements() === 3) // frames 0, 2, 4
    // each sampled frame's hash equals aHash64 of the standalone image
    // with the same pixel formula (frame-salted) — the grid arithmetic is
    // SHARED (Ppm.aHashRaster), so pin via a hand-built standalone frame
    val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
    for ((f, i) <- Seq(0, 2, 4).zipWithIndex) {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val img = header ++ Array.tabulate(3 * w * h)(j =>
        java.lang.Math.floorMod(id * 31 + f * 13 + j * 7, 256L).toByte)
      assert(fh.getLong(i) === Ppm.aHash64(img).longValue(), s"frame $f")
    }
    // corrupting frame 2 changes exactly the middle element
    val pert = PpmSeq.frameAHashes(PpmSeq.synthPerturbedPayload(id, 5, 2), 2)
    assert(pert.getLong(0) === fh.getLong(0) && pert.getLong(2) === fh.getLong(2))
    assert(pert.getLong(1) !== fh.getLong(1),
      "the corrupted frame's hash must move")
    // malformed stream quarantines
    assert(PpmSeq.frameAHashes(p.dropRight(1), 2) == null)
  }

  test("frameSampleFeatures yields one distinct vector per sampled frame") {
    val out = media.filter($"media_id" === 1L)
      .select(Multimodal.frameSampleFeatures(col("payload"), nFrames = 4, dim = 8).as("f"))
      .as[Seq[Seq[Float]]].head()
    assert(out.length === 4)
    assert(out.map(_.take(3)).distinct.length === 4) // frames differ
  }
}
