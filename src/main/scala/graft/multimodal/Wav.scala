package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.functions.expr.{toCol, toExpr}

/** REAL audio codec for the multimodal path — RIFF/WAVE with 16-bit PCM,
  * the dependency-free audio container: a `RIFF` header, a chunk list
  * (`fmt ` with the format record, arbitrary unknown chunks in between,
  * `data` with little-endian signed 16-bit samples). Like
  * [[graft.multimodal.Ppm]] for images, these operators genuinely PARSE
  * bytes: a decode walks the chunk list (skipping unknown chunks by
  * their declared size, honoring RIFF's odd-size pad byte), validates
  * the PCM format record, and reads interleaved little-endian samples
  * at the parsed offset — so the q183 gate tests a byte-level audio
  * decoder against analytic oracle arithmetic, never against a second
  * copy of itself.
  *
  * Decode output is integer sample statistics `[channels, sample_rate,
  * n_samples, sum_abs, peak_abs]` — exact integers, SQL-replayable for
  * synthetic payloads. Malformed payloads decode to NULL (quarantine
  * semantics, the [[Ppm]] convention): one corrupt file in a crawl
  * flags its row, never kills the job.
  *
  * Reference analog: none — LLM-pipeline north-star scope, the audio
  * member of the multimodal family next to PPM's image member.
  */
object Wav {

  /** Deterministic synthetic 16-bit mono PCM payload for id-keyed
    * fixtures: sample rate 8000, `n = 50 + id%50` samples, sample
    * `k = ((id*37 + k*11) mod 4001) - 2000`, with a junk chunk between
    * `fmt ` and `data` so decoding exercises unknown-chunk skipping.
    * Closed-form so an external SQL engine derives the expected stats
    * without parsing bytes. */
  def synthPayload(id: Long): Array[Byte] =
    synthWith(id, k => java.lang.Math.floorMod(id * 37L + k * 11L, 4001L) - 2000L)

  /** Quadratic-chirp synthetic payload — the NEAR-DUP fixture: sample
    * `k = ((id*37 + k*k*11) mod 4001) - 2000`. The linear [[synthPayload]]
    * stays the DECODE fixture (q183/q184), but its samples are a nearly
    * monotone sawtooth segment within a clip, which collapses every
    * clip's [[audioSig64]] into a contiguous-run bit pattern — a measured
    * 84% of cross-clip pairs landed within Hamming 6 of each other, i.e.
    * the fixture, not the fingerprint, was degenerate. The quadratic term
    * wraps the 4001 ring ~27 times per clip, so distinct clips measure
    * median Hamming 31 (1 of 406 cross pairs <= 6) while a one-sample
    * re-encode stays <= 2 bits — the separation a near-dup gate needs.
    * Still closed-form for the SQL oracle. */
  def synthChirpPayload(id: Long): Array[Byte] =
    synthWith(id, k => java.lang.Math.floorMod(id * 37L + k.toLong * k * 11L, 4001L) - 2000L)

  /** [[synthChirpPayload]] with sample 0 shifted by +1000 on the
    * 4001-value ring — the deterministic "re-encoded copy" fixture for
    * audio near-dup gates (the [[Ppm.synthPerturbedPayload]] convention):
    * same audio identity, one-sample delta, so its [[audioSig64]] lands a
    * few Hamming bits from the pristine one. Closed form: perturbed
    * sample 0 is `((id*37 + 3000) mod 4001) - 2000` (the chirp's k=0 term
    * vanishes), replayable in SQL. */
  def synthChirpPerturbedPayload(id: Long): Array[Byte] = {
    val p = synthChirpPayload(id)
    val dataOff = parsePcm(p)(2).toInt
    val v = java.lang.Math.floorMod(id * 37L + 3000L, 4001L) - 2000L
    p(dataOff) = (v & 0xFFL).toByte
    p(dataOff + 1) = ((v >> 8) & 0xFFL).toByte
    p
  }

  private def synthWith(id: Long, sampleAt: Int => Long): Array[Byte] = {
    val n = (50 + java.lang.Math.floorMod(id, 50L)).toInt
    val junk = "graft".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val junkPadded = junk.length + (junk.length & 1) // RIFF pads odd chunks
    val dataSize = 2 * n
    val riffSize = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    out.put("JUNK".getBytes("US-ASCII")).putInt(junk.length).put(junk)
    if ((junk.length & 1) == 1) out.put(0.toByte)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) {
      out.putShort(sampleAt(k).toShort)
      k += 1
    }
    out.array()
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a RIFF/WAVE 16-bit PCM payload to `[channels, sample_rate,
    * n_samples, sum_abs, peak_abs]` (LongType array; `n_samples` counts
    * frames x channels, i.e. every 16-bit sample), or null if malformed:
    * bad magic, a declared RIFF size disagreeing with the payload length,
    * truncated chunk list, missing/short `fmt `, non-PCM format,
    * bits != 16, a `data` chunk whose declared size runs past the payload
    * or is odd, or trailing bytes after the last chunk. Unknown chunks
    * are SKIPPED by declared size (with RIFF's odd-size pad byte),
    * exactly like a real reader — but the walk validates EVERY chunk's
    * declared size to the payload end, the same trailing-junk strictness
    * [[Ppm.decodeStats]] applies to rasters: a length mismatch anywhere
    * signals corruption, and a decoder that tolerates it hides it. */
  def decodeStats(payload: Array[Byte]): ArrayData = {
    val hd = parsePcm(payload)
    if (hd == null) return null
    val b = payload
    val dataOff = hd(2).toInt; val n = hd(3).toInt
    var sumAbs = 0L; var peak = 0L
    var k = 0
    while (k < n) {
      val v = (u16(b, dataOff + 2 * k).toShort).toLong // sign via Short
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      k += 1
    }
    new GenericArrayData(Array[Any](hd(0), hd(1), n.toLong, sumAbs, peak))
  }

  /** Shared chunk-walk + format validation behind [[decodeStats]] and
    * [[audioSig64]]: `[channels, sample_rate, data_offset, n_samples]`,
    * or null on any of the malformation classes the decode doc lists. */
  private def parsePcm(b: Array[Byte]): Array[Long] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
    if (u32(b, 4) != b.length - 8L) return null // declared RIFF size must match
    var pos = 12
    var channels = -1; var rate = -1L; var haveFmt = false
    var dataOff = -1; var dataLen = -1L
    while (pos + 8 <= b.length) {
      val id = tag(b, pos)
      val sz = u32(b, pos + 4)
      val body = pos + 8
      if (body + sz > b.length) return null // declared size overruns payload
      if (id == "fmt ") {
        if (sz < 16) return null
        val fmt = u16(b, body)
        channels = u16(b, body + 2)
        rate = u32(b, body + 4)
        val bits = u16(b, body + 14)
        if (fmt != 1 || bits != 16 || channels < 1 || rate < 1) return null
        haveFmt = true
      } else if (id == "data") {
        dataOff = body; dataLen = sz
      }
      pos = body + sz.toInt + (sz.toInt & 1) // RIFF pads odd chunks
    }
    if (pos != b.length) return null // partial chunk header / trailing junk
    if (!haveFmt || dataOff < 0) return null
    if ((dataLen & 1L) != 0L) return null // 16-bit samples: even byte count
    Array(channels.toLong, rate, dataOff.toLong, dataLen / 2)
  }

  /** Perceptual audio fingerprint — the WAV member of the signature
    * family next to [[Ppm.aHash64]]: split the interleaved 16-bit sample
    * stream into 64 equal spans (span q covers samples
    * `[q*n/64, (q+1)*n/64)`, integer arithmetic), sum |sample| per span,
    * and set bit q iff the span's mean energy strictly exceeds the global
    * mean — division-free as `sum_q * n > total * len_q`, so the whole
    * signature is exact-integer and SQL-replayable. Silence (or an empty
    * data chunk) hashes to 0; malformed payloads to null (quarantine
    * semantics).
    *
    * A re-encoded / lightly-edited copy changes a few spans' sums →
    * a few Hamming bits, so the signature plugs straight into the
    * chunk-pair multi-index machinery
    * ([[graft.dedup.NearDedup.simhashPairsFromSigs]]) — audio near-dup at
    * corpus scale without an all-pairs join, the exact path image aHash
    * takes (q182). The same two scale caveats as the image member apply
    * (structured chunks: low-entropy corpora concentrate buckets;
    * mega-cluster pairwise output is quadratic by definition — ask for
    * cluster representatives, not pairs). Overflow bound: the threshold
    * product is `<= 32767 * n^2`, in-range for `n` beyond 5e6 samples
    * (10+ minutes of 8 kHz mono) — long files should fingerprint per
    * segment anyway, which is also what near-dup detection wants. */
  def audioSig64(payload: Array[Byte]): java.lang.Long = {
    val hd = parsePcm(payload)
    if (hd == null) return null
    val b = payload
    val dataOff = hd(2).toInt; val n = hd(3).toInt
    if (n == 0) return java.lang.Long.valueOf(0L)
    val wsum = new Array[Long](64)
    var total = 0L
    var q = 0
    while (q < 64) {
      val start = (q.toLong * n / 64).toInt
      val end = ((q + 1).toLong * n / 64).toInt
      var k = start; var s = 0L
      while (k < end) {
        s += math.abs((u16(b, dataOff + 2 * k).toShort).toLong)
        k += 1
      }
      wsum(q) = s; total += s; q += 1
    }
    var bits = 0L
    q = 0
    while (q < 64) {
      val len = (q + 1).toLong * n / 64 - q.toLong * n / 64
      if (wsum(q) * n > total * len) bits |= (1L << q)
      q += 1
    }
    java.lang.Long.valueOf(bits)
  }

  /** `wav_synth(id)` as a column. */
  def synth(id: Column): Column = toCol(WavSynth(toExpr(id)))

  /** `wav_stats(payload)` as a column: `array<bigint>` `[channels,
    * sample_rate, n_samples, sum_abs, peak_abs]`, null when the payload
    * is not valid 16-bit PCM WAVE. */
  def stats(payload: Column): Column = toCol(WavStats(toExpr(payload)))

  /** `wav_sig(payload)` as a column: 64-bit perceptual audio fingerprint
    * (see [[audioSig64]]), null when the payload is malformed. */
  def sig(payload: Column): Column = toCol(WavSig(toExpr(payload)))

  /** `wav_synth_chirp(id)` as a column (the near-dup fixture). */
  def synthChirp(id: Column): Column = toCol(WavSynthChirp(toExpr(id)))

  /** `wav_synth_chirp_perturbed(id)` as a column. */
  def synthChirpPerturbed(id: Column): Column =
    toCol(WavSynthChirpPerturbed(toExpr(id)))
}

/** Codegen'd synthetic-WAV generator (see [[Wav.synthPayload]]). */
case class WavSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_synth"
  override def nullSafeEval(id: Any): Any = Wav.synthPayload(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.multimodal.Wav.synthPayload($id)")
  override protected def withNewChildInternal(c: Expression): WavSynth = copy(child = c)
}

/** Codegen'd WAVE/PCM decode to integer sample stats (see
  * [[Wav.decodeStats]]); malformed payloads are null, not errors. */
case class WavStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_stats"
  override def nullSafeEval(payload: Any): Any =
    Wav.decodeStats(payload.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => s"""
      |${ev.value} = graft.multimodal.Wav.decodeStats($p);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): WavStats = copy(child = c)
}

/** Codegen'd perceptual audio fingerprint (see [[Wav.audioSig64]]);
  * malformed payloads are null, not errors — quarantine semantics. */
case class WavSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "wav_sig"
  override def nullSafeEval(payload: Any): Any =
    Wav.audioSig64(payload.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val boxed = ctx.freshName("wavsig")
      s"""
         |java.lang.Long $boxed = graft.multimodal.Wav.audioSig64($p);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WavSig =
    copy(child = c)
}

/** Codegen'd chirp synthetic-WAV generator (see
  * [[Wav.synthChirpPayload]]). */
case class WavSynthChirp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_synth_chirp"
  override def nullSafeEval(id: Any): Any =
    Wav.synthChirpPayload(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.multimodal.Wav.synthChirpPayload($id)")
  override protected def withNewChildInternal(c: Expression): WavSynthChirp =
    copy(child = c)
}

/** Codegen'd perturbed chirp synthetic-WAV generator (see
  * [[Wav.synthChirpPerturbedPayload]]). */
case class WavSynthChirpPerturbed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_synth_chirp_perturbed"
  override def nullSafeEval(id: Any): Any =
    Wav.synthChirpPerturbedPayload(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.multimodal.Wav.synthChirpPerturbedPayload($id)")
  override protected def withNewChildInternal(c: Expression): WavSynthChirpPerturbed =
    copy(child = c)
}
