package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.functions.expr.{toCol, toExpr}

/** REAL multi-frame (video) container for the multimodal path — a PPM
  * stream: back-to-back binary-PPM (P6) frames, the Netpbm animation
  * convention (`ppmtoy4m` and the rest of the Netpbm toolchain consume
  * exactly this: each frame is a complete P6 image, the next frame's
  * header starts at the previous raster's last byte + 1). Like [[Ppm]]
  * (image) and [[Wav]] (audio), these operators genuinely PARSE bytes:
  * the frame walk re-runs the P6 header parser — comments, whitespace,
  * dimension/maxval validation — at every frame boundary and advances by
  * the decoded raster size, so the q186 gate tests a byte-level
  * multi-frame walker against analytic oracle arithmetic, never against
  * a second copy of itself. Frames may change dimensions mid-stream
  * (PPM streams allow it; the walk re-reads each header).
  *
  * Strictness follows the family convention: a stream whose last frame's
  * raster is truncated, or that carries trailing bytes after the final
  * raster, decodes to NULL (quarantine semantics — one corrupt media file
  * in a crawl flags its row, never kills the job).
  *
  * Frame-STRIDE sampling is the video analog of image thumbnailing: a
  * feature extractor over hours of video reads every k-th frame, not all
  * of them. [[sampleStats]] decodes only frames `0, stride, 2*stride, …`
  * — the skipped frames are WALKED (header parse + raster skip, no pixel
  * arithmetic) but never decoded, exactly the cost shape a real frame
  * sampler has on a seekable container.
  *
  * Reference analog: none — LLM-pipeline north-star scope: the video
  * member of the multimodal family, replacing the synthetic-payload
  * convention [[Multimodal.frameSampleFeatures]] stubbed (that hash-stub
  * form remains for codecs this container lacks).
  */
object PpmSeq {

  /** Deterministic synthetic PPM-stream payload for id-keyed fixtures:
    * `nFrames` frames of `w = 4 + id%5` by `h = 3 + id%4`, maxval 255,
    * frame f's raster byte `j = (id*31 + f*13 + j*7) mod 256` — the
    * [[Ppm.synthPayload]] formula salted by the frame index, so an
    * external SQL engine derives every per-frame channel sum without
    * parsing bytes. Frame 0's header carries a `#` comment line
    * (comment skipping exercised at a frame boundary); later frames use
    * the minimal header. */
  def synthPayload(id: Long, nFrames: Int): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= 10000, s"synthPayload: nFrames=$nFrames out of range")
    val w = (4 + java.lang.Math.floorMod(id, 5L)).toInt
    val h = (3 + java.lang.Math.floorMod(id, 4L)).toInt
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val header = (if (f == 0) s"P6\n# graft video $id\n$w $h\n255\n"
                    else s"P6\n$w $h\n255\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(header, 0, header.length)
      var j = 0
      val n = 3 * w * h
      while (j < n) {
        out.write(java.lang.Math.floorMod(id * 31L + f * 13L + j * 7L, 256L).toInt)
        j += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Walk the stream: absolute `(w, h, rasterOff)` per frame, or null if
    * any frame header is malformed, a raster is truncated, or bytes trail
    * the final raster. Shared by [[frameCount]] and [[sampleStats]]. */
  private def walk(b: Array[Byte]): java.util.ArrayList[Array[Int]] = {
    if (b == null || b.length == 0) return null
    val out = new java.util.ArrayList[Array[Int]]()
    var pos = 0
    while (pos < b.length) {
      val hd = Ppm.parseHeader(b, pos)
      if (hd == null) return null
      val w = hd(0); val h = hd(1); val off = hd(2)
      val rasterEnd = off + 3L * w * h
      if (rasterEnd > b.length) return null // truncated raster
      out.add(hd)
      pos = rasterEnd.toInt
    }
    out // pos == b.length exactly: the while condition guarantees it
  }

  /** Number of frames in the stream (every header parsed, every raster
    * size validated to the payload end), or null if malformed. */
  def frameCount(payload: Array[Byte]): java.lang.Long = {
    val fs = walk(payload)
    if (fs == null) null else java.lang.Long.valueOf(fs.size.toLong)
  }

  /** Frame-stride sampling with REAL per-frame decode: for frames
    * `0, stride, 2*stride, …` emit `[frame_idx, width, height, sum_r,
    * sum_g, sum_b]` (the [[Ppm.decodeStats]] stats prefixed by the frame
    * index) as `array<array<bigint>>`; skipped frames are walked but not
    * decoded. Null if the stream is malformed anywhere — sampling must
    * not mask corruption in frames it happens to skip. */
  def sampleStats(payload: Array[Byte], stride: Int): ArrayData = {
    require(stride >= 1, s"sampleStats: stride must be >= 1, got $stride")
    val fs = walk(payload)
    if (fs == null) return null
    val n = fs.size
    val out = new Array[Any]((n + stride - 1) / stride)
    var f = 0
    var o = 0
    while (f < n) {
      val hd = fs.get(f)
      val w = hd(0); val h = hd(1); val off = hd(2)
      var sr = 0L; var sg = 0L; var sb = 0L
      var j = off
      val end = off + 3 * w * h
      while (j + 2 < end) {
        sr += payload(j) & 0xFF
        sg += payload(j + 1) & 0xFF
        sb += payload(j + 2) & 0xFF
        j += 3
      }
      out(o) = new GenericArrayData(
        Array[Any](f.toLong, w.toLong, h.toLong, sr, sg, sb))
      o += 1
      f += stride
    }
    new GenericArrayData(out)
  }

  /** [[synthPayload]] with frame `pertFrame`'s raster byte 0 shifted by
    * 128 mod 256 — the deterministic "re-encoded copy" fixture for VIDEO
    * near-dup gates (the [[Ppm.synthPerturbedPayload]] convention at the
    * frame level): same clip identity, one corrupted frame, so the
    * perturbed frame's [[Ppm.aHashRaster]] moves while every other
    * frame's hash is bit-identical — frame-SET similarity drops by
    * exactly one element. */
  def synthPerturbedPayload(id: Long, nFrames: Int, pertFrame: Int): Array[Byte] = {
    require(pertFrame >= 0 && pertFrame < nFrames,
      s"synthPerturbedPayload: frame $pertFrame outside [0, $nFrames)")
    val p = synthPayload(id, nFrames)
    val off = walk(p).get(pertFrame)(2)
    p(off) = (((p(off) & 0xFF) + 128) % 256).toByte
    p
  }

  /** Per-sampled-frame perceptual hashes: [[Ppm.aHashRaster]] of frames
    * `0, stride, 2*stride, …` as `array<bigint>` — the frame-hash SET a
    * video-level near-dup join keys on (two clips sharing most sampled
    * frame hashes are re-encodes/trims of each other; a corrupted or
    * edited frame changes exactly its own element). Skipped frames are
    * walked, not hashed. Null if the stream is malformed anywhere. */
  def frameAHashes(payload: Array[Byte], stride: Int): ArrayData = {
    require(stride >= 1, s"frameAHashes: stride must be >= 1, got $stride")
    val fs = walk(payload)
    if (fs == null) return null
    val n = fs.size
    val out = new Array[Any]((n + stride - 1) / stride)
    var f = 0
    var o = 0
    while (f < n) {
      val hd = fs.get(f)
      out(o) = Ppm.aHashRaster(payload, hd(0), hd(1), hd(2))
      o += 1
      f += stride
    }
    new GenericArrayData(out)
  }

  /** `ppmseq_synth(id, nFrames)` as a column. */
  def synth(id: Column, nFrames: Int): Column =
    toCol(PpmSeqSynth(toExpr(id), nFrames))

  /** `ppmseq_synth_perturbed(id, nFrames, pertFrame)` as a column. */
  def synthPerturbed(id: Column, nFrames: Int, pertFrame: Int): Column =
    toCol(PpmSeqSynthPerturbed(toExpr(id), nFrames, pertFrame))

  /** `ppmseq_frame_ahashes(payload, stride)` as a column: `array<bigint>`
    * of per-sampled-frame perceptual hashes, null when malformed. */
  def frameAHashesCol(payload: Column, stride: Int): Column =
    toCol(PpmSeqFrameAHashes(toExpr(payload), stride))

  /** `ppmseq_frames(payload)` as a column: frame count, null when the
    * stream is not a valid P6 sequence. */
  def frames(payload: Column): Column = toCol(PpmSeqFrames(toExpr(payload)))

  /** `ppmseq_sample_stats(payload, stride)` as a column:
    * `array<array<bigint>>` of `[frame_idx, w, h, sum_r, sum_g, sum_b]`
    * per sampled frame, null when the stream is malformed. */
  def sampleStatsCol(payload: Column, stride: Int): Column =
    toCol(PpmSeqSampleStats(toExpr(payload), stride))
}

/** Codegen'd synthetic PPM-stream generator (see [[PpmSeq.synthPayload]]). */
case class PpmSeqSynth(child: Expression, nFrames: Int) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppmseq_synth"
  override def nullSafeEval(id: Any): Any =
    PpmSeq.synthPayload(id.asInstanceOf[Long], nFrames)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.multimodal.PpmSeq.synthPayload($id, $nFrames)")
  override protected def withNewChildInternal(c: Expression): PpmSeqSynth =
    copy(child = c)
}

/** Codegen'd perturbed PPM-stream generator (see
  * [[PpmSeq.synthPerturbedPayload]]). */
case class PpmSeqSynthPerturbed(child: Expression, nFrames: Int, pertFrame: Int)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppmseq_synth_perturbed"
  override def nullSafeEval(id: Any): Any =
    PpmSeq.synthPerturbedPayload(id.asInstanceOf[Long], nFrames, pertFrame)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"graft.multimodal.PpmSeq.synthPerturbedPayload($id, $nFrames, $pertFrame)")
  override protected def withNewChildInternal(c: Expression): PpmSeqSynthPerturbed =
    copy(child = c)
}

/** Codegen'd per-sampled-frame perceptual hashes (see
  * [[PpmSeq.frameAHashes]]); malformed streams are null, not errors —
  * quarantine semantics. */
case class PpmSeqFrameAHashes(child: Expression, stride: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ppmseq_frame_ahashes"
  override def nullSafeEval(payload: Any): Any =
    PpmSeq.frameAHashes(payload.asInstanceOf[Array[Byte]], stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => s"""
      |${ev.value} = graft.multimodal.PpmSeq.frameAHashes($p, $stride);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): PpmSeqFrameAHashes =
    copy(child = c)
}

/** Codegen'd validating frame count (see [[PpmSeq.frameCount]]);
  * malformed streams are null, not errors — quarantine semantics. */
case class PpmSeqFrames(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ppmseq_frames"
  override def nullSafeEval(payload: Any): Any =
    PpmSeq.frameCount(payload.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val boxed = ctx.freshName("nframes")
      s"""
         |java.lang.Long $boxed = graft.multimodal.PpmSeq.frameCount($p);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): PpmSeqFrames =
    copy(child = c)
}

/** Codegen'd frame-stride sampling decode (see [[PpmSeq.sampleStats]]);
  * malformed streams are null, not errors — quarantine semantics. */
case class PpmSeqSampleStats(child: Expression, stride: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ppmseq_sample_stats"
  override def nullSafeEval(payload: Any): Any =
    PpmSeq.sampleStats(payload.asInstanceOf[Array[Byte]], stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => s"""
      |${ev.value} = graft.multimodal.PpmSeq.sampleStats($p, $stride);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): PpmSeqSampleStats =
    copy(child = c)
}
