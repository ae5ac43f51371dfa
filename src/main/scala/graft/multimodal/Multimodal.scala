package graft.multimodal

import graft.functions.expr.{toCol, toExpr}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video are opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction run
  * as narrow per-row expressions (or `mapPartitions` for batchy codecs).
  *
  * Two codecs back this surface: [[graft.multimodal.Ppm]] is a REAL
  * byte-level image decoder (binary PPM: header parse + integer pixel
  * stats + nearest-neighbor resize — q178/q179), and [[FakeDecode]] is
  * the deterministic hash stand-in for the embed-style float-feature
  * codecs this container lacks (JPEG+CLIP, audio+spectrogram); the
  * Spark-side contract (schema, batch shape, partitioning, null
  * handling) is identical for both, so swapping a production decoder in
  * means supplying another `(payloads, dim) => features` batch fn.
  */
object Multimodal {

  /** media table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),          // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))), nullable = true)))

  /** Wrap a text/binary-bearing DataFrame into the media shape (payload =
    * utf-8 bytes of `textCol`) — used to exercise the pipeline on the
    * driver's text fixtures where no real binary media exists.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        // byte length of the UTF-8 payload, not the character count —
        // they differ for any non-ASCII text
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height")).as("meta"))

  /** STUB decode: deterministic `array<float>` features from the payload
    * bytes. Replace `FakeDecode.compute` with a real codec call.
    */
  def decodeFeatures(payload: Column, dim: Int): Column =
    toCol(FakeDecode(toExpr(payload), Literal(dim)))

  /** Video frame sampling (STUB — hash-codec form): every-kth-frame
    * features as `array<array<float>>`, frame f's features being the
    * payload features salted by the frame index. Exercises the
    * nested-array schema a real frame sampler produces for container
    * formats this environment cannot decode. The REAL video member is
    * [[PpmSeq.sampleStats]]: a genuine multi-frame container (PPM
    * stream) walked frame-by-frame through the byte-level P6 parser,
    * with stride sampling that decodes only the sampled frames (q186).
    */
  def frameSampleFeatures(payload: Column, nFrames: Int, dim: Int): Column =
    array((0 until nFrames).map(f =>
      toCol(FakeDecode(toExpr(concat(payload, encode(lit(f"frame$f%04d"), "UTF-8"))),
        Literal(dim)))): _*)

  /** Image resize (STUB): produces a deterministic payload of the size a
    * real `width x height` re-encode would manage (derived bytes, not a
    * real codec) and rewrites the metadata struct — the schema/meta
    * contract of a resize stage for formats this container cannot
    * decode. For PPM payloads [[Ppm.resize]] is the REAL pixel resize.
    */
  def resizeStub(media: DataFrame, width: Int, height: Int): DataFrame =
    media
      .withColumn("payload",
        // deterministic derived bytes, ~3 bytes/pixel upper bound
        substring(concat(col("payload"), col("payload")), 1,
          math.min(width * height * 3, 4096)))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        col("meta.mime").as("mime"),
        lit(width).as("width"),
        lit(height).as("height")))

  /** Batched decode over partitions — the Scala analog of `mapInPandas`:
    * rows are buffered into fixed-size batches per partition and handed to
    * a batch codec (GPU decoders and Python interop want batch calls, not
    * per-row calls). `codec` receives `Array[Array[Byte]]` and returns
    * one feature row per payload (null in → null out): the default is
    * the [[FakeDecode]] hash stub; pass [[Ppm.computeBatchStats]] to run
    * the REAL P6 decoder through the same batch contract (MultimodalSpec
    * pins batch == per-row expression for both). The batching, iterator
    * discipline (no per-partition materialization of more than
    * `batchSize` payloads), and output schema are the contract.
    * Input: media-shaped frame. Output adds `features`.
    */
  def batchDecodeFeatures(media: DataFrame, dim: Int, batchSize: Int = 64,
      codec: (Array[Array[Byte]], Int) => Array[Array[Float]] =
        FakeDecode.computeBatch): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = media.schema.add(StructField("features",
      ArrayType(FloatType, containsNull = false), nullable = true))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec call per batch — this is where a real decoder would
        // receive Array[Array[Byte]] and return Array[Array[Float]]
        val feats = codec(
          batch.map(r => r.getAs[Array[Byte]](payloadIdx)).toArray, dim)
        batch.iterator.zipWithIndex.map { case (r, i) =>
          val f = if (feats(i) == null) null else feats(i).toSeq
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }
  }
}

/** Deterministic fake feature extractor: feature i = normalized xxhash of
  * (payload bytes, i). Stands in for image-decode + embed; keeps the
  * whole-stage-codegen path that a native decoder binding would use.
  */
case class FakeDecode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "fake_decode"

  override def nullSafeEval(payload: Any, dim: Any): Any =
    FakeDecode.compute(payload.asInstanceOf[Array[Byte]], dim.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, d) => s"graft.multimodal.FakeDecode.compute($p, $d)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FakeDecode =
    copy(left = l, right = r)
}

object FakeDecode {

  /** >>> STUB <<< — batch form a real (GPU/FFI) decoder would implement;
    * null payloads yield null feature rows.
    */
  def computeBatch(payloads: Array[Array[Byte]], dim: Int): Array[Array[Float]] =
    payloads.map { p =>
      if (p == null) null
      else {
        val a = compute(p, dim)
        Array.tabulate(dim)(i => a.getFloat(i))
      }
    }

  /** >>> STUB <<< — deterministic stand-in for a real media decoder.
    * Feature i = FNV-1a-64 of (payload bytes ++ byte i) scaled to [-1, 1).
    * FNV-1a (public-domain spec) rather than xxhash so an external SQL
    * engine can recompute the features from the raw payload — the q33
    * DuckDB oracle re-derives them byte-for-byte.
    */
  def compute(payload: Array[Byte], dim: Int): ArrayData = {
    var base = 0xCBF29CE484222325L
    var j = 0
    while (j < payload.length) {
      base = (base ^ (payload(j) & 0xFFL)) * 0x100000001B3L
      j += 1
    }
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      // one more FNV step with the feature index as the trailing byte
      val h = (base ^ i.toLong) * 0x100000001B3L
      // map to [-1, 1)
      out(i) = java.lang.Float.valueOf((h.toDouble / Long.MaxValue.toDouble).toFloat)
      i += 1
    }
    new GenericArrayData(out)
  }
}
