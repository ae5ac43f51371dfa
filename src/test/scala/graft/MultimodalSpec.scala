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

  test("frameSampleFeatures yields one distinct vector per sampled frame") {
    val out = media.filter($"media_id" === 1L)
      .select(Multimodal.frameSampleFeatures(col("payload"), nFrames = 4, dim = 8).as("f"))
      .as[Seq[Seq[Float]]].head()
    assert(out.length === 4)
    assert(out.map(_.take(3)).distinct.length === 4) // frames differ
  }
}
