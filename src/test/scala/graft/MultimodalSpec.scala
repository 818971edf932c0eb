package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "an image payload"), (1L, "an audio payload"), (2L, "a video payload"),
    (3L, "another image")).toDF("doc_id", "text")

  test("media table: opaque binary + typed metadata, kind cycles by id") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.columns.toSeq == Seq("media_id", "kind", "media", "n_bytes"))
    assert(m.schema("media").dataType.typeName == "binary")
    val kinds = m.select("media_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
    val nb = m.filter($"media_id" === 0L).select("n_bytes").as[Long].head()
    assert(nb == "an image payload".getBytes("UTF-8").length)
  }

  test("stub decode is deterministic and batch-shaped") {
    val m = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(m).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(m, targetBytesPerPartition = 16L)
      .orderBy("media_id").collect()
    assert(f1.sameElements(f2)) // partitioning must not change results
    val video = f1.find(_.getString(1) == "video").get
    assert(video.getInt(5) >= 1) // n_frames
    assert(f1.forall(_.getAs[Seq[Float]]("embedding").length == 8))
  }

  test("extractFeatures sizes the shuffle by byte volume and spreads it") {
    // skewed corpus: 200 small payloads + one 50x outlier
    val skew = ((0 until 200).map(i => (i.toLong, "x" * 1000)) :+ (999L, "y" * 50000))
      .toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(skew)
    val target = 16384L
    val total = media.agg(sum("n_bytes")).as[Long].head()
    val expectParts = ((total + target - 1) / target).toInt
    val feats = Multimodal.extractFeatures(media, targetBytesPerPartition = target)
    assert(feats.rdd.getNumPartitions == expectParts)
    // actual per-partition byte sums: bounded by the indivisible max payload
    // plus a small multiple of the target (hash spread, not bin packing)
    val sums = feats.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum("n_bytes").as("b")).select("b").as[Long].collect()
    val maxPayload = 50000L
    assert(sums.max <= maxPayload + 4 * target,
      s"worst partition ${sums.max} bytes of target $target")
    // hash spread leaves at most a few partitions empty
    assert(sums.length >= expectParts - 3 && sums.length <= expectParts)
  }

  test("frame sample plan strides over stubbed frame counts") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
    val plan = Multimodal.frameSamplePlan(feats, stride = 10)
    val idx = plan.select("frame_indices").as[Seq[Long]].collect()
    assert(idx.nonEmpty && idx.forall(s => s.head == 0L && s.zip(s.tail).forall { case (a, b) => b - a == 10 }))
  }
}
