package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("decode is deterministic and schema-complete") {
    val media = Multimodal.mediaTable(Tables.documents(spark, Sf0001))
    assert(media.schema("content").dataType.typeName == "binary")
    val d1 = Multimodal.decodeAll(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    val d2 = Multimodal.decodeAll(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(d1 == d2)
    d1.values.foreach { m =>
      assert(m.width >= 16 && m.width < 80)
      assert(m.height >= 16 && m.height < 80)
      assert(Set("png", "jpeg", "webp").contains(m.format))
      assert(m.n_bytes > 0)
    }
  }

  test("frame offsets: stride sampling capped at maxFrames") {
    val media = Multimodal.mediaTable(Tables.documents(spark, Sf0001))
    val offs = media.select(
      Multimodal.frameOffsets(col("content"), stride = 10, maxFrames = 5)
        .as("f"), length(col("content")).as("len"))
      .collect()
    offs.foreach { r =>
      val frames = r.getSeq[Int](0)
      assert(frames.length <= 5 && frames.nonEmpty)
      assert(frames.head == 0)
      frames.zip(frames.tail).foreach { case (a, b) => assert(b - a == 10) }
    }
  }
}
