package graft

import graft.operators.Multimodal

/** The multimodal plumbing: schema, batch decode loop, and the
  * deterministic stub contract. */
class MultimodalSpec extends SparkSpecBase {

  test("blob synthesis keeps payloads distributed and typed") {
    val b = Multimodal.blobs(spark, Sf)
    assert(b.schema.fieldNames.toSeq == Seq("doc_id", "fmt", "payload"))
    assert(b.schema("payload").dataType.typeName == "binary")
    assert(b.count() == graft.core.Tables(spark, Sf).documents.count())
  }

  test("decodeMeta emits one metadata row per blob with stub fields") {
    val metas = Multimodal.decodeMeta(Multimodal.blobs(spark, Sf))
    val rows = metas.collect()
    assert(rows.length == 500)
    rows.foreach { m =>
      assert(Set("image", "audio", "video")(m.fmt))
      assert(m.width >= 64 && m.width < 64 + 512)
      assert(m.height >= 64 && m.height < 128)
      assert(if (m.fmt == "video") m.n_frames >= 1 else m.n_frames == 1)
      assert(m.size_bytes > 0)
    }
  }

  test("decodeBatch is deterministic (stub contract for the oracle)") {
    val blob = Multimodal.MediaBlob(7L, "video", "hello world".getBytes("UTF-8"))
    val a = Multimodal.decodeBatch(Seq(blob))
    val b = Multimodal.decodeBatch(Seq(blob))
    assert(a == b)
    assert(a.head.width == 64 + 11 && a.head.size_bytes == 11L)
  }
}
