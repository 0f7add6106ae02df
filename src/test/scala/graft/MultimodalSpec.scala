package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("toMedia produces binary payload + typed metadata struct") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.toMedia(docs, "doc_id", "text")
    val row = m.select($"payload", $"meta.nBytes", $"meta.width").head()
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == "hello world")
    assert(row.getLong(1) == 11L)
    assert(row.getInt(2) >= 16)
  }

  test("extractFeatures checksum equals the expression-side poly hash") {
    val docs = Tables.load(spark, TestSession.sf, "documents").limit(50)
    val viaMap = Multimodal.extractFeatures(spark,
      Multimodal.toMedia(docs, "doc_id", "text"))
      .toDF().select($"doc_id", $"checksum")
    val viaExpr = docs.select($"doc_id",
      graft.functions.TextFunctions.polyHash($"text").as("expected"))
    val joined = viaMap.join(viaExpr, "doc_id")
    assert(joined.filter($"checksum" =!= $"expected").count() == 0)
    assert(joined.count() == 50)
  }

  test("embedding stub: 4 floats in [0,1], deterministic") {
    val docs = Seq((1L, "abc"), (2L, "abc")).toDF("doc_id", "text")
    val fs = Multimodal.extractFeatures(spark,
      Multimodal.toMedia(docs, "doc_id", "text")).collect()
    assert(fs.forall(_.embedding.length == 4))
    assert(fs.forall(_.embedding.forall(v => v >= 0f && v <= 1f)))
    assert(fs(0).embedding.toSeq == fs(1).embedding.toSeq)
  }
}
