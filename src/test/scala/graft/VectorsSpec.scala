package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, Vectors}

class VectorsSpec extends SparkSpecBase {
  import spark.implicits._

  test("cosineSim matches a hand-computed value and handles edge cases") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0),
      (Array(1f, 0f, 0f), Array(1f, 1f, 0f), 1.0 / math.sqrt(2)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 0f), 0.0), // zero-norm → 0
    ).toDF("a", "b", "expected")
    df.select(abs(Vectors.cosineSim($"a", $"b") - $"expected").as("d"))
      .collect().foreach(r => assert(r.getDouble(0) < 1e-12))
  }

  test("corrupted vectors score 0.0 and never hijack a ranking") {
    // a failed encoder emits NaN/Inf components at corpus scale;
    // Spark's double ordering puts NaN ABOVE every real value, so an
    // unguarded NaN cosine would top every ANN ranking — the kernel's
    // contract is a total, finite score domain instead
    val good = Array(1f, 2f, 3f)
    val df = Seq(
      (Array(Float.NaN, 1f, 0f), good),
      (Array(Float.PositiveInfinity, 1f, 0f), good),
      (Array(0f, 0f, 0f), good),
    ).toDF("a", "b")
    val scores = df.select(
        Vectors.cosineSim($"a", $"b").as("k"),
        Vectors.cosineHof($"a", $"b").as("h"))
      .collect()
    scores.foreach { r =>
      assert(r.getDouble(0) == 0.0, "codegen kernel must score 0.0")
      assert(r.getDouble(1) == 0.0, "HOF reference must agree")
    }
    // ordering check: the corrupted vector ranks BELOW a real match
    val ranked = Seq(
      (1L, Array(Float.NaN, 1f, 0f)),
      (2L, Array(1f, 2f, 3f))).toDF("id", "v")
      .select($"id", Vectors.cosineSim($"v", typedLit(good)).as("c"))
      .orderBy($"c".desc).collect().map(_.getLong(0))
    assert(ranked.head == 2L, "real match must outrank the corrupted row")
  }

  test("cosineSim null propagation") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(Vectors.cosineSim($"a", $"b")).head().isNullAt(0))
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val e = graft.core.Tables(spark, Sf).embeddings.limit(100)
    val d = e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .limit(500)
      .select(abs(Vectors.cosineSim(col("x.embedding"), col("y.embedding")) -
        Vectors.cosineHof(col("x.embedding"), col("y.embedding"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(d < 1e-9)
  }

  test("rollingFingerprint is deterministic and content-sensitive") {
    val df = Seq(("a b  c", 1), ("a b c", 2), ("a b d", 3)).toDF("t", "i")
    val fps = df.select(TextAnalysis.rollingFingerprint(col("t"))).collect()
      .map(_.getLong(0))
    assert(fps(0) == fps(1), "whitespace-normalized texts must collide")
    assert(fps(0) != fps(2), "different content must differ")
  }
}
