package graft

import org.apache.spark.sql.functions._
import graft.operators.Repetition

/** Hand-computed Gopher repetition signals on synthetic multi-line
  * docs — the sf corpora are single-line (line metrics degenerately 0)
  * and near-random (dup-ngram tier 0), so this spec is what actually
  * exercises those paths. */
class RepetitionSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def run(docs: Seq[(Long, String)]): Map[Long, Row] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Repetition.repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  test("duplicate line fraction and char fraction on multi-line docs") {
    // lines: ["x y", "x y", "z w"] — 1 of 3 is a repeat (3 of 9 chars)
    val out = run(Seq((0L, "x y\nx y\nz w"), (1L, "a b\nc d")))
    val r0 = out(0L)
    assert(r0.getDouble(r0.fieldIndex("dup_line_frac")) == 0.333333)
    assert(r0.getDouble(r0.fieldIndex("dup_line_char_frac")) == 0.333333)
    assert(r0.getBoolean(r0.fieldIndex("repetitive"))) // 0.333 > 0.30
    val r1 = out(1L)
    assert(r1.getDouble(r1.fieldIndex("dup_line_frac")) == 0.0)
    assert(r1.getDouble(r1.fieldIndex("dup_line_char_frac")) == 0.0)
  }

  test("top n-gram char fraction with deterministic tie-break") {
    // toks: c d c d e e e (7 chars). 2-grams: "c d"x2, "e e"x2 tie at
    // cnt=2 → lexicographically greatest gram "e e" wins (2 chars):
    // frac = 2*2/7 = 0.571429
    val out = run(Seq((0L, "c d c d e e e")))
    val r = out(0L)
    assert(r.getDouble(r.fieldIndex("top_2gram_char_frac")) == 0.571429)
    assert(r.getBoolean(r.fieldIndex("repetitive"))) // 0.571 > 0.20
  }

  test("top n-gram fraction caps at 1.0 when occurrences overlap") {
    // "a b a b a b": top 2-gram "a b"x3 covers 6/6 chars exactly; top
    // 4-gram "a b a b"x2 covers 8 of 6 chars → capped at 1.0
    val out = run(Seq((0L, "a b a b a b")))
    val r = out(0L)
    assert(r.getDouble(r.fieldIndex("top_2gram_char_frac")) == 1.0)
    assert(r.getDouble(r.fieldIndex("top_4gram_char_frac")) == 1.0)
  }

  test("duplicate 5-gram char fraction counts repeated long grams") {
    // "p q r s t p q r s t u": "p q r s t" occurs twice → dup chars =
    // 2*5 of 11 → 0.909091; no 6-gram repeats → 0
    val out = run(Seq((0L, "p q r s t p q r s t u")))
    val r = out(0L)
    assert(r.getDouble(r.fieldIndex("dup_5gram_char_frac")) == 0.909091)
    assert(r.getDouble(r.fieldIndex("dup_6gram_char_frac")) == 0.0)
    assert(r.getBoolean(r.fieldIndex("repetitive")))
  }

  test("docs shorter than n produce zero fractions, not missing rows") {
    val out = run(Seq((0L, "solo"), (1L, "")))
    assert(out.size == 2)
    val r = out(0L)
    assert(r.getDouble(r.fieldIndex("top_2gram_char_frac")) == 0.0)
    assert(r.getDouble(r.fieldIndex("dup_10gram_char_frac")) == 0.0)
    assert(!r.getBoolean(r.fieldIndex("repetitive")))
    assert(!out(1L).getBoolean(out(1L).fieldIndex("repetitive")))
  }

  test("sf corpus: single-line docs have zero line metrics, non-trivial top-gram tier") {
    val df = Repetition.repetition(spark, sf)
    val agg = df.agg(
      max(col("dup_line_frac")), max(col("top_2gram_char_frac")),
      count(lit(1))).head
    assert(agg.getDouble(0) == 0.0)
    assert(agg.getDouble(1) > 0.0)
    assert(agg.getLong(2) == spark.read
      .parquet(s"$sf/documents.parquet").count())
  }
}
