package graft

import org.apache.spark.sql.functions._

/** The codegen-fallback sentinel must actually see a janino bailout —
  * r14's lesson was a 37 KB generated Filter running INTERPRETED for
  * multiple rounds with only one easily-missed WARN line as evidence
  * (SOAK_r14.md §3). Two arms:
  *  1. a plan whose single generated method exceeds the 64 KB janino
  *     limit (a non-splittable deeply-nested expression) must bump the
  *     counter when executed;
  *  2. the hugeMethodLimit WARN path ("whole-stage codegen was
  *     disabled for this plan") must bump it too — forced
  *     deterministically by lowering spark.sql.codegen.hugeMethodLimit
  *     on a cloned session so ANY codegen'd plan trips it.
  * And clean plans must NOT increment (no false positives). */
class CodegenSentinelSpec extends SparkSpec {

  test("clean plan leaves the counter untouched") {
    CodegenSentinel.install()
    CodegenSentinel.reset()
    spark.range(1000).selectExpr("sum(id)").collect()
    assert(CodegenSentinel.fallbackCount == 0)
  }

  test("hugeMethodLimit fallback is counted") {
    CodegenSentinel.install()
    CodegenSentinel.reset()
    val s = spark.newSession() // conf flip stays off the shared session
    val saved = s.conf.get("spark.sql.codegen.hugeMethodLimit")
    try {
      s.conf.set("spark.sql.codegen.hugeMethodLimit", "1")
      s.range(1000).filter(col("id") % 7 === 0)
        .selectExpr("sum(id * 3)").collect()
    } finally s.conf.set("spark.sql.codegen.hugeMethodLimit", saved)
    assert(CodegenSentinel.fallbackCount > 0,
      "lowered hugeMethodLimit must trip the whole-stage fallback WARN")
  }

  test("an over-64KB generated method is flagged (the r14 Louvain shape)") {
    CodegenSentinel.install()
    CodegenSentinel.reset()
    // a 6000-term OR chain inside one Filter generates a single
    // consume method janino rejects ("grows beyond 64 KB") — the same
    // failure mode as r14's constraint-exploded 37 KB Filter. The
    // query still RUNS (spark.sql.codegen.fallback interprets it);
    // silence is exactly the trap the sentinel exists to spring.
    val big = (1 to 6000).map(i => s"id % ${i + 1} = $i").mkString(" OR ")
    val n = spark.range(100).filter(expr(big)).count()
    assert(n == 99) // every id but 0 satisfies id % (id+1) = id
    assert(CodegenSentinel.fallbackCount > 0,
      "64KB-overflow plan executed without tripping the sentinel")
    CodegenSentinel.reset()
  }
}
