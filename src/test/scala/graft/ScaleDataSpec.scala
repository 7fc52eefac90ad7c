package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the ScaleData replication harness (the sf1+ soak
  * builder): linear row scaling, referential integrity across the
  * key-offset copies, copy-0 identity, and the content perturbations
  * (distinct texts/vectors per copy, preserved vector norms). */
class ScaleDataSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val N = 3

  private lazy val dst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scale").toString
    ScaleData.build(spark, SparkSpec.Sf, d, N)
    d
  }

  test("scaling tables grow by exactly the copy factor; dims stay fixed") {
    def n(dir: String, t: String): Long = spark.read.parquet(s"$dir/$t.parquet").count()
    Seq("customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings").foreach { t =>
      assert(n(dst, t) == N * n(SparkSpec.Sf, t), s"$t row count")
    }
    Seq("region", "nation").foreach { t =>
      assert(n(dst, t) == n(SparkSpec.Sf, t), s"$t must stay dim-sized")
    }
  }

  test("referential integrity holds across copies (no dangling FKs)") {
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val o = spark.read.parquet(s"$dst/orders.parquet")
    val p = spark.read.parquet(s"$dst/part.parquet")
    val c = spark.read.parquet(s"$dst/customer.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count() == 0)
    assert(li.join(p, li("l_partkey") === p("p_partkey"), "left_anti").count() == 0)
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() == 0)
  }

  test("copy 0 is the original data verbatim; keys are globally unique") {
    val src = spark.read.parquet(s"${SparkSpec.Sf}/orders.parquet")
    val maxK = src.agg(max(col("o_orderkey"))).head().getLong(0)
    val copy0 = spark.read.parquet(s"$dst/orders.parquet")
      .filter(col("o_orderkey") <= maxK)
    assert(copy0.exceptAll(src).count() == 0 && src.exceptAll(copy0).count() == 0)
    val dd = spark.read.parquet(s"$dst/orders.parquet")
    assert(dd.select("o_orderkey").distinct().count() == dd.count())
  }

  test("per-copy perturbations: distinct texts, rotated vectors, norms preserved") {
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    // texts differ across copies (prefix token) but form near-dup families
    assert(docs.select("text").distinct().count() == docs.count()
      || docs.select("text").distinct().count() > docs.count() / N,
      "per-copy text prefixes must keep copies distinct")
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0,
      "n_chars must track the perturbed text")
    graft.functions.VectorExpressions.register(spark)
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
      .withColumn("nrm", expr("sqrt(dot_product(embedding, embedding))"))
    val (lo, hi) = (emb.agg(min("nrm")).head().getDouble(0),
      emb.agg(max("nrm")).head().getDouble(0))
    assert(lo > 0.999 && hi < 1.001, s"rotation must preserve unit norms ($lo, $hi)")
    assert(emb.select("embedding").distinct().count() > emb.count() / N,
      "cyclic rotation must produce distinct vectors per copy")
  }
}
