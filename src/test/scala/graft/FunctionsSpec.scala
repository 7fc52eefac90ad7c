package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashingScheme, LshBucket, TopKPairs}

/** Unit specs for the native Catalyst expressions and hashing scheme. */
class FunctionsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def register() = graft.functions.VectorExpressions.register(spark)

  test("cosine_sim: known values, null propagation, codegen/interpreted parity") {
    register()
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(1.0, 2.0), Array(3.0, 4.0)),
    ).toDF("a", "b")
    val got = df.selectExpr("round(cosine_sim(a, b), 9) AS c").collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 11.0 / (math.sqrt(5) * 5)) < 1e-9)
    val withNull = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
      .selectExpr("cosine_sim(a, b)").collect()
    assert(withNull.head.isNullAt(0))
  }

  test("kmin_distinct: k smallest distinct values, ascending, merge-safe") {
    register()
    // duplicates across groups' rows must COLLAPSE, not crowd the sketch
    val df = Seq(
      ("g", Seq(5L, 3L, 9L)),
      ("g", Seq(3L, 1L, 7L)),
      ("g", Seq(1L, 8L, 2L)),
      ("h", Seq(4L))
    ).toDF("g", "arr")
    val got = df.groupBy("g").agg(expr("kmin_distinct(arr, 3)").as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("g") == Seq(1L, 2L, 3L))
    assert(got("h") == Seq(4L)) // under k: exact distinct set
    // agrees with the declarative chain on a larger random-ish input
    val big = (1 to 500).map(i => (i % 7, Seq((i * 131L) % 97, (i * 37L) % 97)))
      .toDF("g", "arr")
    val a = big.groupBy("g")
      .agg(expr("kmin_distinct(arr, 5)").as("s")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val b = big.groupBy("g")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("arr"))))), 1, 5).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("q43 KMV estimates land within the sketch error bound of exact counts") {
    val est = operators.Relational.q43ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // KMV relative standard error ≈ 1/√(k−2) ≈ 6.3% at k = 256; assert
    // a 4σ band (saturated), exactness below saturation
    val band = 4.0 / math.sqrt(operators.Relational.KmvK - 2.0)
    for ((rf, (eo, ep)) <- est; (xo, xp) = exact(rf)) {
      def ok(e: Double, x: Long): Boolean =
        if (x < operators.Relational.KmvK) e == x.toDouble
        else math.abs(e - x) / x < band
      assert(ok(eo, xo), s"$rf orders: est $eo vs exact $xo")
      assert(ok(ep, xp), s"$rf parts: est $ep vs exact $xp")
    }
  }

  test("lsh_bucket: deterministic, seed-sensitive, within range") {
    register()
    val df = Seq(Tuple1(Array.tabulate(64)(i => math.sin(i.toDouble)))).toDF("v")
    val b1 = df.selectExpr("lsh_bucket(v, 6, 64, 0)").head.getInt(0)
    val b2 = df.selectExpr("lsh_bucket(v, 6, 64, 0)").head.getInt(0)
    val b3 = df.selectExpr("lsh_bucket(v, 6, 64, 1)").head.getInt(0)
    assert(b1 == b2)
    assert(b1 >= 0 && b1 < 64)
    assert(b3 >= 0 && b3 < 64)
    // planes are ±1 and stable
    val p = LshBucket.planes(2, 4, 0)
    assert(p.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(p.map(_.toSeq).toSeq == LshBucket.planes(2, 4, 0).map(_.toSeq).toSeq)
  }

  test("top_k_pairs: keeps k largest with deterministic tie-breaks across partitions") {
    register()
    val rows = (1L to 1000L).map(i => (i % 7, (i % 13).toDouble, i))
    val df = rows.toDF("g", "ord", "p").repartition(11)
    val got = df.groupBy("g").agg(expr("top_k_pairs(ord, p, 3)").as("t"))
      .select(col("g"), explode(col("t")).as("e"))
      .select(col("g"), col("e.ord"), col("e.payload"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    // expected via plain Scala
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy { case (o, p) => (-o, p) }.take(3)
        .map { case (o, p) => (g, o, p) }
    }.toSet
    assert(got == expected)
  }

  test("vint_pack/vint_unpack: exact round-trip, 1-byte small gaps, multi-byte boundaries") {
    register()
    val cases = Seq(
      Seq[Long](),
      Seq(0L),
      Seq(5L, 6L, 7L, 200L),
      Seq(0L, 127L, 128L, 16383L, 16384L, 2097151L, 2097152L),
      (0L until 1000L by 7L).toSeq,
      Seq(1234567890123L, 1234567890124L)) // large absolute, tiny gap
    val df = cases.zipWithIndex.map { case (c, i) => (i, c) }.toDF("i", "ids")
    val got = df.selectExpr("i", "vint_unpack(vint_pack(ids)) AS back",
        "length(vint_pack(ids)) AS nb")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1), r.getInt(2))).toSeq
      .sortBy(_._1)
    got.zip(cases).foreach { case ((_, back, _), orig) => assert(back == orig) }
    // ascending dense ids ⇒ ~1 byte per gap; 143 ids starting at 0:
    // first byte + 142 single-byte gaps
    assert(got(4)._3 == 143)
    // 2097152 needs 4 LEB128 bytes as a raw first value... but here it
    // arrives as a gap of 1 after 2097151: boundary values split as
    // 1 + 1 + 1 + 2 + 1 + 3 + 1 = absolute(0)=1, then gaps
    // 127(1) 1(1) 16255(2) 1(1) 2080767(3) 1(1) = 10 bytes total
    assert(got(3)._3 == 10)
    // unsorted input must fail loudly, not encode garbage
    val ex = intercept[Exception] {
      Seq(Seq(5L, 3L)).toDF("ids").selectExpr("vint_pack(ids)").collect()
    }
    assert(ex.getMessage != null)
    // null elements would silently read as 0 via getLong — reject them
    val exNull = intercept[Exception] {
      spark.sql("SELECT vint_pack(array(0L, CAST(NULL AS BIGINT)))").collect()
    }
    assert(exNull.getMessage != null)
    // truncated varint (dangling continuation bit) fails cleanly
    val exTrunc = intercept[Exception] {
      Seq(Array(0x80.toByte)).toDF("b").selectExpr("vint_unpack(b)").collect()
    }
    assert(exTrunc.getMessage != null)
  }

  test("boolean_retrieval_compressed: identical hits via the encoded postings; decode is in-plan") {
    val sf = "/root/testdata/sf0.001"
    val compressed = operators.TextAnalytics.booleanRetrievalCompressed(spark, sf)
    // the doc ids must genuinely flow through vint_unpack over the
    // BINARY column — assert the decode survives into the final plan
    val plan = compressed.queryExecution.optimizedPlan.toString
    assert(plan.contains("vint_unpack"), s"decode not in plan:\n$plan")
    assert(plan.contains("vint_pack"), s"encode not in plan:\n$plan")
    val a = compressed.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = operators.TextAnalytics.booleanRetrieval(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("vint codec round-trips 500 seeded-random sorted arrays (property sweep)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(60)
      val xs = Array.fill(n)(math.abs(rnd.nextLong()) / 2).sorted
      val back = graft.functions.VIntCodec
        .unpack(graft.functions.VIntCodec.pack(new GenericArrayData(xs)))
        .toLongArray
      assert(back.sameElements(xs))
    }
  }

  test("hash32 equals the documented md5-prefix derivation") {
    val got = Seq("hello").toDF("s")
      .select(graft.functions.TextFns.hash32(col("s"))).head.getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hello".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    assert(got == java.lang.Long.parseLong(hex, 16))
  }

  test("EmbLsh.suggestedBits scales with log(corpus) and floors at the verified default") {
    import graft.functions.EmbLsh
    assert(EmbLsh.suggestedBits(1) == EmbLsh.Bits)
    assert(EmbLsh.suggestedBits(500) == EmbLsh.Bits)       // test corpus → default
    assert(EmbLsh.suggestedBits(1000000) == 12)            // 1M docs → 2^12 buckets
    assert(EmbLsh.suggestedBits(1000000000L) == 22)        // 1B docs → 2^22 buckets
    val sizes = Seq(1L, 1000L, 1000000L, 1000000000L)
    val bits = sizes.map(n => EmbLsh.suggestedBits(n))
    assert(bits == bits.sorted)
    // the near-dup budget (dedup_embedding) splits the test SFs:
    // 500 docs stay at the floor, 2000 docs take the 5-bit dynamic arm
    assert(EmbLsh.suggestedBits(500, budgetLog2 = 6) == 4)
    assert(EmbLsh.suggestedBits(2000, budgetLog2 = 6) == 5)
  }

  test("minhash permutation constants stay within the no-overflow envelope") {
    (0 until HashingScheme.NumHashes).foreach { i =>
      assert(HashingScheme.a(i) > 0 && HashingScheme.a(i) < HashingScheme.P)
      assert(HashingScheme.b(i) >= 0 && HashingScheme.b(i) < HashingScheme.P)
    }
  }

  test("common_prefix_length equals the substring-compare formula (ASCII property sweep + multi-byte)") {
    register()
    // the formula this expression replaced in the suffix tier
    // (operators/SuffixArray.scala, r16): char-wise prefix equality.
    // cap must exceed any generated string length — the expression is
    // uncapped (its suffix-tier inputs are pre-sliced to LcpCap), the
    // reference formula is not
    val cap = 200
    val rnd = new scala.util.Random(451)
    def randStr(): String = {
      val n = rnd.nextInt(74)
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString // 3-letter alphabet forces long shared prefixes
    }
    val cases = (0 until 400).map { _ =>
      val a = randStr()
      // half the pairs share a forced common prefix of a
      val b = if (rnd.nextBoolean()) a.take(rnd.nextInt(a.length + 1)) + randStr() else randStr()
      (a, b)
    } ++ Seq(("", ""), ("", "x"), ("abc", "abc"), ("abc", "ab"),
      // multi-byte: é = 2 bytes, 日 = 3 bytes; partial-codepoint mismatch
      ("caféX", "caféY"), ("日本", "日語"), ("é", "ê"))
    val df = cases.toDF("a", "b")
    val got = df.selectExpr(
      "common_prefix_length(a, b) AS fast",
      s"size(filter(sequence(1, $cap), j -> j <= least(length(a), length(b))" +
        " AND substring(a, 1, j) = substring(b, 1, j))) AS ref").collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on ${r}")
    }
    // interpreted path agrees with codegen (nullSafeEval vs doGenCode)
    cases.foreach { case (a, b) =>
      val e = graft.functions.CommonPrefixLength(
        org.apache.spark.sql.catalyst.expressions.Literal(a),
        org.apache.spark.sql.catalyst.expressions.Literal(b))
      val interp = e.eval(null).asInstanceOf[Int]
      val expect = (0 to math.min(a.length, b.length)).takeWhile(j => a.take(j) == b.take(j)).last
      assert(interp == expect, s"interpreted lcp($a, $b) = $interp, want $expect")
    }
    // null propagation
    val withNull = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("common_prefix_length(a, b)").collect()
    assert(withNull.head.isNullAt(0))
  }
}
