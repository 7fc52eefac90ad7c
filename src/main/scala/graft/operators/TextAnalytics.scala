package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Text analytics over the `documents` table.
  *
  * Reference semantics: a0/WordCountSimple.java (token frequency; the
  * `keyword` filter covers a0/PerfectX.java:52-77), a2/
  * ComputeBigramRelativeFrequencyPairs.scala:60-110 (P(w2|w1) per line),
  * a1/PairsPMI.java + a2/PairsPMI.scala:80-110 (pairwise PMI over the
  * first-40-distinct tokens per doc, count threshold), a3/
  * BuildInvertedIndexCompressed.java (term → df + (docno, tf) postings),
  * a3/BooleanRetrievalCompressed.java (AND retrieval over the index).
  *
  * Spark-first shape: tokenize ONCE into an array column (codegen'd
  * `split`), expand with `transform`/`explode` inside the row (no
  * shuffle), then a single groupBy whose map-side partial aggregation
  * means shuffle volume ∝ vocabulary, not corpus — the property that
  * makes these viable at 100 TB. The reference's PMI broadcasts a
  * collectAsMap of the vocabulary (driver OOM at scale); we keep word
  * counts as a DataFrame and let Catalyst/AQE choose broadcast vs
  * shuffle join by size.
  */
object TextAnalytics {
  val PmiTake      = 40
  val PmiThreshold = 10L
  val RetrievalTerms: Seq[String] = Seq("spark", "join", "fast")

  /** doc_id + whitespace token array (single tokenize point). */
  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  /** a0: corpus-wide token frequency. */
  def wordcount(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(explode(col("toks")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** a2: bigram relative frequency P(w2|w1); pairs built in-row via
    * `transform` over an index sequence — zero shuffle until the count. */
  def bigramRelFreq(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tokenized(spark, dir)
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_cnt"))
    pairs
      .withColumn("relfreq",
        round(col("pair_cnt") / sum(col("pair_cnt")).over(Window.partitionBy(col("w1"))), 6))
      .orderBy("w1", "w2")
  }

  /** Skip-gram windowed co-occurrence PMI (the word2vec/SGNS context
    * statistic, Levy & Goldberg's #(c,x)·|D|/(#(c)·#(x)) over the
    * ordered-pair corpus D): token pairs within ±[[SkipWindow]]
    * positions, both directions counted, canonical w1 ≤ w2 rows
    * emitted. Complements `pmi_pairs` (doc-level co-occurrence) with
    * the POSITIONAL window the embedding-training pipelines use.
    *
    * Scale: the position self-join fans out ≤ W rows per token (join
    * on doc_id with a band predicate — never doc²); marginals are one
    * groupBy; |D| rides as a broadcast 1-row agg. */
  val SkipWindow = 3
  val SkipThreshold = 5L
  def skipgramPmi(spark: SparkSession, dir: String): DataFrame =
    skipgramPmiOn(tokenized(spark, dir))

  /** The skip-gram core over any (doc_id, toks) frame — spec entry. */
  def skipgramPmiOn(docs: DataFrame): DataFrame = {
    val tk = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val jo = tk.as("a").join(tk.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
        col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + SkipWindow)
      .select(col("a.w").as("wa"), col("b.w").as("wb"))
    val ord = jo.select(col("wa").as("c"), col("wb").as("x"))
      .unionAll(jo.select(col("wb").as("c"), col("wa").as("x")))
    val d = ord.agg(count(lit(1)).as("dd"))
    val cents = ord.groupBy("c").agg(count(lit(1)).as("nc"))
    ord.groupBy("c", "x").agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= SkipThreshold && col("c") <= col("x"))
      .join(cents.select(col("c"), col("nc").as("na")), Seq("c"))
      .join(cents.select(col("c").as("x"), col("nc").as("nb")), Seq("x"))
      .crossJoin(broadcast(d))
      .select(col("c").as("w1"), col("x").as("w2"), col("n12"),
        round(log10((col("n12") * col("dd")) / (col("na") * col("nb"))), 6).as("pmi"))
      .orderBy("w1", "w2")
  }

  private lazy val skipgramOracle: String =
    s"""WITH tk AS MATERIALIZED (
            SELECT doc_id, s.pos AS pos, s.w AS w FROM (
              SELECT doc_id,
                     unnest([{'pos': i, 'w': toks[i]} for i in generate_series(1, len(toks))]) AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
            WHERE s.w <> ''),
          jo AS (SELECT a.w AS wa, b.w AS wb FROM tk a JOIN tk b
                 ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + $SkipWindow),
          ord AS MATERIALIZED (SELECT wa AS c, wb AS x FROM jo
                 UNION ALL SELECT wb, wa FROM jo),
          dt AS (SELECT count(*) AS dd FROM ord),
          cents AS (SELECT c, count(*) AS nc FROM ord GROUP BY 1),
          pr AS (SELECT c, x, count(*) AS n12 FROM ord GROUP BY 1, 2
                 HAVING count(*) >= $SkipThreshold)
        SELECT p.c AS w1, p.x AS w2, p.n12,
               round(log10((p.n12 * dt.dd) / (ca.nc * cx.nc)), 6) AS pmi
        FROM pr p JOIN cents ca ON p.c = ca.c JOIN cents cx ON p.x = cx.c, dt
        WHERE p.c <= p.x ORDER BY w1, w2"""

  /** a1/a2: PMI over co-occurring tokens (first 40, distinct, per doc). */
  def pmiPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = tokenized(spark, dir)
      .select(col("doc_id"), array_distinct(slice(col("toks"), 1, PmiTake)).as("s"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val words = docs.select(explode(col("s")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val pairs = docs
      .select(explode(expr(
        "flatten(transform(s, x -> transform(filter(s, y -> y != x), y -> struct(x AS w1, y AS w2))))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= PmiThreshold)
    // no broadcast hint on the vocabulary table: it scales with corpus
    // vocabulary, so AQE must stay free to pick shuffle joins when it
    // outgrows the broadcast threshold (the hint would recreate the
    // reference's driver-OOM failure mode at scale)
    pairs
      .join(words.select(col("w").as("w1"), col("wc").as("n1")), "w1")
      .join(words.select(col("w").as("w2"), col("wc").as("n2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n12"),
        round(log10((col("n12") * col("n_docs")) / (col("n1") * col("n2"))), 6).as("pmi"))
      .orderBy("w1", "w2")
  }

  /** a3: inverted index as a flat postings relation (term, doc_id, tf)
    * with per-term document frequency — the content the reference's
    * compressed MapFile encodes, in queryable columnar form. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .orderBy("term", "doc_id")

  /** a3/BuildInvertedIndexCompressed.java: gap + VInt-encoded postings,
    * here as a per-term BINARY column built by the native `vint_pack`
    * expression (first doc id absolute, then varint gaps). The output
    * row carries the encoded byte count — which the DuckDB oracle
    * recomputes from the gap widths independently, so the ENCODING SIZE
    * itself is cross-engine verified — plus content invariants
    * (df, id checksum, first/last) and an in-plan `vint_unpack`
    * round-trip flag. */
  def invertedIndexCompressed(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    tokenized(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .withColumn("enc", expr("vint_pack(ids)"))
      .select(col("term"),
        size(col("ids")).cast("long").as("df"),
        length(col("enc")).cast("long").as("n_bytes"),
        expr("aggregate(ids, 0L, (a, x) -> a + x)").as("checksum"),
        element_at(col("ids"), 1).as("first_doc"),
        element_at(col("ids"), -1).as("last_doc"),
        (expr("vint_unpack(enc)") === col("ids")).as("roundtrip_ok"))
      .orderBy("term")
  }

  /** a0/PerfectX.java:52-77: occurrences of one keyword across the
    * corpus (total hits + number of containing docs). */
  val Keyword = "spark"
  def keywordCount(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"),
        expr(s"size(filter(toks, t -> t = '$Keyword'))").as("hits"))
      .agg(
        sum(col("hits")).as("total_hits"),
        count(when(col("hits") > 0, 1)).as("n_docs"))
      .select(lit(Keyword).as("keyword"), col("total_hits"), col("n_docs"))

  /** Retrieved doc ids → (doc_id, text): the reference prints the
    * matching LINE for every hit (BooleanRetrievalCompressed.java:96-97,
    * fetchLine at :185-191), so both retrieval queries join the (small)
    * hit set back to `documents` — a narrow join on doc_id; at scale
    * the hit side broadcasts and the corpus never shuffles. */
  private def fetchText(spark: SparkSession, dir: String, hits: DataFrame): DataFrame =
    hits.join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .orderBy("doc_id")

  /** a3: conjunctive (AND) retrieval driven by the postings relation. */
  def booleanRetrieval(spark: SparkSession, dir: String): DataFrame =
    fetchText(spark, dir,
      tokenized(spark, dir)
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(RetrievalTerms: _*))
        .groupBy("doc_id").agg(countDistinct(col("term")).as("nt"))
        .filter(col("nt") === RetrievalTerms.length)
        .select("doc_id"))

  /** Positional inverted index as a flat postings relation: one row per
    * (term, doc, 1-based position) with per-(term, doc) tf — the index
    * layout phrase/proximity queries need, one `posexplode` past the
    * reference's (docno, tf) postings. Flat rather than array-valued:
    * the relation IS the postings list (ordered by position within each
    * posting), joins/filters compose on it directly, and the driver's
    * oracle gate compares scalar columns. Shuffle ∝ positions, with the
    * tf window riding the same (term, doc_id) partitioning. */
  def positionalIndex(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .select(col("term"), col("doc_id"), (col("pos") + 1).cast("long").as("pos"))
      .withColumn("tf",
        count(lit(1)).over(Window.partitionBy(col("term"), col("doc_id"))))
      .orderBy("term", "doc_id", "pos")

  /** Exact phrase retrieval over positional postings: term k of the
    * phrase must appear at position p+k for an anchor p of term 0 —
    * expressed as a chain of equi-joins on (doc_id, pos − k), so each
    * term's postings are filtered BEFORE joining and the join keys
    * co-partition; no window, no array intersection UDF. Returns each
    * matching doc with its phrase-occurrence count and text. */
  val PhraseTerms: Seq[String] = Seq("part", "filter")
  def phraseRetrieval(spark: SparkSession, dir: String,
                      phrase: Seq[String] = PhraseTerms): DataFrame = {
    require(phrase.nonEmpty, "phrase retrieval needs at least one term")
    val post = tokenized(spark, dir)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
    val anchors = phrase.zipWithIndex
      .map { case (t, k) =>
        post.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - k).as("pos"))
      }
      .reduce(_.join(_, Seq("doc_id", "pos")))
    val hits = anchors.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
    hits.join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("n_occurrences"), col("text"))
      .orderBy("doc_id")
  }

  /** Proximity retrieval — the unordered sibling of phrase match: docs
    * where the two terms co-occur within ProxWindow token positions, in
    * either order. One equi-join of the two filtered postings streams on
    * doc_id with a band predicate on the positions (no windows, no
    * arrays); reports the pair count and tightest gap per doc. */
  val ProxWindow = 5
  def proximityRetrieval(spark: SparkSession, dir: String,
                         t1: String = PhraseTerms.head,
                         t2: String = PhraseTerms.last,
                         w: Int = ProxWindow): DataFrame = {
    val post = tokenized(spark, dir)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
    val pa = post.filter(col("term") === t1).select(col("doc_id"), col("pos").as("pa"))
    val pb = post.filter(col("term") === t2).select(col("doc_id"), col("pos").as("pb"))
    pa.join(pb, "doc_id")
      .filter(abs(col("pa") - col("pb")) <= w && col("pa") =!= col("pb"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pa") - col("pb"))).cast("long").as("min_gap"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("n_pairs"), col("min_gap"), col("text"))
      .orderBy("doc_id")
  }

  /** a3/BooleanRetrievalCompressed.java:147-183 — the reference's actual
    * retrieval path: `fetchPostings` decodes the gap+VInt bytes of each
    * query term, then runQuery:80-96 intersects the decoded doc sets.
    * Composed here from the two existing halves: the index side packs
    * per-term sorted doc ids into the BINARY `enc` column (`vint_pack`),
    * the retrieval side sees ONLY (term, enc) — the plain ids array is
    * projected away — so the doc ids it intersects genuinely come out of
    * `vint_unpack` over the compressed bytes. The term filter sits on
    * the index's grouping key, so Catalyst prunes the pack/unpack work
    * to the query terms; at scale the enc column would be a persisted
    * postings table (see Tables.writeBucketed) read by term. */
  def booleanRetrievalCompressed(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val index = tokenized(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(RetrievalTerms: _*))
      .groupBy("term").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .select(col("term"), expr("vint_pack(ids)").as("enc"))
    val hits = index
      .select(col("term"), explode(expr("vint_unpack(enc)")).as("doc_id"))
      .groupBy("doc_id").agg(countDistinct(col("term")).as("nt"))
      .filter(col("nt") === RetrievalTerms.length)
      .select("doc_id")
    fetchText(spark, dir, hits)
  }

  /** a3/BooleanRetrievalCompressed.java:runQuery — stack-based postfix
    * boolean query evaluation ("a b AND c OR"): each term resolves to
    * its doc set from the postings; AND/OR intersect/union the top two
    * stack entries. Set algebra stays distributed (semi-joins/unions on
    * doc_id), so an arbitrarily nested query never leaves the cluster. */
  def postfixRetrieval(spark: SparkSession, dir: String, query: String): DataFrame = {
    val postings = tokenized(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("term"))
    var stack = List.empty[DataFrame]
    query.trim.split("\\s+").foreach {
      case "AND" =>
        val (b, a) = (stack.head, stack.tail.head)
        stack = a.join(b, Seq("doc_id"), "left_semi") :: stack.drop(2)
      case "OR" =>
        val (b, a) = (stack.head, stack.tail.head)
        stack = a.unionAll(b).distinct() :: stack.drop(2)
      case term =>
        stack = postings.filter(col("term") === term).select("doc_id").distinct() :: stack
    }
    require(stack.size == 1, s"malformed postfix query: $query")
    fetchText(spark, dir, stack.head)
  }

  /** Mixed AND/OR query as a verified QueryDef: (spark AND join) OR vector. */
  val PostfixQuery = "spark join AND vector OR"

  private val termList = RetrievalTerms.map(t => s"'$t'").mkString(", ")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("wordcount", wordcount, Some(
      """SELECT w AS word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> '' GROUP BY 1 ORDER BY word""")),
    QueryDef("bigram_relfreq", bigramRelFreq, Some(
      """WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
           p AS (SELECT u.b.w1 AS w1, u.b.w2 AS w2
                 FROM d, unnest([{'w1': toks[i], 'w2': toks[i+1]}
                                 for i in generate_series(1, len(toks) - 1)]) AS u(b)
                 WHERE len(toks) >= 2),
           c AS (SELECT w1, w2, count(*) AS pair_cnt FROM p GROUP BY 1, 2)
         SELECT w1, w2, pair_cnt,
                round(pair_cnt / (sum(pair_cnt) OVER (PARTITION BY w1)), 6) AS relfreq
         FROM c ORDER BY w1, w2""")),
    QueryDef("text_skipgram_pmi", skipgramPmi, Some(skipgramOracle)),
    QueryDef("pmi_pairs", pmiPairs, Some(
      s"""WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')[1:$PmiTake]) AS s
                     FROM documents),
            n AS (SELECT count(*) AS n_docs FROM d),
            w AS (SELECT u.w AS w, count(*) AS wc FROM d, unnest(d.s) AS u(w) GROUP BY 1),
            p AS (SELECT a.w1 AS w1, b.w2 AS w2
                  FROM d, unnest(d.s) AS a(w1), unnest(d.s) AS b(w2) WHERE a.w1 <> b.w2),
            c AS (SELECT w1, w2, count(*) AS n12 FROM p GROUP BY 1, 2
                  HAVING count(*) >= $PmiThreshold)
          SELECT c.w1, c.w2, c.n12,
                 round(log10((c.n12 * n.n_docs) / (wa.wc * wb.wc)), 6) AS pmi
          FROM c, n
          JOIN w wa ON c.w1 = wa.w
          JOIN w wb ON c.w2 = wb.w
          ORDER BY w1, w2""")),
    QueryDef("keyword_count", keywordCount, Some(
      s"""SELECT '$Keyword' AS keyword,
                 CAST(sum(hits) AS BIGINT) AS total_hits,
                 count(*) FILTER (hits > 0) AS n_docs
          FROM (SELECT doc_id, len(list_filter(string_split(text, ' '), t -> t = '$Keyword')) AS hits
                FROM documents)""")),
    QueryDef("inverted_index", invertedIndex, Some(
      """WITH tf AS (SELECT w AS term, doc_id, count(*) AS tf
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                     WHERE w <> '' GROUP BY 1, 2)
         SELECT term, doc_id, tf, count(*) OVER (PARTITION BY term) AS df
         FROM tf ORDER BY term, doc_id""")),
    QueryDef("inverted_index_compressed", invertedIndexCompressed, Some(
      """WITH post AS (SELECT DISTINCT u.t AS term, doc_id
                       FROM documents, unnest(string_split(text, ' ')) AS u(t)
                       WHERE u.t <> ''),
           ids AS (SELECT term, list_sort(list(doc_id)) AS ids FROM post GROUP BY 1),
           g AS (SELECT term, ids,
                        [CASE WHEN i = 1 THEN ids[1] ELSE ids[i] - ids[i-1] END
                         FOR i IN generate_series(1, len(ids))] AS gaps
                 FROM ids)
         SELECT term, CAST(len(ids) AS BIGINT) AS df,
                CAST(list_sum([CASE WHEN gv < 128 THEN 1 WHEN gv < 16384 THEN 2
                                    WHEN gv < 2097152 THEN 3 ELSE 4 END
                               FOR gv IN gaps]) AS BIGINT) AS n_bytes,
                CAST(list_sum(ids) AS BIGINT) AS checksum,
                ids[1] AS first_doc, ids[len(ids)] AS last_doc,
                TRUE AS roundtrip_ok
         FROM g ORDER BY term""")),
    QueryDef("boolean_retrieval_postfix", (s, d) => postfixRetrieval(s, d, PostfixQuery), Some(
      """WITH hits AS (SELECT doc_id FROM (
           SELECT doc_id FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE w IN ('spark', 'join') GROUP BY doc_id HAVING count(DISTINCT w) = 2
           UNION
           SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE w = 'vector'))
         SELECT h.doc_id, d.text FROM hits h JOIN documents d USING (doc_id)
         ORDER BY doc_id""")),
    QueryDef("boolean_retrieval", booleanRetrieval, Some(
      s"""WITH hits AS (SELECT doc_id
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w IN ($termList)
            GROUP BY doc_id HAVING count(DISTINCT w) = ${RetrievalTerms.length})
          SELECT h.doc_id, d.text FROM hits h JOIN documents d USING (doc_id)
          ORDER BY doc_id""")),
    QueryDef("inverted_index_positional", positionalIndex, Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM t)
         SELECT term, doc_id, pos,
                count(*) OVER (PARTITION BY term, doc_id) AS tf
         FROM p WHERE term <> '' ORDER BY term, doc_id, pos""")),
    QueryDef("phrase_retrieval", (s, d) => phraseRetrieval(s, d), Some {
      val joins = PhraseTerms.zipWithIndex.tail.map { case (t, k) =>
        s"JOIN p p$k ON p$k.doc_id = p0.doc_id AND p$k.pos = p0.pos + $k AND p$k.term = '$t'"
      }.mkString("\n                ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM t),
           m AS (SELECT p0.doc_id FROM p p0
                $joins
                WHERE p0.term = '${PhraseTerms.head}'),
           h AS (SELECT doc_id, count(*) AS n_occurrences FROM m GROUP BY 1)
         SELECT h.doc_id, h.n_occurrences, d.text
         FROM h JOIN documents d USING (doc_id) ORDER BY doc_id"""
    }),
    QueryDef("proximity_retrieval", (s, d) => proximityRetrieval(s, d), Some(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM t),
           m AS (SELECT a.doc_id, abs(a.pos - b.pos) AS gap
                 FROM p a JOIN p b ON a.doc_id = b.doc_id
                 WHERE a.term = '${PhraseTerms.head}' AND b.term = '${PhraseTerms.last}'
                   AND abs(a.pos - b.pos) <= $ProxWindow AND a.pos <> b.pos),
           h AS (SELECT doc_id, count(*) AS n_pairs, min(gap) AS min_gap FROM m GROUP BY 1)
         SELECT h.doc_id, h.n_pairs, h.min_gap, d.text
         FROM h JOIN documents d USING (doc_id) ORDER BY doc_id""")),
    // same oracle as boolean_retrieval ON PURPOSE: the compressed path
    // must retrieve the identical doc set, just via the encoded bytes
    QueryDef("boolean_retrieval_compressed", booleanRetrievalCompressed, Some(
      s"""WITH hits AS (SELECT doc_id
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w IN ($termList)
            GROUP BY doc_id HAVING count(DISTINCT w) = ${RetrievalTerms.length})
          SELECT h.doc_id, d.text FROM hits h JOIN documents d USING (doc_id)
          ORDER BY doc_id""")),
  )
}
