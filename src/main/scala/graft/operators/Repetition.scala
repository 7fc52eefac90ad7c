package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Gopher repetition signals (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher",
  * Table A1) — the standard repetition-based quality filters a
  * training-data pipeline applies per document:
  *
  *  - duplicate line fraction: lines occurring beyond their first
  *    occurrence / total lines (reference point: the reference's
  *    curation tier has no repetition pass; this follows the published
  *    Gopher rules directly)
  *  - duplicate line CHARACTER fraction: characters in those repeat
  *    occurrences / total line characters
  *  - top n-gram character fraction (n = 2, 3, 4): characters covered
  *    by all occurrences of the single most frequent n-gram / total
  *    token characters (most-frequent ties break to the
  *    lexicographically greatest gram — `max(struct(cnt, gram))` here,
  *    the two-step max in the oracle: both pick the same gram)
  *  - duplicate n-gram character fraction (n = 5..10): characters
  *    covered by all occurrences of n-grams appearing more than once /
  *    total token characters (the char-weighted form; the original
  *    paper de-overlaps occurrences, which is not expressible as pure
  *    aggregation — documented deviation, consistent across engines)
  *
  * Character counts exclude separators (sum of token lengths), and
  * covered-character fractions are capped at 1.0 (overlapping
  * occurrences can exceed the document length). All fractions are
  * ROUNDED to 6 dp before the threshold comparisons so a last-ulp
  * float delta can't flip the verdict between engines.
  *
  * Scale: ONE explode produces (doc_id, n, gram) for every n at once,
  * so the whole 9-signal family costs a single shuffle ∝ total tokens
  * ×9 — the same scan-shaped cost as one inverted-index build; line
  * metrics are pure in-row expressions (zero shuffle, whole-stage
  * codegen). No window over the corpus, no driver state — scales to
  * any corpus that fits the cluster.
  */
object Repetition {
  /** Gopher Table A1 thresholds: a doc is flagged when ANY signal
    * exceeds its bound. */
  val DupLineFracMax = 0.30
  val DupLineCharFracMax = 0.20
  val TopGramMax: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupGramMax: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  private val Ns = (2 to 10).toSeq

  private def fracName(n: Int): String =
    if (n <= 4) s"top_${n}gram_char_frac" else s"dup_${n}gram_char_frac"

  /** Per-document repetition signals + the Gopher keep/flag verdict. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    signals(Tables.documents(spark, dir)).orderBy("doc_id")

  /** The signal computation over ANY (doc_id, text) relation — exposed
    * so composed pipelines (cur_pipeline_v3) can gate their survivor
    * set on the repetition verdict without re-reading the table. */
  def signals(docsDf: DataFrame): DataFrame = {
    val base = docsDf
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t != '')").as("toks"),
        split(col("text"), "\n").as("lines"))
      .withColumn("total_chars",
        expr("aggregate(toks, 0L, (a, t) -> a + length(t))"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_distinct_lines",
        size(array_distinct(col("lines"))).cast("long"))
      .withColumn("line_chars",
        expr("aggregate(lines, 0L, (a, l) -> a + length(l))"))
      .withColumn("distinct_line_chars",
        expr("aggregate(array_distinct(lines), 0L, (a, l) -> a + length(l))"))

    // one explode for ALL n: (doc_id, n, gram); the `filter` guard (not
    // sequence(1, size-n+1)) sidesteps Spark's descending sequence(1, 0)
    val grams = base.select(col("doc_id"), col("total_chars"),
        explode(expr(s"""flatten(transform(array(${Ns.mkString(",")}), n ->
             transform(filter(sequence(1, size(toks)), i -> i + n - 1 <= size(toks)),
               i -> named_struct('n', n, 'gram', array_join(slice(toks, i, n), ' ')))))""")).as("g"))
      .select(col("doc_id"), col("total_chars"),
        col("g.n").as("n"), col("g.gram").as("gram"))

    val counts = grams
      .groupBy("doc_id", "total_chars", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("gram_chars", (length(col("gram")) - (col("n") - 1)).cast("long"))

    val perN = counts
      .groupBy("doc_id", "total_chars", "n")
      .agg(max(struct(col("cnt"), col("gram"))).as("top"),
        sum(when(col("cnt") > 1, col("cnt") * col("gram_chars")).otherwise(0L))
          .as("dup_chars"))
      .select(col("doc_id"), col("n"),
        round(least(lit(1.0),
          when(col("n") <= 4,
            col("top.cnt") * (length(col("top.gram")) - (col("n") - 1)))
            .otherwise(col("dup_chars"))
            .cast("double") / col("total_chars")), 6).as("frac"))

    val gramCols = perN.groupBy("doc_id").agg(
      coalesce(max(when(col("n") === Ns.head, col("frac"))), lit(0.0)).as(fracName(Ns.head)),
      Ns.tail.map(n =>
        coalesce(max(when(col("n") === n, col("frac"))), lit(0.0)).as(fracName(n))): _*)

    val lineCols = base.select(col("doc_id"),
      round((col("n_lines") - col("n_distinct_lines"))
        .cast("double") / col("n_lines"), 6).as("dup_line_frac"),
      when(col("line_chars") === 0, lit(0.0))
        .otherwise(round((col("line_chars") - col("distinct_line_chars"))
          .cast("double") / col("line_chars"), 6)).as("dup_line_char_frac"))

    val flagged: Column =
      (col("dup_line_frac") > DupLineFracMax) ||
        (col("dup_line_char_frac") > DupLineCharFracMax) ||
        Ns.map { n =>
          val bound = if (n <= 4) TopGramMax(n) else DupGramMax(n)
          col(fracName(n)) > bound
        }.reduce(_ || _)

    lineCols.join(gramCols, Seq("doc_id"), "left")
      .na.fill(0.0, Ns.map(fracName))
      .withColumn("repetitive", flagged)
  }

  /** CTE chain ending in `rep` (doc_id, repetitive) over any docs
    * relation carrying (doc_id, text) — the composable form of the
    * oracle, shared by cur_repetition and the v3 pipeline. */
  def repetitionCtesFrom(rel: String): String = {
    val pivotCols = Ns.map(n =>
      s"coalesce(max(CASE WHEN n = $n THEN frac END), 0.0) AS ${fracName(n)}")
      .mkString(",\n               ")
    val flag = (Seq(
      s"l.dup_line_frac > $DupLineFracMax",
      s"l.dup_line_char_frac > $DupLineCharFracMax") ++
      Ns.map { n =>
        val bound = if (n <= 4) TopGramMax(n) else DupGramMax(n)
        s"coalesce(g.${fracName(n)}, 0.0) > $bound"
      }).mkString(" OR ")
    s"""rdocs AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks,
                 string_split(text, chr(10)) AS lines
          FROM $rel),
        rbase AS MATERIALIZED (
          SELECT doc_id, toks,
                 coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS total_chars,
                 len(lines) AS n_lines,
                 len(list_distinct(lines)) AS n_distinct_lines,
                 coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS line_chars,
                 coalesce(list_sum(list_transform(list_distinct(lines), l -> length(l))), 0) AS distinct_line_chars
          FROM rdocs),
        rgrams AS (
          SELECT doc_id, total_chars, n,
                 array_to_string(toks[i:i+n-1], ' ') AS gram
          FROM rbase,
               unnest([${Ns.mkString(",")}]) AS t1(n),
               unnest(range(1, len(toks) - n + 2)) AS t2(i)
          WHERE len(toks) >= n),
        rcounts AS MATERIALIZED (
          SELECT doc_id, total_chars, n, gram, count(*) AS cnt,
                 length(gram) - (n - 1) AS gram_chars
          FROM rgrams GROUP BY 1, 2, 3, 4),
        rtops AS (SELECT doc_id, n, max(cnt) AS top_cnt
                 FROM rcounts GROUP BY 1, 2),
        rtopg AS (
          SELECT c.doc_id, c.n, t.top_cnt, max(c.gram) AS top_gram
          FROM rcounts c JOIN rtops t
            ON c.doc_id = t.doc_id AND c.n = t.n AND c.cnt = t.top_cnt
          GROUP BY 1, 2, 3),
        rdups AS (
          SELECT doc_id, n, total_chars,
                 sum(CASE WHEN cnt > 1 THEN cnt * gram_chars ELSE 0 END) AS dup_chars
          FROM rcounts GROUP BY 1, 2, 3),
        rpern AS (
          SELECT d.doc_id, d.n,
                 round(least(1.0, CAST(CASE WHEN d.n <= 4
                     THEN g.top_cnt * (length(g.top_gram) - (d.n - 1))
                     ELSE d.dup_chars END AS DOUBLE) / d.total_chars), 6) AS frac
          FROM rdups d JOIN rtopg g ON d.doc_id = g.doc_id AND d.n = g.n),
        rgramcols AS (
          SELECT doc_id,
               $pivotCols
          FROM rpern GROUP BY 1),
        rlinecols AS (
          SELECT doc_id,
                 round((n_lines - n_distinct_lines) / CAST(n_lines AS DOUBLE), 6) AS dup_line_frac,
                 CASE WHEN line_chars = 0 THEN 0.0
                      ELSE round((line_chars - distinct_line_chars) / CAST(line_chars AS DOUBLE), 6)
                 END AS dup_line_char_frac
          FROM rbase),
        rep AS MATERIALIZED (
          SELECT l.doc_id, ($flag) AS repetitive
          FROM rlinecols l LEFT JOIN rgramcols g ON l.doc_id = g.doc_id)"""
  }

  private val oracle: String = {
    val pivotCols = Ns.map(n =>
      s"coalesce(max(CASE WHEN n = $n THEN frac END), 0.0) AS ${fracName(n)}")
      .mkString(",\n               ")
    val outCols = Ns.map(n => s"coalesce(g.${fracName(n)}, 0.0) AS ${fracName(n)}")
      .mkString(",\n             ")
    val flag = (Seq(
      s"dup_line_frac > $DupLineFracMax",
      s"dup_line_char_frac > $DupLineCharFracMax") ++
      Ns.map { n =>
        val bound = if (n <= 4) TopGramMax(n) else DupGramMax(n)
        s"coalesce(g.${fracName(n)}, 0.0) > $bound"
      }).mkString(" OR ")
    s"""WITH docs AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks,
                 string_split(text, chr(10)) AS lines
          FROM documents),
        base AS MATERIALIZED (
          SELECT doc_id, toks,
                 coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS total_chars,
                 len(lines) AS n_lines,
                 len(list_distinct(lines)) AS n_distinct_lines,
                 coalesce(list_sum(list_transform(lines, l -> length(l))), 0) AS line_chars,
                 coalesce(list_sum(list_transform(list_distinct(lines), l -> length(l))), 0) AS distinct_line_chars
          FROM docs),
        grams AS (
          SELECT doc_id, total_chars, n,
                 array_to_string(toks[i:i+n-1], ' ') AS gram
          FROM base,
               unnest([${Ns.mkString(",")}]) AS t1(n),
               unnest(range(1, len(toks) - n + 2)) AS t2(i)
          WHERE len(toks) >= n),
        counts AS MATERIALIZED (
          SELECT doc_id, total_chars, n, gram, count(*) AS cnt,
                 length(gram) - (n - 1) AS gram_chars
          FROM grams GROUP BY 1, 2, 3, 4),
        tops AS (SELECT doc_id, n, max(cnt) AS top_cnt
                 FROM counts GROUP BY 1, 2),
        topg AS (
          SELECT c.doc_id, c.n, t.top_cnt, max(c.gram) AS top_gram
          FROM counts c JOIN tops t
            ON c.doc_id = t.doc_id AND c.n = t.n AND c.cnt = t.top_cnt
          GROUP BY 1, 2, 3),
        dups AS (
          SELECT doc_id, n, total_chars,
                 sum(CASE WHEN cnt > 1 THEN cnt * gram_chars ELSE 0 END) AS dup_chars
          FROM counts GROUP BY 1, 2, 3),
        pern AS (
          SELECT d.doc_id, d.n,
                 round(least(1.0, CAST(CASE WHEN d.n <= 4
                     THEN g.top_cnt * (length(g.top_gram) - (d.n - 1))
                     ELSE d.dup_chars END AS DOUBLE) / d.total_chars), 6) AS frac
          FROM dups d JOIN topg g ON d.doc_id = g.doc_id AND d.n = g.n),
        gramcols AS (
          SELECT doc_id,
               $pivotCols
          FROM pern GROUP BY 1),
        linecols AS (
          SELECT doc_id,
                 round((n_lines - n_distinct_lines) / CAST(n_lines AS DOUBLE), 6) AS dup_line_frac,
                 CASE WHEN line_chars = 0 THEN 0.0
                      ELSE round((line_chars - distinct_line_chars) / CAST(line_chars AS DOUBLE), 6)
                 END AS dup_line_char_frac
          FROM base)
        SELECT l.doc_id, l.dup_line_frac, l.dup_line_char_frac,
             $outCols,
             ($flag) AS repetitive
        FROM linecols l LEFT JOIN gramcols g ON l.doc_id = g.doc_id
        ORDER BY l.doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("cur_repetition", repetition, Some(oracle)),
  )
}
