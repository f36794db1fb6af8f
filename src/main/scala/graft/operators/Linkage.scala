package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Record linkage: fuzzy (edit-distance) matching over a name
  * dictionary — the entity-resolution front door (SURVEY.md §2.F
  * extension; reference scope: the framework's grouping contract,
  * mapreduce.h:130-199, generalized from exact keys to approximate
  * ones).
  *
  * Shape: ER over an entity table runs at the DICTIONARY level —
  * `group by name` first (map-side combinable, output bounded by the
  * distinct-name count, not the row count), then a fuzzy self-join
  * over the dictionary, then counts map each matched name pair back
  * to its entity weight. At 100 TB the entity table is the corpus
  * but the dictionary is orders of magnitude smaller; the join below
  * never touches the corpus again.
  *
  * The fuzzy join itself is FastSS deletion-neighborhood blocking
  * (Bocek et al., "Fast Similarity Search in Large Dictionaries",
  * U. Zurich TR 2007): for threshold τ, every string emits its ≤τ
  * -deletion variants; an optimal alignment of a pair within edit
  * distance τ deletes ≤τ characters from EACH side (substitution →
  * drop both aligned chars, indel → drop the extra char), so any
  * true pair shares at least one variant key and the bucket join is
  * a COMPLETE candidate generator. Candidates then pass the exact
  * `levenshtein` filter — blocking affects cost, never the answer.
  * The oracle is the naive all-pairs join at the dictionary level
  * (ground truth by construction), so the hash match IS the
  * completeness proof, the same contract as q_salted_join's
  * plain-join oracle.
  *
  * Scale: variant fan-out is 1 + n + n·(n−1)/2 keys per name (≈120
  * for a 15-char name) — map-side, linear in dictionary size. Bucket
  * skew is the LSH-band shape: a popular subsequence's bucket of m
  * names yields m² candidates, the same bounded blow-up minhash
  * bands carry; the exact-verify filter keeps only true pairs.
  *
  * Dialect note (pinned in LinkageSpec): Spark's `levenshtein` is
  * codepoint-based; DuckDB's is byte-based ('café'→'cafe' is 1 vs
  * 2). The oracle-gated surface runs on the ASCII part-name
  * dictionary where the two agree; the spec pins the Spark
  * (codepoint) semantics as the operator's contract.
  */
object Linkage {

  /** Edit-distance threshold: pairs within 2 edits match. */
  val Tau = 2

  /** Fail-fast ceiling on name length. The deletion-variant fan-out
    * is O(len²/2) per name (a 100-char name ⇒ ~5k variant keys), so
    * an unguarded free-text column would quietly turn the blocking
    * index quadratic. Real entity names (products, people, vendors)
    * sit far below 64; anything longer is a mis-declared column —
    * raise instead of silently exploding. Word-level blocking is the
    * right operator for long strings ([[graft.operators.Dedup]]'s
    * shingle family). */
  val MaxNameLen = 64

  /** The length guard every linkage surface routes names through
    * ([[fuzzyPairsOf]] and the streaming
    * [[graft.streaming.Streams.fuzzyNameGate]]). */
  private[graft] def guardLen(c: Column): Column =
    when(length(c) > MaxNameLen,
      raise_error(concat(
        lit(s"linkage: name exceeds $MaxNameLen chars ('"),
        substring(c, 1, 24),
        lit("…') — deletion-variant blocking is quadratic in length; " +
          "use shingle-based dedup for long strings"))))
      .otherwise(c)

  /** All deletion variants of column `c` up to [[Tau]] deletions (the
    * FastSS key set U_τ): the string itself, every single-char
    * deletion, every unordered two-char deletion. Pure SQL
    * higher-order functions — codegen-friendly, no UDF. The `length`
    * guards keep `sequence` ascending (Spark's sequence(1, 0) counts
    * DOWN, not empty), so ""/1-char names degrade cleanly. */
  private[graft] def variants(c: String): Column = expr(
    s"""array_distinct(concat(
       |  array($c),
       |  if(length($c) < 1, cast(array() as array<string>),
       |    transform(sequence(1, length($c)), i ->
       |      concat(substring($c, 1, i - 1),
       |             substring($c, i + 1, length($c) - i)))),
       |  if(length($c) < 2, cast(array() as array<string>),
       |    flatten(transform(sequence(1, length($c) - 1), i ->
       |      transform(sequence(i + 1, length($c)), j ->
       |        concat(substring($c, 1, i - 1),
       |               substring($c, i + 1, j - i - 1),
       |               substring($c, j + 1, length($c) - j))))))
       |))""".stripMargin)

  /** Fuzzy self-join of a `(name, cnt)` dictionary: all unordered
    * pairs of DISTINCT names within [[Tau]] edits, with both entity
    * counts. Candidates come from the deletion-variant bucket join
    * (complete — see object doc); the exact filter runs once per
    * distinct candidate pair. Output is dictionary-bounded, so the
    * presentation sort is a bounded exchange, not a corpus sort. */
  def fuzzyPairsOf(names: DataFrame): DataFrame = {
    val keyed = names
      .select(guardLen(col("name")).as("name"), col("cnt"))
      .select(col("name"), col("cnt"), explode(variants("name")).as("v"))
    val a = keyed.select(col("v"),
      col("name").as("name_a"), col("cnt").as("cnt_a"))
    val b = keyed.select(col("v"),
      col("name").as("name_b"), col("cnt").as("cnt_b"))
    a.join(b, Seq("v"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("cnt_a"), col("cnt_b"))
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= Tau)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("cnt_a"), col("cnt_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** The part-name dictionary fuzzy join: near-duplicate product
    * names (one-typo / one-word-swap apart) with how many parts
    * carry each spelling — the catalog-cleaning query. */
  def fuzzyNames(spark: SparkSession, dir: String): DataFrame =
    fuzzyPairsOf(Tables(spark, dir).part
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("cnt")))
}
