package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling + hash-family sketches for document dedup
  * (SURVEY.md §2 D). Everything is built from codegen'd built-ins
  * (split / transform / aggregate / xxhash64) — no UDFs — so the
  * sketch computation is one narrow projection per document and the
  * only shuffles in the dedup operators are the bucket-key joins.
  */
object Shingles {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word 3-gram shingles of a text column (codegen'd custom
    * expression — see [[NGramShingles]]). */
  def grams3(text: Column): Column =
    graft.functions.ShingleCol.nGramShingles(tokens(text), 3)

  /** HOF formulation of [[grams3]] — interpreted, kept as the
    * cross-check reference for ShinglesSpec. */
  def grams3Hof(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) < 3, array(array_join(t, " ")))
        .otherwise(transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ",
            element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
  }

  /** MinHash signature: k independent hash functions, each the min of
    * an affine-salted [[PortableHash.h60]] over the shingle set — the
    * declarative cross-check reference for
    * [[graft.functions.MinHashAgg]] (same salts, bit-identical;
    * SketchAggsSpec asserts). */
  def minhashSignature(grams: Column, k: Int): Column = {
    val (as, bs) = PortableHash.affineParams(k)
    array((0 until k).map(i =>
      array_min(transform(grams,
        g => PortableHash.salted(PortableHash.h60(g), as(i), bs(i))))): _*)
  }

  /** Banded LSH keys from a minhash signature: `bands` substrings of
    * `rowsPerBand` signature entries each, concatenated to one bucket
    * key per band (entries are 31-bit, so plain decimal concat is a
    * collision-free key — and portable to the SQL oracle). Two docs
    * sharing any band key become a candidate pair. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit("#"),
        array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>"), "_")))

  /** 64-bit SimHash over the shingle set: per-bit signed counts of the
    * shingles' [[PortableHash.h60]] bits, then the sign pattern packed
    * to a long (bits 60-63 are always 0 — the base hash is 60-bit). */
  def simhash64(grams: Column): Column =
    simhashImpl(transform(grams, g => PortableHash.h60(g)))

  private def simhashImpl(hashes: Column): Column =
    // Static 64-way expansion (shift amounts must be literals): bit j
    // of the result is the sign of the ±1 vote sum over shingle-hash
    // bit j. One wide projection, still fully codegen'd.
    (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
          .otherwise(lit(-1L)))
      shiftleft(when(vote > 0, lit(1L)).otherwise(lit(0L)), j)
    }.reduce(_ bitwiseOR _)

  /** The 16-bit chunks of a simhash — pigeonhole bucketing: two hashes
    * within Hamming distance 3 share at least one of 4 chunks. */
  def simhashChunks(sim: Column): Column =
    array((0 until 4).map(c =>
      concat(lit(s"$c#"),
        shiftright(sim, c * 16).bitwiseAND(lit(0xFFFFL)).cast("string"))): _*)

  /** Hamming distance between two longs (codegen'd bit_count). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
