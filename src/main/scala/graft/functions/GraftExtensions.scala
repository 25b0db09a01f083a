package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions to SQL, so `spark.sql("SELECT sorted_intersect_card(a, b)")`
  * works on any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * (Preference order (c) of the build rules — registered extension point;
  * the engine itself needs no custom planner strategies because every
  * operator lowers to stock Catalyst plans, SURVEY.md §7.3.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** A config-style argument (k, bands, bits...) must be a foldable int
    * literal: it parameterizes the generated code, so a per-row value is
    * meaningless.
    */
  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case lit: Literal if lit.foldable && lit.value != null =>
      lit.value match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$fn: argument ${pos + 1} must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a foldable integer literal")
  }

  private def boolArg(e: Expression, fn: String, pos: Int): Boolean = e match {
    case lit: Literal if lit.foldable && lit.value.isInstanceOf[Boolean] =>
      lit.value.asInstanceOf[Boolean]
    case _ => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a boolean literal")
  }

  private def arity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$fn requires exactly $n arguments, got ${children.length}")

  private def fnEntry(name: String, clazz: Class[_], usage: String,
                      build: Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "misc_funcs", "", "", "java_udf"),
    build)

  /** The engine's full native-kernel surface, callable from SQL on any
    * session built with `.withExtensions(new GraftExtensions)` or
    * `spark.sql.extensions=graft.functions.GraftExtensions` — a SQL user
    * can assemble the dedup feature pipeline (normalize → shingle →
    * minhash → band keys; simhash; dot products) without the Scala API.
    */
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fnEntry("sorted_intersect_card", classOf[SortedLongIntersectCard],
      "_FUNC_(a, b) - Intersection cardinality of two array<bigint> that are " +
        "sorted ascending and distinct (PRECONDITION: unsorted input undercounts).",
      { children =>
        arity("sorted_intersect_card", children, 2)
        SortedLongIntersectCard(children(0), children(1))
      }))
    ext.injectFunction(fnEntry("normalize_text", classOf[NormalizeText],
      "_FUNC_(s) - Caption normalization: lowercase, NFD accent fold, braced-term " +
        "strip, non-alphanumerics removed, whitespace collapsed.",
      { children =>
        arity("normalize_text", children, 1)
        NormalizeText(children.head)
      }))
    ext.injectFunction(fnEntry("hashed_shingles", classOf[HashedShingles],
      "_FUNC_(s, k) - Sorted distinct xxhash64 values of the char-k shingles of a " +
        "normalized (ASCII) string; strings shorter than k hash whole.",
      { children =>
        arity("hashed_shingles", children, 2)
        HashedShingles(children.head, intArg(children(1), "hashed_shingles", 1))
      }))
    ext.injectFunction(fnEntry("simhash_words", classOf[SimHashWords],
      "_FUNC_(s, bits[, fast]) - SimHash over the space-separated tokens of a " +
        "normalized string; fast=true (default) hashes tokens with xxhash64, " +
        "false with the md5-based hash60.",
      { children =>
        if (children.length != 2 && children.length != 3)
          throw new IllegalArgumentException(
            s"simhash_words requires 2 or 3 arguments, got ${children.length}")
        SimHashWords(children.head, intArg(children(1), "simhash_words", 1),
          if (children.length == 3) boolArg(children(2), "simhash_words", 2) else true)
      }))
    ext.injectFunction(fnEntry("minhash_sig", classOf[MinHashFromHashes],
      "_FUNC_(hashes, num_hashes, seed) - MinHash signature (array<bigint>) of " +
        "pre-hashed shingles under the engine's deterministic affine permutations.",
      { children =>
        arity("minhash_sig", children, 3)
        val n = intArg(children(1), "minhash_sig", 1)
        val seed = intArg(children(2), "minhash_sig", 2).toLong
        MinHashFromHashes(children.head,
          graft.sig.Signatures.seedsA(n, seed), graft.sig.Signatures.seedsB(n, seed))
      }))
    ext.injectFunction(fnEntry("band_keys", classOf[BandKeyStrings],
      "_FUNC_(sig, bands) - String LSH band keys ('band:v1,v2,...') of a MinHash " +
        "signature.",
      { children =>
        arity("band_keys", children, 2)
        BandKeyStrings(children.head, intArg(children(1), "band_keys", 1))
      }))
    ext.injectFunction(fnEntry("band_hash_keys", classOf[BandHashKeys],
      "_FUNC_(sig, bands) - Hashed 58-bit long LSH band keys (compact blocking " +
        "index form).",
      { children =>
        arity("band_hash_keys", children, 2)
        BandHashKeys(children.head, intArg(children(1), "band_hash_keys", 1))
      }))
    ext.injectFunction(fnEntry("bit_block_keys", classOf[BitBlockKeyStrings],
      "_FUNC_(h, blocks, total_bits) - Pigeonhole bit-block keys ('i:v') of a " +
        "64-bit hash for Hamming-bounded blocking.",
      { children =>
        arity("bit_block_keys", children, 3)
        BitBlockKeyStrings(children.head, intArg(children(1), "bit_block_keys", 1),
          intArg(children(2), "bit_block_keys", 2))
      }))
    ext.injectFunction(fnEntry("float_dot", classOf[FloatDotProduct],
      "_FUNC_(a, b) - Dot product of two array<float> as a sequential double fold " +
        "(bit-identical to DuckDB's list_dot_product).",
      { children =>
        arity("float_dot", children, 2)
        FloatDotProduct(children(0), children(1))
      }))
  }
}
