package graft

import graft.functions.{CharShingles, MinHashSig, VecDot, Winnow, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering graft's native Catalyst expressions as SQL
  * functions, so they are callable from `spark.sql(...)` and SQL-only
  * clients, not just the Scala Column helpers:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     // or .withExtensions(new graft.GraftExtensions)
  *     .getOrCreate()
  *
  *   SELECT vec_dot(a.embedding, b.embedding)        -- codegen'd dot product
  *   SELECT word_shingles(text, 3)                   -- distinct word 3-grams
  *   SELECT winnow_fp(text, 5, 4, 1000003)           -- winnowing fingerprint
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def fn(
      name: String, usage: String)(builder: FunctionBuilder):
      (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name),
      // the 11-arg constructor is the only non-deprecated one; the empty
      // fields (arguments/examples/note/group/since/deprecated) render as
      // absent in DESCRIBE FUNCTION
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "built-in"),
      builder)

  /** The registered function set (shared by tests). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    fn("vec_dot",
      "vec_dot(a, b) - index-ordered double dot product of two numeric arrays") { args =>
      arity("vec_dot", args, 2)
      VecDot(args(0), args(1))
    },
    fn("word_shingles",
      "word_shingles(text, k) - distinct word k-shingles (first-occurrence order)") { args =>
      arity("word_shingles", args, 2)
      WordShingles(args(0), intLit(args(1), "word_shingles", "k"))
    },
    fn("char_shingles",
      "char_shingles(text, k) - all character k-shingles (duplicates kept, document order)") { args =>
      arity("char_shingles", args, 2)
      CharShingles(args(0), intLit(args(1), "char_shingles", "k"))
    },
    fn("winnow_fp",
      "winnow_fp(text, k, w, mod) - winnowing fingerprint (comma-joined window minima)") { args =>
      arity("winnow_fp", args, 4)
      Winnow(args(0), intLit(args(1), "winnow_fp", "k"),
        intLit(args(2), "winnow_fp", "w"), longLit(args(3), "winnow_fp", "mod"))
    },
    fn("minhash_sig",
      "minhash_sig(shingles, numHashes, seed) - MinHash signature over md5 base hashes " +
        "with the canonical affine permutation family mod 2^31-1") { args =>
      arity("minhash_sig", args, 3)
      val (as, bs) = MinHashSig.coefficients(
        intLit(args(1), "minhash_sig", "numHashes"),
        longLit(args(2), "minhash_sig", "seed"))
      MinHashSig(args(0), as, bs, MinHashSig.Prime)
    },
    fn("vec_norm2",
      "vec_norm2(a) - index-ordered double squared L2 norm of a numeric array") { args =>
      arity("vec_norm2", args, 1)
      VecDot(args(0), args(0))
    },
    fn("vec_sum_long",
      "vec_sum_long(a) - aggregate: element-wise exact BIGINT sum of array<bigint> " +
        "rows (map-side combined; ragged dims are a hard error)") { args =>
      arity("vec_sum_long", args, 1)
      graft.functions.VecSumLong(args(0))
    },
    fn("lsh_bits",
      "lsh_bits(vec, nbits) - random-hyperplane LSH bucket of a float/double array: " +
        "nbits exact integer-quantized sign tests against the engine's fixed " +
        "prefix-stable +-1 hyperplane family") { args =>
      arity("lsh_bits", args, 2)
      val nb = intLit(args(1), "lsh_bits", "nbits")
      graft.functions.LshBits(args(0), graft.operators.Lsh.weightsFor(nb), nb)
    },
    fn("substr_hashes",
      "substr_hashes(text, winLen) - 60-bit md5 hashes of every stride-1 winLen-char " +
        "window (one pass; the ExactSubstr dedup kernel)") { args =>
      arity("substr_hashes", args, 2)
      graft.functions.SubstrHashes(args(0), intLit(args(1), "substr_hashes", "winLen"))
    },
    fn("heavy_keep",
      "heavy_keep(token, k) - aggregate: Misra-Gries heavy-hitter candidates " +
        "(<= k survivors; mergeable, so the bound holds under any merge tree)") { args =>
      arity("heavy_keep", args, 2)
      graft.functions.HeavyKeep(args(0), intLit(args(1), "heavy_keep", "k"))
    },
    fn("kmin_distinct",
      "kmin_distinct(hash, k) - aggregate: the k smallest distinct BIGINT hashes " +
        "(the KMV distinct-count sketch buffer)") { args =>
      arity("kmin_distinct", args, 2)
      graft.functions.KMinDistinct(args(0), intLit(args(1), "kmin_distinct", "k"))
    },
    fn("bottomk_sample",
      "bottomk_sample(hash, value, k) - aggregate: values of the k smallest distinct " +
        "hashes (a deterministic uniform sample; the quantile-sketch buffer)") { args =>
      arity("bottomk_sample", args, 3)
      graft.functions.BottomKSample(args(0), args(1),
        intLit(args(2), "bottomk_sample", "k"))
    })
}
