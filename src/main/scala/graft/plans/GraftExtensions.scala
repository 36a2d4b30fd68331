package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/**
 * SQL surface for the native codegen expressions: register with
 * `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config)
 * or `SparkSession.builder().withExtensions(new GraftExtensions)`, or
 * call [[GraftExtensions.register]] on a live session (notebooks,
 * tests — `withExtensions` is silently ignored by `getOrCreate` when a
 * session already exists).
 *
 * Functions:
 *  - `graft_simhash(array<string>)  -> bigint` — 60-bit SimHash
 *  - `graft_rolling_hash(string)    -> bigint` — rolling document hash
 *  - `graft_hashed_shingles(string, n)-> array<bigint>` — hashed n-grams
 *    (n must be a literal int)
 *  - `graft_dot(array, array)       -> double` — embedding dot product
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(ch: Seq[Expression]): Seq[Expression] = {
    require(ch.length == n, s"$name expects $n argument(s), got ${ch.length}")
    ch
  }

  /** n-gram width must be plan-time constant: the kernel specializes on
    * it, and a per-row width would defeat codegen. */
  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: n must be a literal int, got $other")
  }

  private val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash",
      info("graft_simhash", "graft_simhash(tokens) - 60-bit SimHash of a token array"),
      ch => SimHashExpr(arity("graft_simhash", 1)(ch).head)),
    ("graft_rolling_hash",
      info("graft_rolling_hash", "graft_rolling_hash(str) - rolling document fingerprint"),
      ch => RollingHashExpr(arity("graft_rolling_hash", 1)(ch).head)),
    ("graft_hashed_shingles",
      info("graft_hashed_shingles",
        "graft_hashed_shingles(text, n) - hashed word n-gram keys"),
      ch => { val c = arity("graft_hashed_shingles", 2)(ch)
        HashedShinglesExpr(c.head, litInt("graft_hashed_shingles", c(1))) }),
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      ch => { val c = arity("graft_dot", 2)(ch)
        DotProductExpr(c.head, c(1)) }),
    ("graft_minhash_signature",
      info("graft_minhash_signature",
        "graft_minhash_signature(text, numHashes, shingleN) - MinHash " +
          "signature array from the standard affine family"),
      ch => { val c = arity("graft_minhash_signature", 3)(ch)
        val k = litInt("graft_minhash_signature", c(1))
        require(k > 0, "graft_minhash_signature: numHashes must be positive")
        val n = litInt("graft_minhash_signature", c(2))
        require(n > 0, "graft_minhash_signature: shingleN must be positive")
        val (as, bs) = Native.minhashCoefs(k)
        MinHashSigExpr(c.head, as, bs, n) }))

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, fnInfo, builder) =>
      org.apache.spark.sql.graft.RegistryBridge.register(spark,
        FunctionIdentifier(name), fnInfo, builder)
    }
}
