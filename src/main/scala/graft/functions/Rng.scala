package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, partition-independent randomness (SURVEY §7.4 hard part 1).
 *
 * Every stochastic choice in the engine (random shapes, noise draws, anomaly
 * slots, fake content, 50/50 key prefixes) is a pure function of
 * `(seed, stream, t, counter)` via a counter-based hash RNG: we key a
 * cross-engine hash (md5) on the identifying columns and map 52 output
 * bits to U[0,1). Unlike `rand()`/`randn()` (seeded per-partition), this
 * survives repartitioning, retries, and AQE re-planning unchanged — which
 * is what makes seeded goldens and cross-engine oracles possible.
 *
 * The reference uses Python's global `random` (src/main.py:540-570,
 * 598-601, 630) — unseeded, irreproducible. Determinism here is a
 * deliberate, documented improvement; distributional shape is preserved.
 */
object Rng {

  /** Exact value of 2^-52 — multiplying a 52-bit integer by it is an
    * exact power-of-two scaling in IEEE doubles. */
  val Inv2p52: Double = 1.0 / (1L << 52)

  /**
   * U[0,1) from hashed key columns: 52 bits of md5 / 2^52.
   *
   * md5 (not xxhash64) is deliberate: both Spark and DuckDB expose the
   * same md5 hex digest, so every uniform draw — and everything built
   * from it by +,-,*,/,sqrt — replays bit-identically in the DuckDB
   * oracle (`('0x' || substr(md5(payload), 1, 13))::BIGINT * 2^-52`).
   * xxhash64 exists only on the Spark side and forced all RNG-derived
   * queries down to rows-only checks.
   *
   * Contract: keys must be non-null string or integral columns — they
   * are joined with the [[Sep]] control-character separator (DuckDB
   * `chr(1)`) via their canonical string form, which DuckDB's
   * `::VARCHAR` reproduces. (concat_ws skips NULLs, and
   * float-to-string formats differ per engine.)
   */
  val Sep = "\u0001"

  /** The raw md5 hex digest of the canonical `(seed, stream, keys*)`
    * payload — the entropy source behind [[uniform]], exposed for
    * operators that need hex-derived tokens (uuids, key suffixes) that
    * must replay in the DuckDB oracle:
    * `md5('seed' || chr(1) || 'stream' || chr(1) || key::VARCHAR || …)`. */
  def digest(seed: Long, stream: String, keys: Column*): Column =
    md5(concat_ws(Sep,
      (lit(seed.toString) +: lit(stream) +: keys.map(_.cast("string"))): _*))

  def uniform(seed: Long, stream: String, keys: Column*): Column =
    conv(substring(digest(seed, stream, keys: _*), 1, 13), 16, 10)
      .cast("long").cast("double") * lit(Inv2p52)

  /** The 52-bit md5 prefix as a LONG — [[uniform]] without the double
    * scaling: the cross-engine hash for ORDER-based sketches
    * (bottom-k signatures), where integer compare/join sidesteps any
    * float-representation question entirely. DuckDB replay:
    * `('0x' || substr(md5(payload), 1, 13))::BIGINT`. */
  def hash52(seed: Long, stream: String, keys: Column*): Column =
    conv(substring(digest(seed, stream, keys: _*), 1, 13), 16, 10)
      .cast("long")

  /** U(0,1] — safe for log(). */
  def uniformPos(seed: Long, stream: String, keys: Column*): Column =
    lit(1.0) - uniform(seed, stream, keys: _*)

  /**
   * Standard normal via Box-Muller from two independent hash streams,
   * quantized to 9 decimal digits. The quantization (same documented
   * trick as [[graft.operators.Transforms.scaledExpr]]) absorbs the
   * last-ulp differences between Java's and DuckDB's `ln`/`cos`
   * (measured: ~0.1% of inputs differ by 1 ulp; a 1-ulp input
   * difference flips `round(_, 9)` only within ~1e-16 of a grid
   * boundary) so downstream arithmetic sees identical doubles in both
   * engines. Distributional cost: none at 9 digits.
   *
   * Residual cross-engine risk: Spark's round(double, 9) goes through
   * BigDecimal HALF_UP while DuckDB rounds via float multiply/divide,
   * so for inputs sitting exactly ON a 9-digit grid point the two can
   * still disagree by one ulp — a failure mode independent of the
   * 1-ulp-input analysis above. It has never fired over the oracle
   * sample sizes; if an oracle ever needs a hard guarantee, compare on
   * an integer grid instead — CAST(round(x * 1e9) AS BIGINT) on both
   * sides, the way the IVF centroid means already do.
   */
  def gaussian(seed: Long, stream: String, keys: Column*): Column = {
    val u1 = uniformPos(seed, stream + "/bm1", keys: _*)
    val u2 = uniform(seed, stream + "/bm2", keys: _*)
    round(sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2), 9)
  }

  /** Raw signed 64-bit hash (for UDF-side samplers needing a per-row
    * seed; never crosses engines, so xxhash64 is fine — and faster). */
  def hash64(seed: Long, stream: String, keys: Column*): Column =
    xxhash64((lit(seed) +: lit(stream) +: keys): _*)
}

/**
 * Scalar samplers for the distributions that need rejection loops
 * (gamma, beta, von Mises) — not expressible as closed-form inverse-CDF
 * Columns. Called from a UDF whose only input is a deterministic per-row
 * hash, so results stay partition-independent.
 *
 * Matches the *documented* semantics of the reference's random shapes
 * (README.md:133; src/main.py:531-573 — whose beta/gamma/weibull/gauss
 * branches are dead code due to the `call_obj_method` NameError, SURVEY
 * §2.8 fix 6).
 */
object Samplers {

  /** Marsaglia–Tsang gamma(shape=alpha, scale=1/beta-style rate=1); here we
    * mirror Python's random.gammavariate(alpha, beta) = Gamma(k=alpha,
    * theta=beta). */
  def gamma(rng: java.util.Random, alpha: Double, beta: Double): Double = {
    if (alpha < 1.0) {
      // Johnk / boost: Gamma(a) = Gamma(a+1) * U^(1/a)
      val u = nextPos(rng)
      gamma(rng, alpha + 1.0, beta) * math.pow(u, 1.0 / alpha)
    } else {
      val d = alpha - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      var result = 0.0
      var done = false
      while (!done) {
        var x = 0.0
        var v = 0.0
        do { x = rng.nextGaussian(); v = 1.0 + c * x } while (v <= 0.0)
        v = v * v * v
        val u = nextPos(rng)
        if (u < 1.0 - 0.0331 * x * x * x * x ||
            math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v))) {
          result = d * v * beta
          done = true
        }
      }
      result
    }
  }

  /** Beta(alpha, beta) via two gammas. */
  def beta(rng: java.util.Random, alpha: Double, b: Double): Double = {
    val x = gamma(rng, alpha, 1.0)
    val y = gamma(rng, b, 1.0)
    if (x + y == 0.0) 0.0 else x / (x + y)
  }

  /** Von Mises(mu, kappa) — Best & Fisher (1979), as in CPython's
    * random.vonmisesvariate. */
  def vonMises(rng: java.util.Random, mu: Double, kappa: Double): Double = {
    if (kappa <= 1e-6) return 2.0 * math.Pi * rng.nextDouble()
    val s = 0.5 / kappa
    val r = s + math.sqrt(1.0 + s * s)
    var z = 0.0
    var done = false
    while (!done) {
      val u1 = rng.nextDouble()
      z = math.cos(math.Pi * u1)
      val d = z / (r + z)
      val u2 = rng.nextDouble()
      if (u2 < 1.0 - d * d || u2 <= (1.0 - d) * math.exp(d)) done = true
    }
    val q = 1.0 / r
    val f = (q + z) / (1.0 + q * z)
    val u3 = rng.nextDouble()
    val theta =
      if (u3 > 0.5) (mu + math.acos(f)) % (2.0 * math.Pi)
      else (mu - math.acos(f)) % (2.0 * math.Pi)
    // Python-style floored mod: CPython's vonmisesvariate returns [0, 2π);
    // Scala's % keeps the dividend's sign and would leave half the mass
    // negative for small mu.
    if (theta < 0.0) theta + 2.0 * math.Pi else theta
  }

  private def nextPos(rng: java.util.Random): Double = {
    var u = rng.nextDouble()
    while (u <= 0.0) u = rng.nextDouble()
    u
  }
}
