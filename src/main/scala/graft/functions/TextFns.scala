package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data pipeline operators.
  *
  * Everything here is built from `functions._` expressions (no UDFs):
  * shuffle-free, single-pass-per-document, usable in any plan position.
  * One caveat learned by measurement: Spark evaluates array *higher-order*
  * functions (`transform`/`aggregate`/`zip_with`) interpreted
  * (CodegenFallback), so the HOF forms here are the compact reference
  * implementations — hot paths use relational equivalents that stay inside
  * whole-stage codegen (see operators.Dedup.docShingles /
  * simhashSignatures, with parity specs asserting equivalence).
  */
object TextFns {

  /** Whitespace tokenization of trimmed text. Note: empty/whitespace-only
    * input yields `[""]` (one empty token), matching DuckDB's
    * `string_split_regex` exactly — the oracle parity contract outranks the
    * arguably-nicer 0-token behavior; filter empties at call sites that
    * need them gone.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Canonical content fingerprint: md5 of the whitespace-normalized token
    * stream — the ONE definition both exact dedup (group key) and the
    * published `text_fingerprint` column share, so they cannot drift.
    */
  def fingerprint(text: Column): Column = md5(array_join(tokens(text), " "))

  /** Total non-whitespace characters (token mass). */
  def tokenChars(text: Column): Column = length(regexp_replace(text, "\\s+", ""))

  /** Distinct word n-gram shingles of a token array: for each window start
    * i, join `n` consecutive tokens with a single space. Documents shorter
    * than `n` tokens yield an empty array.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens belonging to a fixed vocabulary. */
  def countIn(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab: _*)))

  /** Prime modulus for the MinHash permutation family (> 2^31). */
  val minhashPrime: Long = 2147483659L

  /** k-th MinHash permutation: `(a_k·x + b_k) mod p` over the low 31 bits of
    * the base hash. The mod-prime is essential — an affine map without it is
    * monotonic, so every "permutation" would share the same argmin shingle
    * and the 32 signature lanes would be perfectly correlated. Bounds:
    * a,b < p ≈ 2^31, x < 2^31 ⇒ a·x+b < 2^62, no Long overflow under ANSI.
    * Deterministic — multipliers derive from k, no runtime seeds.
    */
  def minhashPerm(baseHash: Column, k: Int): Column = {
    val p = minhashPrime
    val a = ((2L * k + 1L) * 2654435761L) % p
    val b = (k * 1000003L + 12345L) % p
    pmod(baseHash.bitwiseAND(lit(0x7FFFFFFFL)) * lit(a) + lit(b), lit(p))
  }

  /** 128-bit SimHash of a token array, single pass, no explode: fold the
    * tokens into 128 signed bit-counters (`zip_with` add), then collapse
    * counter signs back into two 64-bit masks `[sim_hi, sim_lo]` (bits
    * 64-127 and 0-63). Stays entirely within array HOFs — one row in, one
    * row out, shuffle-free.
    */
  def simhash128(toks: Column): Column = {
    // functions.shiftright/shiftleft only take literal Int bit counts, so the
    // per-bit-position lambdas call the SQL functions (column-typed args).
    def shr(x: Column, b: Column) = call_function("shiftright", x, b)
    def shl(x: Column, b: Column) = call_function("shiftleft", x, b)
    // 128 token-hash bits from four 32-bit md5 truncations — the
    // DuckDB-reproducible hash the hot-path formulation uses (Dedup
    // .simhashSignatures); the parity spec pins the two bit-for-bit.
    // Word i holds signature bits 32i..32i+31 (w0 = lowest hex chars
    // 25-32, … w3 = chars 1-8), matching the relational formulation.
    def word(t: Column, i: Int) =
      conv(substring(md5(t), 25 - 8 * i, 8), 16, 10).cast("long")
    val bitVotes = aggregate(
      toks,
      array_repeat(lit(0L), 128),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(127)),
          b => when(b < 32, shr(word(t, 0), b))
            .when(b < 64, shr(word(t, 1), b - 32))
            .when(b < 96, shr(word(t, 2), b - 64))
            .otherwise(shr(word(t, 3), b - 96))
            .bitwiseAND(lit(1L)) * 2 - 1),
        (a, v) => a + v))
    def pack(votes: Column): Column = aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
    array(pack(slice(bitVotes, 65, 64)), pack(slice(bitVotes, 1, 64)))
  }
}
