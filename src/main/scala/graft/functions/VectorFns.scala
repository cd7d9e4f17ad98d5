package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built from
  * array HOFs (`zip_with`/`aggregate`) — no UDFs. (Spark evaluates HOFs
  * interpreted, not codegen'd; at 64 dims per row that costs microseconds
  * and these stay off the shuffle path, so the HOF form is kept for
  * clarity. A custom codegen `Expression` is the documented escalation if
  * a profile ever shows the dot product hot.)
  *
  * Cross-engine determinism: floats are lifted to **dyadic fixed-point**
  * longs (`floor(x · 2^20)`) before any arithmetic. Multiplying by a power
  * of two is exact in IEEE doubles (pure exponent shift), so the lift loses
  * the same ulps in every engine, and all dot products become *integer*
  * sums — associative, order-independent, and bit-identical under any
  * shuffle or oracle. Magnitudes: |x| ≲ 1 ⇒ components < 2^21, squares
  * < 2^42, 64-dim sums < 2^48 — far from Long overflow (ANSI-safe).
  */
object VectorFns {

  /** Fixed-point scale 2^20. */
  val Scale: Long = 1L << 20

  /** Lift `array<float>` to dyadic fixed-point `array<bigint>`. */
  def fixedPoint(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * Scale).cast("long"))

  /** Integer dot product of two fixed-point vectors. */
  def dotFx(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity (double) of two fixed-point vectors. The integer
    * dot/norms are exact; the final divide/sqrt are identical IEEE ops in
    * any engine, so results hash-match without tolerance.
    */
  def cosineFx(a: Column, b: Column): Column =
    dotFx(a, b).cast("double") /
      sqrt(dotFx(a, a).cast("double") * dotFx(b, b).cast("double"))

  /** Deterministic ±1 random-hyperplane component for (dimension i, plane
    * j): a fixed arithmetic pattern, reproducible in plain SQL — no RNG.
    */
  def hyperplaneSign(i: Column, j: Column): Column =
    when(((i * 31 + j * 17) % 7) < 3, lit(1L)).otherwise(lit(-1L))

  /** Signed projection of a fixed-point vector onto hyperplane j. */
  def projectFx(vec: Column, j: Column): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * hyperplaneSign(i, j)),
      lit(0L), (acc, v) => acc + v)

  /** `nBits`-bit sign-LSH code of a fixed-point vector: bit j set iff the
    * projection onto hyperplane j is positive. One pass per plane, all
    * inside codegen.
    */
  def lshCode(vec: Column, nBits: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nBits - 1)),
        j => when(projectFx(vec, j) > 0,
          call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
}
