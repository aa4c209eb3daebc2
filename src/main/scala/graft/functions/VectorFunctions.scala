package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector primitives over `array<float>` embedding
  * columns. Higher-order `zip_with`/`aggregate` expressions — row-local,
  * shuffle-free, linear in the vector dimension. */
object VectorFunctions {

  /** Dot product in double precision (left-to-right accumulation:
    * deterministic). Backed by the codegen'd native expression — the HOF
    * spelling below is kept as the readable reference implementation and
    * produces bit-identical results. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.floatDot(a, b)

  /** Higher-order-function reference implementation of [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Symmetric int8 scalar quantization: `scale = max|v| / 127` (1.0 for an
    * all-zero vector), `q_i = round(v_i / scale)` — a (scale, array<tinyint>)
    * struct that stores the vector in a quarter of float32's bytes. At
    * corpus scale this is the standard ANN compression: 100 TB of float
    * embeddings become 25 TB with ≲1% cosine error at 64 dims. Pure
    * deterministic double arithmetic, exactly re-derivable in ANSI SQL. */
  def quantizeInt8(vec: Column): Column = {
    val mx = array_max(transform(vec, v => abs(v.cast("double"))))
    val scale = when(mx === 0.0, 1.0).otherwise(mx / 127.0)
    struct(
      scale.as("scale"),
      transform(vec, v => round(v.cast("double") / scale).cast("tinyint")).as("q"))
  }

  /** Dot product of two [[quantizeInt8]] structs: the integer component sum
    * is exact, the two scales multiply back in at the end — one FP multiply
    * chain per pair instead of per component. */
  def dotInt8(a: Column, b: Column): Column =
    a.getField("scale") * b.getField("scale") *
      aggregate(
        zip_with(a.getField("q"), b.getField("q"), (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v).cast("double")

  /** Cosine over quantized vectors; 0 when either has zero norm. */
  def cosineInt8(a: Column, b: Column): Column = {
    val d = dotInt8(a, b)
    val nn = sqrt(dotInt8(a, a)) * sqrt(dotInt8(b, b))
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): derived
    * from xxhash64 so every executor materializes the identical plane
    * without broadcasting anything. */
  private def planeComponent(plane: Column, i: Column): Column =
    (pmod(xxhash64(plane * 8192 + i), lit(2001)).cast("double") - 1000.0) / 1000.0

  /** Signed projection of `vec` onto pseudo-random hyperplane `plane`. */
  def planeDot(vec: Column, plane: Column, dim: Int): Column =
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
      (acc, i) => acc + element_at(vec, i + 1).cast("double") * planeComponent(plane, i))

  /** Random-hyperplane LSH bucket as an `nbits`-char sign string. Vectors
    * with high cosine similarity collide with high probability; used to
    * restrict pairwise work to within-bucket candidates. */
  def lshBucket(vec: Column, nbits: Int, dim: Int): Column =
    lshBucketTable(vec, nbits, dim, 0)

  /** Bucket for hash table `table` — each table uses a disjoint set of
    * hyperplanes so multiple tables give independent collision chances. */
  def lshBucketTable(vec: Column, nbits: Int, dim: Int, table: Int): Column =
    concat(
      (0 until nbits).map(j =>
        when(planeDot(vec, lit(table * nbits + j), dim) > 0.0, "1").otherwise("0")): _*)

  /** Multi-probe bucket sequence (Lv et al., VLDB 2007, adapted to
    * sign/hyperplane LSH): the base bucket of table 0 as a long bit code,
    * followed by the buckets reached by flipping the sign bits with the
    * SMALLEST |projection margin| — the bits most likely to differ for a
    * true near neighbor. `rankSubsets` is the driver-side probing
    * schedule: each entry is a set of margin RANKS (0 = smallest margin)
    * to flip together for one extra probe (see
    * [[graft.operators.Dedup.perturbationSets]]).
    *
    * Row-local O(nbits·dim) arithmetic (the same planes as
    * [[lshBucketTable]] table 0, in code form): margins → margin-ranked
    * bit order → base XOR per-subset flip masks. Returns
    * `array<long>` of `1 + rankSubsets.size` probe codes, base first. */
  def lshProbeBuckets(
      vec: Column,
      nbits: Int,
      dim: Int,
      rankSubsets: Seq[Seq[Int]]): Column = {
    require(nbits >= 1 && nbits <= 62, "nbits must be in [1, 62] for a long code")
    require(rankSubsets.forall(s => s.nonEmpty && s.forall(r => r >= 0 && r < nbits)),
      "every probe subset must be a non-empty set of margin ranks < nbits")
    // LET-BINDING VIA LAMBDA: Catalyst has no let, and codegen's
    // common-subexpression elimination does not reach inside nested array
    // constructors — a naive spelling re-evaluated the O(nbits·dim)
    // margins array at EVERY reference (once per sign bit, once per
    // sorted-struct element, once per flip-mask rank lookup), measured
    // 66 s vs 4 s on the sf0.1 audit at (nbits=6, T=32). Wrapping each
    // intermediate in a 1-element array and `transform`ing binds it to a
    // lambda variable, which IS evaluated once — planeDot runs exactly
    // nbits times per row regardless of probe count.
    def let1(value: Column)(body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    val marginsArr = array((0 until nbits).map(j => planeDot(vec, lit(j), dim)): _*)
    let1(marginsArr) { m =>
      val base = (0 until nbits)
        .map(j => when(element_at(m, j + 1) > 0.0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
      // bit indices ordered by |margin| ascending (ties by index — total order)
      val rankedIdx = transform(
        array_sort(array((0 until nbits).map(j =>
          struct(abs(element_at(m, j + 1)).as("m"), lit(j).as("j"))): _*)),
        s => s.getField("j"))
      let1(rankedIdx) { ranked =>
        // base is arithmetic over the BOUND m — cheap per reference
        def flipMask(sub: Seq[Int]): Column = sub
          .map(r => call_function("shiftleft", lit(1L), element_at(ranked, r + 1)))
          .reduce(_.bitwiseOR(_))
        array((base +: rankSubsets.map(s => base.bitwiseXOR(flipMask(s)))): _*)
      }
    }
  }
}
