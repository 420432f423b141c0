package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the MinHash/LSH dedup tier
  * (optimization r19, guide §1.2 step 2 / "eliminate non-codegen
  * expressions in the hot path").
  *
  * The portable Carter-Wegman minhash signature was previously built
  * from 64 independent `array_min(transform(x, v => (a*v + b) % p))`
  * higher-order expressions — HOFs run interpreted (no whole-stage
  * codegen), each allocating an intermediate |x|-element array per
  * permutation per row: 64 array allocations and ~64·|x| boxed lambda
  * dispatches per document. [[CwMinhashSigs]] computes the identical
  * 64 minima in ONE pass over the `ArrayData` buffer inside codegen —
  * same integer arithmetic ((a·v + b) mod p with a·v < 2^62, exact in
  * long), min is order-insensitive, so the output is bit-identical.
  *
  * Single source of truth for the per-permutation constants: the
  * SplitMix64 derivation lives HERE; `graft.queries.PortableLsh`
  * aliases these arrays and interpolates them into the DuckDB oracle.
  */
object CwMinhash {
  val P: Long = 2147483647L // 2^31 - 1, prime
  val NumPerms = 64

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** alpha in [1, p-1], beta in [0, p-1] — fixed, engine-shared. */
  val alphas: Array[Long] =
    Array.tabulate(NumPerms)(i => Math.floorMod(splitmix64(0xA1FAL + i), P - 1) + 1)
  val betas: Array[Long] =
    Array.tabulate(NumPerms)(i => Math.floorMod(splitmix64(0xBE7AL + i), P))
}

/** The 64-row Carter-Wegman minhash signature of an `array<long>` of
  * word base hashes — array<long> of per-permutation minima. Null
  * elements of the input are skipped (matching `array_min`); an input
  * with no non-null elements yields 64 null elements (as 64
  * `array_min(transform(empty))` calls would). */
case class CwMinhashSigs(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {
  import CwMinhash._

  // reject mistyped SQL at analysis time (ADVICE r19 #5): these are
  // user-callable functions, and getLong over a mistyped ArrayData
  // would silently misread or throw a runtime ClassCastException
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val mins = new Array[Long](NumPerms)
    var seen = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = x.getLong(i)
        if (!seen) {
          var j = 0
          while (j < NumPerms) { mins(j) = (alphas(j) * v + betas(j)) % P; j += 1 }
          seen = true
        } else {
          var j = 0
          while (j < NumPerms) {
            val h = (alphas(j) * v + betas(j)) % P
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
      }
      i += 1
    }
    if (seen) UnsafeArrayData.fromPrimitiveArray(mins)
    else new GenericArrayData(new Array[Any](NumPerms))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val alphasRef = ctx.addReferenceObj("alphas", CwMinhash.alphas, "long[]")
      val betasRef = ctx.addReferenceObj("betas", CwMinhash.betas, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $x.numElements();
         |long[] $mins = new long[$NumPerms];
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $v = $x.getLong($i);
         |    if (!$seen) {
         |      for (int $j = 0; $j < $NumPerms; $j++)
         |        $mins[$j] = ($alphasRef[$j] * $v + $betasRef[$j]) % ${P}L;
         |      $seen = true;
         |    } else {
         |      for (int $j = 0; $j < $NumPerms; $j++) {
         |        long $h = ($alphasRef[$j] * $v + $betasRef[$j]) % ${P}L;
         |        if ($h < $mins[$j]) $mins[$j] = $h;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $seen
         |  ? (org.apache.spark.sql.catalyst.util.ArrayData)
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins)
         |  : (org.apache.spark.sql.catalyst.util.ArrayData)
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$NumPerms]);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CwMinhashSigs =
    copy(child = c)
}

/** The 64-row xxhash64-seeded minhash signature of an `array<long>`
  * of word hashes — array<long> of per-seed minima (optimization r20;
  * VERDICT r19 next #1: the `CwMinhashSigs` treatment applied to the
  * xxhash64 family that dedup_minhash_lsh's banding ships).
  *
  * Bit-identical to 64 `array_min(transform(w, t => xxhash64(t,
  * lit(k))))` calls for k = 0..63: Spark's `xxhash64(t, lit(k))`
  * folds the children through XXH64 starting at the default seed 42 —
  * `hashInt(k, hashLong(t, 42))` with k an IntegerType literal — and
  * a null element leaves the running hash at 42 before the k-fold
  * (`hashInt(k, 42)`), never yielding a null term, so `array_min`
  * over a non-empty input is a min over all elements. An empty input
  * yields 64 null elements (as 64 `array_min(transform(empty))` calls
  * would). `hashLong(t, 42)` is shared across all 64 seeds — computed
  * once per element here, where the HOF form recomputed it per
  * permutation. */
case class XxMinhashSigs(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {
  import CwMinhash.NumPerms

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "xx_minhash_sigs"

  override def nullSafeEval(a: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](NumPerms))
    val mins = new Array[Long](NumPerms)
    var i = 0
    while (i < n) {
      val base = if (x.isNullAt(i)) 42L else XXH64.hashLong(x.getLong(i), 42L)
      if (i == 0) {
        var j = 0
        while (j < NumPerms) { mins(j) = XXH64.hashInt(j, base); j += 1 }
      } else {
        var j = 0
        while (j < NumPerms) {
          val h = XXH64.hashInt(j, base)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $x.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$NumPerms]);
         |} else {
         |  long[] $mins = new long[$NumPerms];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $base = $x.isNullAt($i) ? 42L : $xxh.hashLong($x.getLong($i), 42L);
         |    if ($i == 0) {
         |      for (int $j = 0; $j < $NumPerms; $j++)
         |        $mins[$j] = $xxh.hashInt($j, $base);
         |    } else {
         |      for (int $j = 0; $j < $NumPerms; $j++) {
         |        long $h = $xxh.hashInt($j, $base);
         |        if ($h < $mins[$j]) $mins[$j] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): XxMinhashSigs =
    copy(child = c)
}

/** Count of positions where two `array<long>` signatures hold equal
  * non-null values — the star-edge verification currency (agreement/64
  * is the unbiased Jaccard estimate). Bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
  * 0, (acc, v) => acc + v)` over equal-length null-free signatures;
  * positions where either side is null count 0 (the `when` otherwise
  * branch), and length-mismatched tails contribute 0 (zip_with pads
  * with null → `===` null → otherwise 0). */
case class ArrEqCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "arr_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i) && $x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrEqCount =
    copy(left = l, right = r)
}

/** Squared L2 distance over `array<double>`, summed in index order —
  * bit-identical to the left-to-right fold
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, (acc, v) => acc + v)`
  * over equal-length null-free vectors (every IVF/PQ stage's scoring
  * form), without the two intermediate array allocations per row.
  * Length-mismatched or null-element inputs return null, matching the
  * fold (zip_with pads with null → null term → null sum). */
case class VecSqDist(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}
