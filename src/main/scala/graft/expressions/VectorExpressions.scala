package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native vector math for embedding similarity (array<double> inputs).
  *
  * The declarative `aggregate(zip_with(...))` folds evaluate interpreted —
  * ~16M lambda dispatches on a 41k-candidate near-dup pass measured 6s.
  * These expressions run the SAME additions in the SAME order as the
  * declarative forms (three sequential accumulators), so results stay
  * bit-identical — including to DuckDB's list_cosine_similarity, which the
  * q40 oracle depends on.
  */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // dimension-mismatched inputs yield null even when both inputs are
  // non-null, so nullability cannot be derived from the children alone
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // a prefix cosine over mismatched dimensions would be silently wrong;
    // null matches the declarative zip_with reference (null-propagating
    // pads) and DuckDB's list_cosine_similarity error/null behavior
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $x.getDouble($i);
         |    final double $yi = $y.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** Sign-LSH signature: bit b = [v · proj(b) > 0], packed little-endian into
  * an int. The projection matrix is a plan-time constant baked into the
  * generated code.
  */
case class SignLshSignature(child: Expression, proj: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val flat: Array[Double] = proj.flatten
  private def nBits: Int = proj.length
  private def dim: Int = if (proj.isEmpty) 0 else proj(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // ANY dimension mismatch yields signature 0 — the declarative
    // reference null-propagates every dot product for short vectors
    // (zip_with pads with null), and treating long vectors the same keeps
    // the behavior symmetric instead of signing a silent prefix
    if (v.numElements() != dim) return java.lang.Integer.valueOf(0)
    var sig = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      val off = b * dim
      while (i < dim) { dot += v.getDouble(i) * flat(off + i); i += 1 }
      if (dot > 0) sig |= (1 << b)
      b += 1
    }
    java.lang.Integer.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val projRef = ctx.addReferenceObj("proj", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      s"""
         |${ev.value} = 0;
         |if ($v.numElements() == $dim) {
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $dot = 0.0;
         |    final int $off = $b * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $v.getDouble($i) * $projRef[$off + $i];
         |    }
         |    if ($dot > 0) ${ev.value} |= (1 << $b);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshSignature =
    copy(child = newChild)
}

/** The `n` nearest centroid ids to a vector by squared L2 distance (ties to
  * the lower cid), as `array<int>` in ascending-distance order. The centroid
  * table — k·dim doubles, tiny at any corpus size — is a plan-time constant
  * baked into the generated code, so IVF assignment/probing is ONE projection
  * over the corpus: zero exchange, zero row amplification. (The alternative
  * join-against-centroids + window-argmin shape shuffles an n×k frame — a
  * 16× amplification at k=16 that this expression exists to remove.)
  *
  * Distance accumulates (x−y)² in index order — bit-identical to the
  * declarative `aggregate(zip_with(...))` fold in [[graft.functions.Similarity.distSq]],
  * so argmin ranks agree exactly with the window-based reference (and with a
  * SQL oracle ordering by monotone `list_distance`).
  */
case class NearestCentroids(
    child: Expression, cids: Array[Int], cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  require(cents.nonEmpty && n >= 1 && n <= cents.length,
    s"NearestCentroids: need 1 <= n=$n <= k=${cents.length}")
  require(cids.length == cents.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // dimension-mismatched input yields null (a prefix distance would be
  // silently wrong), so nullability is not derivable from the child alone
  override def nullable: Boolean = true

  @transient private lazy val flat: Array[Double] = cents.flatten
  private def k: Int = cents.length
  private def dim: Int = cents(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) {
        val d = v.getDouble(i) - flat(off + i)
        acc += d * d
        i += 1
      }
      d2(c) = acc
      c += 1
    }
    val used = new Array[Boolean](k)
    val out = new Array[Int](n)
    var r = 0
    while (r < n) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!used(j) && (best < 0 || d2(j) < d2(best) ||
            (d2(j) == d2(best) && cids(j) < cids(best)))) best = j
        j += 1
      }
      used(best) = true
      out(r) = cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cents", flat, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val d2 = ctx.freshName("d2"); val used = ctx.freshName("used")
      val out = ctx.freshName("out"); val acc = ctx.freshName("acc")
      val off = ctx.freshName("off"); val df = ctx.freshName("df")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val r = ctx.freshName("r"); val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $d2 = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    final int $off = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double $df = $v.getDouble($i) - $flatRef[$off + $i];
         |      $acc += $df * $df;
         |    }
         |    $d2[$c] = $acc;
         |  }
         |  final boolean[] $used = new boolean[$k];
         |  final int[] $out = new int[$n];
         |  for (int $r = 0; $r < $n; $r++) {
         |    int $best = -1;
         |    for (int $j = 0; $j < $k; $j++) {
         |      if (!$used[$j] && ($best < 0 || $d2[$j] < $d2[$best] ||
         |          ($d2[$j] == $d2[$best] && $cidsRef[$j] < $cidsRef[$best]))) $best = $j;
         |    }
         |    $used[$best] = true;
         |    $out[$r] = $cidsRef[$best];
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object VectorExpressions {
  def vecCosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosine(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def signLshSignature(vec: Column, proj: Array[Array[Double]]): Column =
    GraftColumnBridge.column(SignLshSignature(GraftColumnBridge.expression(vec), proj))

  /** `n` nearest centroids of `vec` as `array<int>` of cids, nearest first.
    * @param cents (cid, centroid) pairs; k·dim doubles baked into codegen
    */
  def nearestCentroids(vec: Column, cents: Array[(Int, Array[Double])], n: Int): Column =
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(vec), cents.map(_._1), cents.map(_._2), n))
}
