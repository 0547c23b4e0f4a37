package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Static encode loop shared by eval and codegen — see [[PqEncode]]. */
object PqCodec {

  /** argmax_c (v_j · c − ‖c‖²/2) per subspace j, first-best-wins
    * tie-break (≡ lower centroid id). `norms2half(j)(c)` is
    * precomputed ‖c‖²/2. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]],
      norms2half: Array[Array[Double]]): ArrayData = {
    val m = cb.length
    val sub = cb(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = cb(j)
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0.0
        var i = 0
        while (i < sub) { dot += v.getDouble(j * sub + i) * cent(i); i += 1 }
        val score = dot - norms2half(j)(c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native Catalyst expression: PQ-encode an `array<double>` vector
  * into its m sub-codes in ONE fused loop over the vector.
  *
  * Exists for the same reason as [[SimhashFromVotes]] and
  * [[ShingleHashes]]: the declarative form (per subspace, an
  * `array_max` over 16 `struct(DotProduct(slice(v,…)), …)` entries —
  * 128 dot products, 128 slice allocations, a ~thousand-node
  * expression tree) spends more wall-clock in Janino+C2 compilation
  * than in execution, and allocates sub-array copies per centroid.
  * This expression reads the vector in place (no slices) and emits
  * one static call; the codebooks ride along as a reference object.
  * Scoring uses the same argmax dot−‖c‖²/2 identity and
  * first-best-wins (= lowest centroid id) tie-break, pinned against
  * a driver-side reference encoder in PqSpec.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val norms2half: Array[Array[Double]] =
    codebooks.map(_.map(_.map(x => x * x).sum / 2))

  override def nullSafeEval(v: Any): Any =
    PqCodec.encode(v.asInstanceOf[ArrayData], codebooks, norms2half)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val nh = ctx.addReferenceObj("pqNorms", norms2half, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqCodec.encode($c, $cb, $nh);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array fields compare by reference under case-class equality, which
  // would make two identical encodes semantically unequal — breaking
  // Catalyst canonicalization / common-subexpression reuse. Compare
  // the codebooks by value instead.
  override def equals(other: Any): Boolean = other match {
    case that: PqEncode =>
      child == that.child && java.util.Arrays.deepEquals(
        codebooks.asInstanceOf[Array[AnyRef]],
        that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])
}

object PqEncode {
  def apply(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    toColumn(PqEncode(toExpression(v), codebooks))
}
