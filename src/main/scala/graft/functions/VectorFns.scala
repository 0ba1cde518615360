package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector primitives for embedding columns (`Array[Float]`).
  *
  * Two tiers:
  *  - [[cosine]] — a native Catalyst `Expression` with whole-stage codegen:
  *    one fused loop computing dot + both norms in double precision. This is
  *    the hot path for similarity search; it stays inside WholeStageCodegen
  *    (no UDF serialization boundary).
  *  - the `*Q` quantized family — components scaled to exact BIGINTs so dot
  *    products and norms are order-independent integer arithmetic. Used by
  *    the oracle-checked queries (bit-identical across engines) and the
  *    practical path for 100 TB ANN (quantized embeddings shrink shuffle
  *    width 4-8x; int dot product is SIMD-friendly).
  */
object VectorFns {

  private val FloatArr = ArrayType(FloatType)

  /** Fused cosine similarity over two float arrays, double accumulation. */
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a.cast(FloatArr)), expression(b.cast(FloatArr))))

  /** Quantize a float array to exact longs: floor(x * scale + 0.5).
    * Engine-independent by construction — float→double cast, the multiply,
    * the add, and floor are each single IEEE-754 operations with identical
    * results on any engine, unlike `round` (Spark rounds the shortest
    * decimal representation via BigDecimal; DuckDB rounds the binary
    * double — they disagree near .5).
    */
  def quantize(v: Column, scale: Int): Column =
    transform(v, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)

  /** Exact integer squared norm. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine over quantized vectors: exact integer sums, one double divide —
    * bit-identical on any engine that evaluates the same longs. Native
    * expression (one fused loop) — the HOF composition costs ~65 interpreted
    * lambda calls per pair.
    */
  def cosineQ(a: Column, b: Column): Column =
    column(QuantizedCosine(expression(a), expression(b)))
}

/** Quantized cosine over two long arrays: exact integer dot/norm sums (order
  * independent), then dot / (sqrt(na) * sqrt(nb)) as the single double
  * rounding point — reproducible bit-for-bit across engines.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xi = x.getLong(i); val yi = y.getLong(i)
      d += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $d = 0L, $na = 0L, $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $x.getLong($i);
         |  long $yi = $y.getLong($i);
         |  $d += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0L || $nb == 0L) ? 0.0
         |  : ((double) $d) / (Math.sqrt((double) $na) * Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (||a||·||b||) in one codegen'd loop.
  * Mirrors the role of a distance kernel in an ANN engine; cited shape:
  * reference embeddings are absent (no vector type there) — this is part of
  * the beyond-reference LLM-pipeline surface.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      d += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $d += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $d / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
