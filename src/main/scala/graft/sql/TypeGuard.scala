package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The reference's compile-time expression type validation
  * (compare_expression.rs; tests/type_validation_test.rs), enforced on
  * GraftApp predicates BEFORE they reach Catalyst. Spark's analyzer is
  * deliberately lenient here — `BOOL > BOOL` orders booleans and
  * `'5' = 5` coerces — so a reference app relying on these being rejected
  * would silently change meaning without this pass.
  *
  * Rules (compare_expression.rs:52-108):
  *  - BOOL participates only in `=` / `!=` — ordering comparisons on a
  *    boolean operand are typed errors ("Only == and != supported for BOOL")
  *  - STRING never compares with INT/LONG/FLOAT/DOUBLE/BOOL (any operator)
  *  - numeric cross-type comparisons (int/long/float/double) stay allowed
  *  - `NOT` requires a boolean operand (test_1_6)
  *  - single-part attributes in WHERE must exist in the input schema
  *    (test_1_3; Spark would also fail, but later and untyped)
  *
  * Deliberately conservative: a side whose type is not statically derivable
  * (function calls, nested comparisons, multi-part refs that resolve
  * ambiguously) is skipped rather than guessed — exactly the set the
  * reference validates (attributes and constants have declared types there).
  * STRING vs DATE/TIMESTAMP stays legal: the reference's time domain is
  * LONG millis, so the case never arises there, while GraftApp DDL has real
  * temporal columns and `ts > '2020-01-01'` is idiomatic Spark.
  */
object TypeGuard {

  import GraftApp.SqlError

  private def typeIn(schema: StructType, name: String): Option[DataType] = {
    val hits = schema.fields.filter(_.name.equalsIgnoreCase(name))
    hits.map(_.dataType).distinct match {
      case Array(one) => Some(one)
      case _ => None // absent or ambiguous with conflicting types
    }
  }

  private def typeOf(e: Expression, schema: StructType): Option[DataType] = e match {
    case a: UnresolvedAttribute => typeIn(schema, a.nameParts.last)
    case l: Literal => Some(l.dataType)
    case c: Cast => Some(c.dataType)
    case _ => None
  }

  private def isNumeric(d: DataType): Boolean = d.isInstanceOf[NumericType]

  /** Validate one predicate string against the frame schema it will run on.
    * `checkUndefined` is enabled for WHERE (attributes must come from the
    * source schema) and disabled for HAVING / join ON, where rewritten
    * hidden-aggregate refs and stream-qualified names are legal.
    */
  def check(spark: SparkSession, predSql: String, schema: StructType,
            checkUndefined: Boolean): Unit = {
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(predSql)
      catch { case _: Exception => return } // parse errors surface via expr()
    parsed.foreach {
      case cmp: BinaryComparison =>
        val lt = typeOf(cmp.left, schema)
        val rt = typeOf(cmp.right, schema)
        val isEquality = cmp.isInstanceOf[EqualTo] || cmp.isInstanceOf[EqualNullSafe]
        if (!isEquality &&
            (lt.contains(BooleanType) || rt.contains(BooleanType)))
          throw SqlError(
            s"Only == and != supported for BOOL comparisons: '${cmp.sql}'")
        (lt, rt) match {
          case (Some(l), Some(r)) =>
            val mixed =
              (l == StringType && (isNumeric(r) || r == BooleanType)) ||
              (r == StringType && (isNumeric(l) || l == BooleanType))
            if (mixed) throw SqlError(
              s"Cannot compare ${l.simpleString} with ${r.simpleString}: '${cmp.sql}'")
          case _ => ()
        }
      case Not(child) =>
        typeOf(child, schema) match {
          case Some(dt) if dt != BooleanType =>
            throw SqlError(s"NOT requires a BOOL operand, got ${dt.simpleString}")
          case _ => ()
        }
      case a: UnresolvedAttribute
          if checkUndefined && a.nameParts.length == 1 &&
            schema.fields.forall(!_.name.equalsIgnoreCase(a.nameParts.head)) =>
        throw SqlError(
          s"undefined attribute '${a.name}' (schema: ${schema.fieldNames.mkString(", ")})")
      case _ => ()
    }
  }
}
