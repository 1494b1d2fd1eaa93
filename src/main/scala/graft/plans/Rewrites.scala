package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: canonicalize the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)
  *
  * into the native codegen'd [[DotProduct]] expression, so a user who
  * writes the idiomatic higher-order-function SQL gets the primitive
  * inner loop (no per-element boxing, stays inside WholeStageCodegen)
  * without knowing the native function exists.
  *
  * The rewrite is deliberately CONSERVATIVE — it must be
  * semantics-preserving, not approximately right:
  *  - both arrays must be `array<double>` with non-nullable elements
  *    (a null element makes the HOF form yield NULL, while
  *    DotProduct's primitive loop would read garbage);
  *  - the result is wrapped in `if (size(a) = size(b)) dot else null`
  *    because zip_with null-pads the shorter side (HOF → NULL) while
  *    DotProduct truncates — the guard restores the HOF semantics;
  *  - the fold seed must be literal +0.0 bit-exactly (a −0.0 seed is
  *    observable when every product is −0.0);
  *  - multiply/add operands may bind the lambda variables in either
  *    order (IEEE multiplication and addition are commutative
  *    bit-for-bit; associativity is NOT assumed — the fold order is
  *    unchanged), and the aggregate's finish lambda must be the
  *    identity.
  *
  * Float-exactness: for equal-length, non-null inputs the HOF form is
  * the same left-to-right multiply-add chain over the same doubles,
  * so the rewrite is bit-identical (the repo's oracle-pinned claim
  * for Similarity.dot).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {
  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  private def sameVarSet(x: NamedLambdaVariable, y: NamedLambdaVariable,
      p: NamedLambdaVariable, q: NamedLambdaVariable): Boolean =
    Set(x.exprId, y.exprId) == Set(p.exprId, q.exprId) && x.exprId != y.exprId

  /** The rewrite duplicates each input into the size guard and the
    * dot, so it only fires on inputs that are free to re-evaluate
    * (column references, literals, struct-field extraction chains).
    * An expensive array-producing input (e.g. a transform()) keeps
    * the HOF form — correct either way; this only avoids paying the
    * guard's second evaluation when CSE doesn't cover the If. */
  private def cheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case g: GetStructField => cheap(g.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(
                Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(
              Add(aL: NamedLambdaVariable, aR: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fv: NamedLambdaVariable,
              Seq(fa: NamedLambdaVariable), _))
          // a/b are DUPLICATED into the size guard and the dot — a
          // non-deterministic array would be evaluated independently
          // per copy, letting the guard validate a different array
          // than the one dotted (Catalyst convention: never duplicate
          // non-deterministic expressions)
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            a.deterministic && b.deterministic &&
            cheap(a) && cheap(b) &&
            nonNullDoubleArray(a) && nonNullDoubleArray(b) &&
            sameVarSet(mx, my, zx, zy) &&
            sameVarSet(aL, aR, acc, v) &&
            fv.exprId == fa.exprId =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false)),
          DotProduct(a, b),
          Literal(null, DoubleType))
    }
}
