package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the native graft expressions, so
  * `spark.sql("SELECT graft_simhash64(...)")` works — both on a live
  * session ([[GraftFunctions.register]]) and at session build time
  * via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftFunctions {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> { args =>
      MinHashSignature(args.head, intLit(args(1), "k"))
    },
    "graft_simhash64" -> { args => SimHash64(args.head) },
    "graft_shingle_hashes" -> { args =>
      TokenShingleHashes(args.head, intLit(args(1), "n"))
    },
    "graft_winnow" -> { args =>
      WinnowFingerprint(args.head, intLit(args(1), "k"), intLit(args(2), "w"))
    })

  /** Register on an already-running session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** Injection point for `spark.sql.extensions`: the SQL function
  * surface plus the [[RewriteDotProduct]] optimizer rule (HOF
  * dot-product SQL → native codegen'd DotProduct). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), b))
    }
    e.injectOptimizerRule(_ => RewriteDotProduct)
  }
}
