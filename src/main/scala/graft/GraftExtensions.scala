package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions entry point so graft's native functions are
  * available on any cluster without code changes:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * (Operators call `VectorExpressions.register` themselves, so the
  * extension is a convenience for SQL-only users, not a requirement.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSim(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[graft.functions.LshBucket].getName, "lsh_bucket"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.LshBucket(exprs.head,
          exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int],
          if (exprs.length > 3) exprs(3).eval().asInstanceOf[Int] else 0)))
  }
}
