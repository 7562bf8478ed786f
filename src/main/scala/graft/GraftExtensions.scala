package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, VectorDot}

/** SparkSessionExtensions hook (SURVEY.md §4.3): registers the native
  * vector expressions as SQL functions, so the engine's surface is also
  * reachable from pure SQL:
  *
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  *
  * Wire it with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (done in Verify/Bench/Smoke) or on any user-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(
      name: String, build: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(build.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects 2 arguments")
        build(children(0), children(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("cosine_sim", CosineSimilarity))
    ext.injectFunction(binary("vector_dot", VectorDot))
  }
}
