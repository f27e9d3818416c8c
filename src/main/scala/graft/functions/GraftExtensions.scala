package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst expressions available in ANY session (including pure-SQL
  * users and Thrift/Connect servers) via
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * — the idiomatic deployment path; `GraftFunctions.register` remains
  * the programmatic equivalent for sessions built without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv64"),
      (exprs: Seq[Expression]) => FnvHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (exprs: Seq[Expression]) => DotProductF32(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerSim(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_key"),
      new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
      (exprs: Seq[Expression]) => HilbertKey(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (exprs: Seq[Expression]) => GraftFunctions.unicodeNormalizeBuilder(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "strip_accents"),
      (exprs: Seq[Expression]) => StripAccentsExpr(exprs.head)))
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    // whole-operator extension: plans graft.plans.AsofJoin to the
    // merge AsofJoinExec (programmatic sessions get it idempotently
    // from Asof.ensureStrategy at the DSL entry point)
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
  }
}
