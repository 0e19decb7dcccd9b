package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal, RegExpExtract, RegExpReplace, Sqrt}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, IntegerType, StringType}
import graft.functions.{ArrayDotProduct, Blake2bExpr, CharClassCounts, CharShingles, Md5Lanes, MisraGries, NfcNormalize, WordShingles}

/** SQL surface for graft's native expressions: `blake2b_hex(str[, digest])`,
  * `array_dot(a, b)`, `l2_norm(a)`, `word_shingles(text[, n])`,
  * `char_shingles(text, n)`, `char_class_counts(str)`, and
  * `nfc_normalize(str)` become callable from `spark.sql(...)` — the same
  * codegen'd expressions the DataFrame API uses, registered rather than
  * wrapped in UDFs.
  *
  * Two entry points for the two deployment shapes:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *    (applied when the session is built);
  *  - an existing session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def blake2bBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(c) => Blake2bExpr(c, 5)
    case Seq(c, Literal(d: Int, IntegerType)) => Blake2bExpr(c, d)
    case other => throw new IllegalArgumentException(
      s"blake2b_hex(str[, digest_size]) takes 1 or 2 arguments, got ${other.size}")
  }

  private def arrayDotBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) => ArrayDotProduct(
      Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
    case other => throw new IllegalArgumentException(
      s"array_dot(a, b) takes 2 arguments, got ${other.size}")
  }

  private def l2NormBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(a) =>
      val ad = Cast(a, ArrayType(DoubleType))
      Sqrt(ArrayDotProduct(ad, ad))
    case other => throw new IllegalArgumentException(
      s"l2_norm(a) takes 1 argument, got ${other.size}")
  }

  private def jaroWinklerBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) =>
      graft.functions.JaroWinkler(Cast(a, StringType), Cast(b, StringType))
    case other => throw new IllegalArgumentException(
      s"jaro_winkler(a, b) takes 2 arguments, got ${other.size}")
  }

  private def damerauBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(a, b) =>
      graft.functions.DamerauLevenshtein(
        Cast(a, StringType), Cast(b, StringType))
    case other => throw new IllegalArgumentException(
      s"damerau_levenshtein(a, b) takes 2 arguments, got ${other.size}")
  }

  private def wordShinglesBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(c) => WordShingles(c, 3)
    case Seq(c, Literal(n: Int, IntegerType)) => WordShingles(c, n)
    case other => throw new IllegalArgumentException(
      s"word_shingles(text[, n]) takes 1 or 2 arguments, got ${other.size}")
  }

  private def charShinglesBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(c, Literal(n: Int, IntegerType)) => CharShingles(c, n)
    // distinguish a bad second ARGUMENT from a bad ARITY — with 2 args the
    // failure is a non-literal / non-int n, and saying "got 2 args" would
    // point a SQL user at the wrong problem
    case Seq(_, n) => throw new IllegalArgumentException(
      s"char_shingles(text, n): n must be a literal INT (a column or " +
        s"non-int literal was passed: ${n.sql})")
    case other => throw new IllegalArgumentException(
      s"char_shingles(text, n) takes 2 arguments, got ${other.size}")
  }

  // returns the bare AggregateFunction — the analyzer wraps it, exactly as
  // for built-in aggregates registered through FunctionRegistry
  private def heavyHittersBuilder(children: Seq[Expression]): Expression = children match {
    case Seq(c, Literal(k: Int, IntegerType)) => MisraGries(c, k)
    case other => throw new IllegalArgumentException(
      s"heavy_hitters(item, k) takes a column and a literal int, got ${other.size} args")
  }

  // scrub_pii / url_* are Column compositions in the DataFrame API; here
  // the same shared pattern constants are assembled into catalyst nodes
  // directly — a registry builder must return a resolvable Expression, and
  // Column round-tripping leaves UnresolvedFunction nodes the analyzer
  // won't touch inside an already-built expression.
  private def unary(name: String, f: Expression => Expression)
      (children: Seq[Expression]): Expression = children match {
    case Seq(c) => f(c)
    case other => throw new IllegalArgumentException(
      s"$name(arg) takes exactly 1 argument, got ${other.size}")
  }

  private def scrubPiiExpr(c: Expression): Expression =
    graft.functions.TextFunctions.PiiPatterns.foldLeft(c) {
      case (e, (pattern, placeholder)) =>
        RegExpReplace(e, Literal(pattern), Literal(placeholder))
    }

  private def extractExpr(pattern: String)(c: Expression): Expression =
    RegExpExtract(c, Literal(pattern), Literal(1))

  /** (identifier, info, builder) triples in the shape both
    * `SparkSessionExtensions.injectFunction` and the session
    * `FunctionRegistry` accept.
    */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("blake2b_hex"),
        new ExpressionInfo(classOf[Blake2bExpr].getName, "blake2b_hex"),
        blake2bBuilder _),
      (FunctionIdentifier("array_dot"),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
        arrayDotBuilder _),
      (FunctionIdentifier("l2_norm"),
        new ExpressionInfo(classOf[ArrayDotProduct].getName, "l2_norm"),
        l2NormBuilder _),
      (FunctionIdentifier("word_shingles"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
        wordShinglesBuilder _),
      (FunctionIdentifier("char_shingles"),
        new ExpressionInfo(classOf[CharShingles].getName, "char_shingles"),
        charShinglesBuilder _),
      (FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
          "jaro_winkler"),
        jaroWinklerBuilder _),
      (FunctionIdentifier("damerau_levenshtein"),
        new ExpressionInfo(
          classOf[graft.functions.DamerauLevenshtein].getName,
          "damerau_levenshtein"),
        damerauBuilder _),
      (FunctionIdentifier("heavy_hitters"),
        new ExpressionInfo(classOf[MisraGries].getName, "heavy_hitters"),
        heavyHittersBuilder _),
      (FunctionIdentifier("md5_lanes"),
        new ExpressionInfo(classOf[Md5Lanes].getName, "md5_lanes"),
        unary("md5_lanes", (c: Expression) => Md5Lanes(Cast(c, BinaryType))) _),
      (FunctionIdentifier("char_class_counts"),
        new ExpressionInfo(classOf[CharClassCounts].getName, "char_class_counts"),
        unary("char_class_counts",
          (c: Expression) => CharClassCounts(Cast(c, StringType))) _),
      (FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
        unary("nfc_normalize",
          (c: Expression) => NfcNormalize(Cast(c, StringType))) _),
      (FunctionIdentifier("scrub_pii"),
        new ExpressionInfo(classOf[RegExpReplace].getName, "scrub_pii"),
        unary("scrub_pii", scrubPiiExpr) _),
      (FunctionIdentifier("url_domain"),
        new ExpressionInfo(classOf[RegExpExtract].getName, "url_domain"),
        unary("url_domain",
          extractExpr(graft.functions.TextFunctions.UrlDomainPattern)) _),
      (FunctionIdentifier("url_tld"),
        new ExpressionInfo(classOf[RegExpExtract].getName, "url_tld"),
        unary("url_tld",
          extractExpr(graft.functions.TextFunctions.UrlTldPattern)) _),
      (FunctionIdentifier("url_path"),
        new ExpressionInfo(classOf[RegExpExtract].getName, "url_path"),
        unary("url_path",
          extractExpr(graft.functions.TextFunctions.UrlPathPattern)) _))

  /** Register into an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
