package graft

import graft.functions.expr.{LangId, MinHashBuckets, Sentiment, SimHash64, WordShingles}
import graft.multimodal.FakeDecode
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions in the function registry so the pure-SQL surface
  * (`spark.sql`, JDBC/Thrift clients, notebook users) can call them
  * without touching the Scala API.
  *
  * Wire up via `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * [[GraftSession]]).
  *
  * {{{
  *   SELECT lang_id(text), sentiment(text), simhash64(word_shingles(text, 3))
  *   FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, name: String): Int = e match {
    case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
      e.eval().asInstanceOf[Int]
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3055",
      messageParameters = Map("reason" -> s"$name must be a foldable integer, got $other"))
  }

  private def arity(args: Seq[Expression], n: Int, usage: String): Unit =
    if (args.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3055",
      messageParameters = Map("reason" ->
        s"expected $n argument(s): $usage, got ${args.length}"))

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Coalesce, Literal}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // null-input wrappers keep SQL semantics identical to the Scala API
    // (the bare expressions null-propagate before compute runs)
    ext.injectFunction((FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(text) - ISO-639-1 code via stopword overlap, 'und' if unknown"),
      (args: Seq[Expression]) => {
        arity(args, 1, "lang_id(text)")
        Coalesce(Seq(LangId(args.head), Literal("und")))
      }))

    ext.injectFunction((FunctionIdentifier("sentiment"),
      info("sentiment", "sentiment(text) - lexicon label in {pos, neg, n/a}"),
      (args: Seq[Expression]) => {
        arity(args, 1, "sentiment(text)")
        Coalesce(Seq(Sentiment(args.head), Literal("n/a")))
      }))

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct word n-grams"),
      (args: Seq[Expression]) => {
        arity(args, 2, "word_shingles(text, n)")
        Coalesce(Seq(
          WordShingles(args.head, intLit(args(1), "word_shingles n")),
          Literal.create(Seq.empty[String], ArrayType(StringType))))
      }))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit near-dup fingerprint"),
      (args: Seq[Expression]) => {
        arity(args, 1, "simhash64(features)")
        SimHash64(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("minhash_buckets"),
      info("minhash_buckets",
        "minhash_buckets(features, k, bands) - LSH band buckets of the MinHash signature"),
      (args: Seq[Expression]) => {
        arity(args, 3, "minhash_buckets(features, k, bands)")
        MinHashBuckets(args.head,
          intLit(args(1), "minhash k"), intLit(args(2), "minhash bands"))
      }))

    ext.injectFunction((FunctionIdentifier("fake_decode"),
      info("fake_decode", "fake_decode(payload, dim) - STUB media feature extractor"),
      (args: Seq[Expression]) => {
        arity(args, 2, "fake_decode(payload, dim)")
        FakeDecode(args.head, args(1))
      }))

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => {
        arity(args, 2, "cosine_sim(a, b)")
        graft.functions.expr.CosineSim(args.head, args(1))
      }))

    ext.injectFunction((FunctionIdentifier("token_count"),
      info("token_count", "token_count(text) - whitespace token count, one pass"),
      (args: Seq[Expression]) => {
        arity(args, 1, "token_count(text)")
        graft.functions.expr.TokenCount(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => {
        arity(args, 1, "nfc_normalize(text)")
        graft.functions.expr.NfcNormalize(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("char_shingles"),
      info("char_shingles",
        "char_shingles(text, n) - distinct char n-grams of normalized text"),
      (args: Seq[Expression]) => {
        arity(args, 2, "char_shingles(text, n)")
        Coalesce(Seq(
          graft.functions.expr.CharShingles(args.head, intLit(args(1), "char_shingles n")),
          Literal.create(Seq.empty[String], ArrayType(StringType))))
      }))

    ext.injectFunction((FunctionIdentifier("quantize_int8"),
      info("quantize_int8",
        "quantize_int8(vec) - struct(q: array<int> in [-127,127], scale: float)"),
      (args: Seq[Expression]) => {
        arity(args, 1, "quantize_int8(vec)")
        graft.functions.expr.QuantizeInt8(args.head)
      }))

    ext.injectFunction((FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim",
        "jaccard_sim(a, b) - exact Jaccard of two string arrays (distinct elements)"),
      (args: Seq[Expression]) => {
        arity(args, 2, "jaccard_sim(a, b)")
        graft.functions.expr.JaccardSim(args.head, args(1))
      }))

    ext.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig",
        "hyperplane_sig(vec, dim, n_bits, seed) - sign-bit LSH signature as bigint"),
      (args: Seq[Expression]) => {
        arity(args, 4, "hyperplane_sig(vec, dim, n_bits, seed)")
        graft.functions.expr.HyperplaneSig(args.head,
          intLit(args(1), "hyperplane_sig dim"),
          intLit(args(2), "hyperplane_sig n_bits"),
          intLit(args(3), "hyperplane_sig seed").toLong)
      }))

    // Opt-in approximate similarity-join planning
    // (spark.graft.rewrite.approxCosineJoin=true /
    // spark.graft.rewrite.approxJaccardJoin=true): all-pairs cosine /
    // Jaccard filters over cross joins become banded-LSH / MinHash-banded
    // candidate joins.
    ext.injectOptimizerRule(session =>
      graft.plans.ApproxCosineJoinRewrite(session))
    ext.injectOptimizerRule(session =>
      graft.plans.ApproxJaccardJoinRewrite(session))
    ext.injectOptimizerRule(session =>
      graft.plans.ApproxHammingJoinRewrite(session))
  }
}
