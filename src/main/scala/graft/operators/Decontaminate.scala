package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Train/eval contamination detection — the overlap audit a training-data
  * pipeline runs before any benchmark number can be trusted: for every
  * document in a held-out slice, what fraction of its word n-grams also
  * appears anywhere in the training slice?
  *
  * Shape: distinct (doc, shingle) on the eval side, distinct shingle SET
  * on the train side, one equi-join, one per-doc aggregation. Documents
  * shorter than the shingle width have no n-grams and are absent from the
  * report (nothing to measure), mirroring the standard n-gram-overlap
  * decontamination definition (GPT-3 appendix C / PaLM style).
  *
  * 100 TB plan shape: both sides are map-side-distinct before the shuffle
  * (`Deduplicate` collapses per-partition first), and the join key is the
  * shingle itself only for oracle portability — [[contaminationHashed]]
  * is the production variant that joins on `xxhash64(shingle)` so the
  * shuffle carries 8-byte keys instead of strings (a 64-bit collision
  * inflates a doc's overlap by one n-gram — noise for an audit metric).
  * The train side stays distinct-deduplicated (its size is the corpus
  * vocabulary of n-grams, sublinear in corpus size); when the eval slice
  * is small it is the BUILD side of the join either way. A df-cap is
  * deliberately NOT applied: unlike near-dup candidate generation, the
  * audit must count common n-grams too.
  */
object Decontaminate {

  /** Per-eval-doc contamination report against the complement slice.
    * Output: (doc_id, n_shingles, contaminated, contamination ∈ [0,1]).
    */
  def contamination(docs: DataFrame, isEval: Column, n: Int = 3,
                    text: String = "text"): DataFrame =
    report(docs, isEval, n, text, identity)

  /** [[contamination]] with 64-bit-hashed join keys — the at-scale path
    * (not oracle-portable: DuckDB has no xxhash64).
    */
  def contaminationHashed(docs: DataFrame, isEval: Column, n: Int = 3,
                          text: String = "text"): DataFrame =
    report(docs, isEval, n, text, s => xxhash64(s))

  private def report(docs: DataFrame, isEval: Column, n: Int, text: String,
                     key: Column => Column): DataFrame = {
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      explode(TextFunctions.shingles(col(text), n)).as("s"))
    val trainSet = sh.filter(!col("is_eval")).select(key(col("s")).as("s")).distinct()
    val evalSh = sh.filter(col("is_eval"))
      .select(col("doc_id"), key(col("s")).as("s")).distinct()
    evalSh.join(trainSet.withColumn("hit", lit(1)), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("contaminated"),
        round(count(col("hit")) / count(lit(1)), 6).as("contamination"))
  }

  /** [[contaminationHashed]] with the train-side JOIN replaced by a Bloom
    * filter membership probe — the furthest point on the scale path: the
    * train side collapses to one `numBits`-bit sketch built by a single
    * map-side-combined aggregation (Spark's own `BloomFilterAggregate`,
    * the expression behind runtime row-level join filters), and the eval
    * side never joins the train side — `might_contain` is a scalar probe
    * inside the scan's codegen stage. (The eval side still pays its OWN
    * two keyed shuffles — the (doc, shingle) distinct and the per-doc
    * aggregation, same as every contamination variant; what the sketch
    * removes is the train-side join, which dominates at 100 TB.) The
    * sketch rides the plan as
    * a literal (the closed form of a broadcast); size it by
    * `expectedTrainShingles` — ~1.2 GB of bits covers 1e9 distinct
    * n-grams at the default 1% fpp, far under a 100 TB train slice's
    * shuffle cost, and beyond that the hashed-join path is the fallback.
    *
    * One-sided error, by construction: every truly-contaminated n-gram IS
    * flagged (no false negatives — the audit never under-reports), while
    * false positives inflate `contamination` by at most fpp. Spec-pinned
    * against [[contaminationHashed]]: per-doc `contaminated` is a
    * pointwise upper bound and matches exactly when the filter is sized
    * generously.
    *
    * The sketch rides a Catalyst `ScalarSubquery` — exactly how Spark's
    * own `InjectRuntimeFilter` ships blooms — NOT a collected literal:
    * build and probe are then ONE query (no driver round-trip), and the
    * sketch bytes never enter the driver's optimizer loop, where a
    * multi-MB literal gets re-hashed by every rule batch's tree compare
    * (measured: a literal-borne 8 MB sketch cost ~5s of pure driver time;
    * the subquery form is size-independent). An empty train slice yields
    * a null sketch → zero probes hit → `contaminated = 0`, the right
    * audit answer when there is nothing to be contaminated BY.
    */
  def contaminationBloom(docs: DataFrame, isEval: Column,
                         expectedTrainShingles: Long, n: Int = 3,
                         text: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftShim.{column, expression}
    require(expectedTrainShingles > 0,
      s"expectedTrainShingles must be positive, got $expectedTrainShingles")
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      explode(TextFunctions.shingles(col(text), n)).as("s"))
    // distinct before the aggregate is NOT needed (re-inserting a member
    // is a no-op on the bit array) — the build side is pure map-side work
    val bloomAgg = column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        expression(xxhash64(col("s"))), expectedTrainShingles)
        .toAggregateExpression())
    val buildPlan = sh.filter(!col("is_eval")).select(bloomAgg.as("bloom"))
      .queryExecution.analyzed
    val hit = column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          buildPlan, Seq.empty,
          org.apache.spark.sql.catalyst.expressions.NamedExpression.newExprId,
          Seq.empty, None, None, None),
        expression(xxhash64(col("s")))))
    // probe ONCE in a projected column, not twice inside the aggregate —
    // each BloomFilterMightContain instance deserializes the sketch per
    // task, so one instance halves that per-task toll
    sh.filter(col("is_eval"))
      .select(col("doc_id"), col("s")).distinct()
      .select(col("doc_id"), when(hit, 1L).otherwise(0L).as("hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("hit")).as("contaminated"),
        round(sum(col("hit")) / count(lit(1)), 6).as("contamination"))
  }

  /** DuckDB replay of [[contamination]] for an eval slice defined by a SQL
    * predicate over `documents` (e.g. `source = 'src0'`), kept beside the
    * operator so the shingle construction stays in lockstep with
    * [[graft.functions.WordShingles]] (contiguous spans, space-joined).
    */
  def oracleSql(evalPredicate: String, n: Int = 3): String = {
    val lastStart = s"len(t) - ${n - 2}" // range() upper bound is exclusive
    val joined = (0 until n).map(i => if (i == 0) "t[i]" else s"t[i+$i]")
      .mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, ($evalPredicate) AS is_eval, string_split(text, ' ') AS t
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, is_eval, $joined AS s
       |  FROM toks, UNNEST(range(1, $lastStart)) AS r(i)
       |  WHERE len(t) >= $n
       |), train AS (
       |  SELECT DISTINCT s FROM sh WHERE NOT is_eval
       |), eval_sh AS (
       |  SELECT doc_id, s FROM sh WHERE is_eval
       |)
       |SELECT doc_id, COUNT(*) AS n_shingles,
       |       COUNT(train.s) AS contaminated,
       |       round(COUNT(train.s) / COUNT(*), 6) AS contamination
       |FROM eval_sh LEFT JOIN train ON eval_sh.s = train.s
       |GROUP BY doc_id""".stripMargin
  }
}
