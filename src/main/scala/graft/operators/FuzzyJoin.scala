package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-matching — record linkage over near-identical
  * names/titles, the dedup step exact hashing can't see ("Customer#0001"
  * vs "Customer#0002", OCR'd titles, typo'd domains).
  *
  * The naive form is an O(n²) cross join with a `levenshtein` filter — a
  * cartesian that no cluster survives at corpus scale. This operator uses
  * SymSpell deletion-neighborhood blocking instead (Garbe's symmetric
  * delete algorithm, itself a relative of the FastSS dictionary method):
  * every string generates the set of variants reachable by deleting at
  * most `maxDist` characters, and two strings within edit distance
  * `maxDist` of each other ALWAYS share at least one variant. Candidates
  * are therefore found by an equi-join on the variant key — a plain
  * shuffled hash join that scales like any other keyed join — and then
  * verified with the exact `levenshtein` built-in, so blocking is lossless:
  * the result is bit-identical to the cartesian form.
  *
  * Shape at 100 TB: the variant explode is narrow (×(len+1) rows for
  * maxDist=1, ×O(len²/2) for maxDist=2 — bound it with short keys or
  * prefixes, as SymSpell implementations do); the self-join shuffles on the
  * variant string; `distinct` collapses multi-variant matches BEFORE the
  * levenshtein verify so the (more expensive) edit-distance kernel runs
  * once per candidate pair. Variant keys inherit the key-skew toolbox:
  * a df cap on pathological hot variants (at the cost of exactness) or
  * [[Skew.saltedJoin]] if a single template string dominates the corpus.
  */
object FuzzyJoin {

  /** All strings reachable from `s` by deleting at most `maxDist`
    * characters (including `s` itself), distinct, as a pure expression.
    * Element 0 of the generating sequence keeps the original; element i
    * deletes the i-th character — so an empty string yields just itself.
    */
  def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist=$maxDist: deletion neighborhoods are practical for 1-2 edits")
    def oneDeletion(c: Column): Column =
      transform(sequence(lit(0), length(c)), i =>
        when(i === 0, c).otherwise(
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
    val d1 = array_distinct(oneDeletion(s))
    if (maxDist == 1) d1
    else array_distinct(flatten(transform(d1, v => oneDeletion(v))))
  }

  /** All pairs (i, j, dist) with `i < j` and
    * `levenshtein(strCol_i, strCol_j) <= maxDist` — exactly the cartesian
    * self-join's answer, computed via deletion-variant blocking.
    */
  def selfPairsWithin(df: DataFrame, maxDist: Int,
                      idCol: String = "id", strCol: String = "name"): DataFrame = {
    val v = df.select(col(idCol).as("fj_id"), col(strCol).as("fj_s"),
      explode(deletionVariants(col(strCol), maxDist)).as("fj_v"))
    v.as("a").join(v.as("b"),
        col("a.fj_v") === col("b.fj_v") && col("a.fj_id") < col("b.fj_id"))
      .select(col("a.fj_id").as("i"), col("b.fj_id").as("j"),
        col("a.fj_s").as("si"), col("b.fj_s").as("sj"))
      .distinct()
      .filter(levenshtein(col("si"), col("sj")) <= maxDist)
      .select(col("i"), col("j"),
        levenshtein(col("si"), col("sj")).cast("long").as("dist"))
  }

  /** Two-table record linkage: all (left id, right id, dist) with
    * `levenshtein(left str, right str) <= maxDist` — exactly the cartesian
    * `left × right` filter's answer, via the same lossless blocking. The
    * everyday shape: link a fresh batch's names against a standing
    * reference table (both sides explode to variants; the candidate join
    * is keyed on the variant string).
    */
  def joinWithin(left: DataFrame, right: DataFrame, maxDist: Int,
                 leftId: String = "id", leftStr: String = "name",
                 rightId: String = "id", rightStr: String = "name")
      : DataFrame = {
    def variants(df: DataFrame, id: String, s: String) =
      df.select(col(id).as("fj_id"), col(s).as("fj_s"),
        explode(deletionVariants(col(s), maxDist)).as("fj_v"))
    variants(left, leftId, leftStr).as("a")
      .join(variants(right, rightId, rightStr).as("b"),
        col("a.fj_v") === col("b.fj_v"))
      .select(col("a.fj_id").as("left_id"), col("b.fj_id").as("right_id"),
        col("a.fj_s").as("si"), col("b.fj_s").as("sj"))
      .distinct()
      .filter(levenshtein(col("si"), col("sj")) <= maxDist)
      .select(col("left_id"), col("right_id"),
        levenshtein(col("si"), col("sj")).cast("long").as("dist"))
  }
}
