package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969) — entity
  * resolution when no shared key exists: candidate pairs from BLOCKING
  * (equi-join on coarse keys — never a cartesian), scored by per-field
  * agreement log-likelihood weights. A field that agrees contributes
  * `log2(m/u)` (m = P(agree | match), u = P(agree | non-match)); a field
  * that disagrees contributes `log2((1−m)/(1−u))`; a field MISSING on
  * either side contributes 0 — the standard missing-at-random treatment,
  * so absent data neither supports nor refutes a match.
  *
  * Complements [[FuzzyJoin]]: SymSpell linkage answers "which strings are
  * within edit distance k"; Fellegi–Sunter answers "which RECORDS are the
  * same entity" by weighing evidence across many fields, tolerating
  * missing values and field-level noise.
  *
  * Replay discipline: the m/u weights are computed ONCE driver-side,
  * quantized to 1e-6 (micro-weights as long literals shared with the
  * oracle), so the score is an exact integer sum — no libm log2 runs in
  * either engine — and the threshold comparison is long vs long. Only the
  * final reported score divides (micro/1e6, one deterministic double op).
  *
  * Scale shape: one equi-join on the blocking key (both sides shuffle on
  * it; a skewed block → [[Skew.saltedJoin]]); everything else is
  * scan-side CASE arithmetic inside codegen. Pair count is bounded by
  * Σ_b |L_b|·|R_b| — choose blocks accordingly, exactly like the
  * df-capped posting joins in [[Dedup]].
  */
object Linkage {

  /** Micro-quantized (agree, disagree) weights for (m, u). */
  private def microWeights(m: Double, u: Double): (Long, Long) = {
    val ln2 = math.log(2.0)
    (math.round(math.log(m / u) / ln2 * 1e6),
      math.round(math.log((1 - m) / (1 - u)) / ln2 * 1e6))
  }

  private def checkField(f: (String, Double, Double)): Unit = {
    val (name, m, u) = f
    require(m > 0 && m < 1 && u > 0 && u < 1,
      s"field '$name': m and u must be in (0,1), got m=$m u=$u")
    require(m > u,
      s"field '$name': m must exceed u (agreement must be evidence FOR " +
        s"a match), got m=$m u=$u")
  }

  /** Scored candidate pairs with per-field agreement indicators:
    * (leftId, rightId, agree_<field>… ∈ {1, 0, null}, score), keeping
    * pairs whose score ≥ `threshold`. Both frames must carry the blocking
    * and field columns under the same names; ids must differ.
    */
  def fellegiSunter(left: DataFrame, right: DataFrame,
                    leftId: String, rightId: String, block: Seq[String],
                    fields: Seq[(String, Double, Double)],
                    threshold: Double): DataFrame = {
    require(block.nonEmpty, "fellegiSunter needs at least one blocking column")
    require(fields.nonEmpty, "fellegiSunter needs at least one scored field")
    require(leftId != rightId,
      s"left and right id columns must have distinct names, both are '$leftId'")
    fields.foreach(checkField)
    val fnames = fields.map(_._1)
    val lsel = left.select((leftId +: (block ++ fnames).distinct).map(col): _*)
    val rsel = fnames.foldLeft(
      right.select((rightId +: (block ++ fnames).distinct).map(col): _*))(
      (df, f) => df.withColumnRenamed(f, f + "__r"))
    val agreed = lsel.join(rsel, block, "inner")
      .select(col(leftId) +: col(rightId) +: fields.map { case (f, _, _) =>
        when(col(f).isNull || col(f + "__r").isNull,
          lit(null).cast("int"))
          .when(col(f) === col(f + "__r"), lit(1))
          .otherwise(lit(0)).as(s"agree_$f")
      }: _*)
    val scoreMicro = fields.map { case (f, m, u) =>
      val (wa, wd) = microWeights(m, u)
      when(col(s"agree_$f").isNull, lit(0L))
        .when(col(s"agree_$f") === 1, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    agreed.withColumn("__micro", scoreMicro)
      .filter(col("__micro") >= lit(math.round(threshold * 1e6)))
      .withColumn("score", col("__micro") / 1e6)
      .drop("__micro")
  }

  /** [[fellegiSunter]] with APPROXIMATE string agreement on designated
    * fields — the form production linkage actually runs, because real
    * dirty data disagrees by typos, not by being a different value:
    * a fuzzy field agrees when `jaro_winkler(l, r) ≥ simThreshold`
    * ([[graft.functions.JaroWinkler]], the native comparator — Winkler
    * 1990 built it for exactly this use inside Census linkage), so a
    * one-character perturbation still counts as evidence FOR the match
    * where [[fellegiSunter]]'s equality indicator would count it
    * AGAINST. Missing-value and weight semantics are identical; the JW
    * threshold compare is deterministic because the comparator replays
    * bitwise cross-engine (q171's contract).
    *
    * `fuzzyFields` entries are (field, m, u, simThreshold).
    */
  def fellegiSunterFuzzy(left: DataFrame, right: DataFrame,
                         leftId: String, rightId: String, block: Seq[String],
                         exactFields: Seq[(String, Double, Double)],
                         fuzzyFields: Seq[(String, Double, Double, Double)],
                         threshold: Double): DataFrame = {
    require(block.nonEmpty, "fellegiSunterFuzzy needs at least one blocking column")
    require(exactFields.nonEmpty || fuzzyFields.nonEmpty,
      "fellegiSunterFuzzy needs at least one scored field")
    require(leftId != rightId,
      s"left and right id columns must have distinct names, both are '$leftId'")
    exactFields.foreach(checkField)
    fuzzyFields.foreach { case (f, m, u, th) =>
      checkField((f, m, u))
      require(th > 0 && th <= 1,
        s"field '$f': simThreshold must be in (0, 1], got $th")
    }
    val fnames = exactFields.map(_._1) ++ fuzzyFields.map(_._1)
    val lsel = left.select((leftId +: (block ++ fnames).distinct).map(col): _*)
    val rsel = fnames.foldLeft(
      right.select((rightId +: (block ++ fnames).distinct).map(col): _*))(
      (df, f) => df.withColumnRenamed(f, f + "__r"))
    def indicator(f: String, agree: org.apache.spark.sql.Column) =
      when(col(f).isNull || col(f + "__r").isNull, lit(null).cast("int"))
        .when(agree, lit(1)).otherwise(lit(0)).as(s"agree_$f")
    val agreed = lsel.join(rsel, block, "inner")
      .select(col(leftId) +: col(rightId) +:
        (exactFields.map { case (f, _, _) =>
          indicator(f, col(f) === col(f + "__r"))
        } ++ fuzzyFields.map { case (f, _, _, th) =>
          indicator(f, graft.functions.GraftFunctions.jaro_winkler(
            col(f), col(f + "__r")) >= lit(th))
        }): _*)
    val scoreMicro = (exactFields.map(f => (f._1, f._2, f._3)) ++
        fuzzyFields.map(f => (f._1, f._2, f._3))).map { case (f, m, u) =>
      val (wa, wd) = microWeights(m, u)
      when(col(s"agree_$f").isNull, lit(0L))
        .when(col(s"agree_$f") === 1, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    agreed.withColumn("__micro", scoreMicro)
      .filter(col("__micro") >= lit(math.round(threshold * 1e6)))
      .withColumn("score", col("__micro") / 1e6)
      .drop("__micro")
  }

  /** DuckDB replay of [[fellegiSunterFuzzy]] (the [[fellegiSunterOracleSql]]
    * construction with `jaro_winkler_similarity ≥ th` indicators on the
    * fuzzy fields).
    */
  def fellegiSunterFuzzyOracleSql(leftSql: String, rightSql: String,
                                  leftId: String, rightId: String,
                                  block: Seq[String],
                                  exactFields: Seq[(String, Double, Double)],
                                  fuzzyFields: Seq[(String, Double, Double, Double)],
                                  threshold: Double): String = {
    exactFields.foreach(checkField)
    fuzzyFields.foreach(f => checkField((f._1, f._2, f._3)))
    val on = block.map(b => s"l.$b = r.$b").mkString(" AND ")
    val agreeCols = (exactFields.map { case (f, _, _) =>
      f -> s"l.$f = r.$f"
    } ++ fuzzyFields.map { case (f, _, _, th) =>
      f -> s"jaro_winkler_similarity(l.$f, r.$f) >= $th"
    }).map { case (f, cond) =>
      s"""CASE WHEN l.$f IS NULL OR r.$f IS NULL THEN NULL
         |            WHEN $cond THEN 1 ELSE 0 END AS agree_$f"""
        .stripMargin
    }.mkString(",\n       ")
    val weighted = exactFields.map(f => (f._1, f._2, f._3)) ++
      fuzzyFields.map(f => (f._1, f._2, f._3))
    val micro = weighted.map { case (f, m, u) =>
      val (wa, wd) = microWeights(m, u)
      s"CASE WHEN agree_$f IS NULL THEN CAST(0 AS BIGINT) " +
        s"WHEN agree_$f = 1 THEN CAST($wa AS BIGINT) " +
        s"ELSE CAST($wd AS BIGINT) END"
    }.mkString("\n         + ")
    s"""WITH l AS ($leftSql), r AS ($rightSql),
       |j AS (
       |  SELECT l.$leftId, r.$rightId,
       |       $agreeCols
       |  FROM l JOIN r ON $on
       |), sc AS (
       |  SELECT *, $micro AS micro FROM j
       |)
       |SELECT ${(Seq(leftId, rightId) ++
                  weighted.map(f => s"agree_${f._1}")).mkString(", ")},
       |       micro / 1e6 AS score
       |FROM sc WHERE micro >= ${math.round(threshold * 1e6)}""".stripMargin
  }

  /** DuckDB replay of [[fellegiSunter]]: the same blocking join, the same
    * CASE agreement indicators, the SAME micro-weight literals (computed
    * once here, interpolated into both engines' plans). `leftSql` /
    * `rightSql` are full SELECTs producing the id + block + field
    * columns.
    */
  def fellegiSunterOracleSql(leftSql: String, rightSql: String,
                             leftId: String, rightId: String,
                             block: Seq[String],
                             fields: Seq[(String, Double, Double)],
                             threshold: Double): String = {
    fields.foreach(checkField)
    val on = block.map(b => s"l.$b = r.$b").mkString(" AND ")
    val agreeCols = fields.map { case (f, _, _) =>
      s"""CASE WHEN l.$f IS NULL OR r.$f IS NULL THEN NULL
         |            WHEN l.$f = r.$f THEN 1 ELSE 0 END AS agree_$f"""
        .stripMargin
    }.mkString(",\n       ")
    val micro = fields.map { case (f, m, u) =>
      val (wa, wd) = microWeights(m, u)
      s"CASE WHEN agree_$f IS NULL THEN CAST(0 AS BIGINT) " +
        s"WHEN agree_$f = 1 THEN CAST($wa AS BIGINT) " +
        s"ELSE CAST($wd AS BIGINT) END"
    }.mkString("\n         + ")
    s"""WITH l AS ($leftSql), r AS ($rightSql),
       |j AS (
       |  SELECT l.$leftId, r.$rightId,
       |       $agreeCols
       |  FROM l JOIN r ON $on
       |), sc AS (
       |  SELECT *, $micro AS micro FROM j
       |)
       |SELECT ${(Seq(leftId, rightId) ++
                  fields.map(f => s"agree_${f._1}")).mkString(", ")},
       |       micro/1e6 AS score
       |FROM sc WHERE micro >= ${math.round(threshold * 1e6)}""".stripMargin
  }
}
