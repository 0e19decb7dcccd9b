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
    scoreJoined(
      selectSides(left, right, leftId, rightId, block,
        exactFields.map(_._1) ++ fuzzyFields.map(_._1)) match {
        case (lsel, rsel) => lsel.join(rsel, block, "inner")
      },
      leftId, rightId, exactFields, fuzzyFields, threshold)
  }

  private def selectSides(left: DataFrame, right: DataFrame,
                          leftId: String, rightId: String,
                          block: Seq[String], fnames: Seq[String])
      : (DataFrame, DataFrame) = {
    val lsel = left.select((leftId +: (block ++ fnames).distinct).map(col): _*)
    val rsel = fnames.foldLeft(
      right.select((rightId +: (block ++ fnames).distinct).map(col): _*))(
      (df, f) => df.withColumnRenamed(f, f + "__r"))
    (lsel, rsel)
  }

  /** Shared scoring tail: `joined` carries leftId, rightId, each field f
    * as `f` (left) and `f__r` (right); emits the agreement indicators,
    * the exact micro-weight sum, and the threshold cut.
    */
  private def scoreJoined(joined: DataFrame, leftId: String, rightId: String,
                          exactFields: Seq[(String, Double, Double)],
                          fuzzyFields: Seq[(String, Double, Double, Double)],
                          threshold: Double): DataFrame = {
    def indicator(f: String, agree: org.apache.spark.sql.Column) =
      when(col(f).isNull || col(f + "__r").isNull, lit(null).cast("int"))
        .when(agree, lit(1)).otherwise(lit(0)).as(s"agree_$f")
    val agreed = joined
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

  /** Minimal field subsets whose AGREE weights alone reach the threshold.
    * A pair's score is Σ over agreeing fields of wa plus non-positive
    * terms (disagree wd < 0, missing 0), so score ≥ T > 0 forces the
    * agreeing set to contain one of these subsets — they are the complete
    * set of lossless candidate-generation keys.
    */
  private[graft] def minimalAgreeSets(
      waMicro: Seq[Long], tMicro: Long): Seq[Set[Int]] = {
    require(tMicro > 0,
      "blocked linkage needs threshold > 0: at or below 0 every pair " +
        "can qualify and no agreement-based candidate bound exists")
    val n = waMicro.length
    require(n <= 20, s"$n fields: subset enumeration is 2^n")
    val qualifying = (0 until (1 << n)).filter { mask =>
      (0 until n).collect {
        case i if (mask & (1 << i)) != 0 => waMicro(i)
      }.sum >= tMicro
    }
    val sets = qualifying.map(mask =>
      (0 until n).filter(i => (mask & (1 << i)) != 0).toSet)
    sets.filter(s => !sets.exists(o => o != s && o.subsetOf(s)))
  }

  /** [[fellegiSunterFuzzy]] with BOUNDED candidate generation — the same
    * scored pairs WITHOUT sweeping every in-block pair with the
    * comparator. The bound is score-driven: disagreement and missingness
    * contribute ≤ 0, so any pair at or above the threshold must AGREE on
    * some minimal qualifying field subset ([[minimalAgreeSets]]); for
    * each such subset candidates come from
    *  - an EQUI-join on (block ++ its exact fields) when it has any —
    *    agreement on an exact field IS equality, or
    *  - the lossless Jaro–Winkler prefix filter
    *    ([[FuzzyJoin.jaroWinklerCandidates]]) on its highest-threshold
    *    fuzzy field otherwise (requires that field's simThreshold > 0.8).
    * The union (distinct) is then scored EXACTLY like
    * [[fellegiSunterFuzzy]] — same indicators, same micro-weights, same
    * cut — so the output is provably identical while the comparator runs
    * only on candidates.
    *
    * Candidate volume is the sum over minimal subsets of their join
    * selectivity: a weak field (low wa) that cannot reach the threshold
    * alone never becomes a generator — the m/u priors that make a field
    * weak evidence also keep it from driving the pairing.
    */
  def fellegiSunterFuzzyBlocked(left: DataFrame, right: DataFrame,
                                leftId: String, rightId: String,
                                block: Seq[String],
                                exactFields: Seq[(String, Double, Double)],
                                fuzzyFields: Seq[(String, Double, Double, Double)],
                                threshold: Double): DataFrame = {
    require(block.nonEmpty, "fellegiSunterFuzzyBlocked needs at least one blocking column")
    require(exactFields.nonEmpty || fuzzyFields.nonEmpty,
      "fellegiSunterFuzzyBlocked needs at least one scored field")
    require(leftId != rightId,
      s"left and right id columns must have distinct names, both are '$leftId'")
    exactFields.foreach(checkField)
    fuzzyFields.foreach { case (f, m, u, th) =>
      checkField((f, m, u))
      require(th > 0 && th <= 1,
        s"field '$f': simThreshold must be in (0, 1], got $th")
    }
    val fields: Seq[(String, Long, Boolean, Double)] =
      exactFields.map { case (f, m, u) =>
        (f, microWeights(m, u)._1, true, 0.0)
      } ++ fuzzyFields.map { case (f, m, u, th) =>
        (f, microWeights(m, u)._1, false, th)
      }
    val sets = minimalAgreeSets(fields.map(_._2),
      math.round(threshold * 1e6))
    val fnames = fields.map(_._1)
    val (lsel, rsel) = selectSides(left, right, leftId, rightId, block, fnames)
    // right frame with block columns renamed, so both the generator
    // equi-joins and the final re-join's block-equality re-assert are
    // unambiguous
    val rGen = block.foldLeft(rsel)((df, b) =>
      df.withColumnRenamed(b, b + "__rb"))
    // threshold unreachable even with every field agreeing → no minimal
    // set exists and no pair can qualify; return the empty scored frame
    // (same schema as fellegiSunterFuzzy's answer for these inputs)
    if (sets.isEmpty)
      return scoreJoined(lsel.join(rsel, block, "inner").limit(0),
        leftId, rightId, exactFields, fuzzyFields, threshold)
    val generators = sets.map { s =>
      val exacts = s.toSeq.sorted.map(fields).filter(_._3).map(_._1)
      if (exacts.nonEmpty)
        lsel.join(rGen,
            (block.map(b => col(b) === col(b + "__rb")) ++
              exacts.map(f => col(f) === col(f + "__r"))).reduce(_ && _))
          .select(col(leftId), col(rightId))
      else {
        val (f, _, _, th) = s.toSeq.sorted.map(fields).maxBy(_._4)
        require(th > 0.8,
          s"field '$f' must generate candidates alone but its " +
            s"simThreshold $th is ≤ 0.8 — the Jaro match bound " +
            "degenerates; raise the threshold or add an exact field")
        FuzzyJoin.jaroWinklerCandidates(left, right, th,
            leftId, f, rightId, f, block)
          .select(col("left_id").as(leftId), col("right_id").as(rightId))
      }
    }
    val pairs = generators.reduce(_ unionByName _).distinct()
    // re-join by (id, block), not id alone: ids are not assumed unique, so
    // a bare id join would cross-pair duplicate-id rows living in DIFFERENT
    // blocks — rows the unblocked fellegiSunterFuzzy never scores. Keeping
    // rGen's renamed block columns and re-asserting equality restores the
    // exact in-block row pairing (extra candidate row-combos that score
    // below the cut are dropped by scoreJoined's threshold filter).
    scoreJoined(
      pairs.join(lsel, Seq(leftId))
        .join(rGen, Seq(rightId))
        .filter(block.map(b => col(b) === col(b + "__rb")).reduce(_ && _))
        .drop(block.map(_ + "__rb"): _*),
      leftId, rightId, exactFields, fuzzyFields, threshold)
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
