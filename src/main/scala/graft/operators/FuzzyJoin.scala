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

  /** Character-occurrence elements of `s`: one (ch, occ) struct per
    * character, occ = that character's 1-based occurrence index so far —
    * "aab" → {(a,1),(a,2),(b,1)}. The element MULTISET of a string is
    * thereby a SET, and the set intersection of two strings' elements
    * equals their character-multiset overlap — the quantity the
    * Jaro match count is bounded by. O(len²) per row (the running
    * occurrence count re-scans the prefix), fine for the name/title
    * strings linkage comparators run on.
    */
  private def charOccElements(s: Column): Column = {
    val arr = filter(split(s, ""), c => c =!= "")
    transform(arr, (c, i) =>
      struct(c.as("ch"),
        size(filter(slice(arr, lit(1), i + 1), x => x === c)).as("occ")))
  }

  /** Shared element-level prep for the Jaro–Winkler prefix filter:
    * (id, str, first char, blocks…, len, ch, occ) — one row per
    * character element.
    */
  private def jwElements(df: DataFrame, id: String, str: String,
                         blockCols: Seq[String]): DataFrame =
    // spread the narrow scan first (same reason as jwAnagramPrep): the
    // O(len²) element build must not run on a single input split
    graft.sources.Tables.ensureParallelism(
      df.select(col(id).as("__jwid") +: col(str).as("__jws") +:
        blockCols.map(col): _*))
      .withColumn("__len", length(col("__jws")))
      .withColumn("__fc", substring(col("__jws"), 1, 1))
      .select(col("__jwid") +: col("__jws") +: col("__len") +: col("__fc") +:
        explode(charOccElements(col("__jws"))).as("__e") +:
        blockCols.map(col): _*)
      .select(col("__jwid") +: col("__jws") +: col("__len") +: col("__fc") +:
        col("__e.ch").as("__ch") +: col("__e.occ").as("__occ") +:
        blockCols.map(col): _*)

  /** Keep each record's PREFIX elements under the global rarity order —
    * the ppjoin prefix-filter discipline (Xiao et al. 2008): if two
    * element sets of sizes la, lb overlap in ≥ α elements, their
    * (l − α + 1)-prefixes under any shared total order intersect
    * (pigeonhole). Rarity order (ascending element frequency, ties by
    * element) makes prefixes prefer rare elements, so posting lists on
    * prefix elements stay short. Each record's own α lower bound
    * ⌈(3·jm−2)·len⌉ is safe: any partner only raises the true α, which
    * only SHRINKS the true prefix. `__rn` (the element's position in the
    * record's rarity-sorted list) rides along for the positional filter.
    */
  private def jwPrefixes(elems: DataFrame, freq: DataFrame,
                         jm: Double): DataFrame = {
    val factor = 3.0 * jm - 2.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__jwid"))
      .orderBy(col("__df").asc, col("__ch").asc, col("__occ").asc)
    val alpha = greatest(
      ceil(col("__len") * factor - 1e-9).cast("int"), lit(1))
    elems.join(broadcast(freq), Seq("__ch", "__occ"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__len") - alpha + 1)
      .drop("__df")
  }

  /** One stratum of the candidate join: equi on (element, blocks…) plus
    * `extra`, with the two LOSSLESS pairwise prunes evaluated on the
    * lengths both sides carry:
    *  - length band: m ≤ min(la,lb) and m ≥ (3·jm−2)·max(la,lb);
    *  - positional (ppjoin): a pair's FIRST shared prefix element at
    *    rarity positions (pa, pb) bounds the overlap by
    *    min(la−pa, lb−pb)+1, which must reach the pairwise
    *    α = ⌈(3·jm−1)·la·lb/(la+lb)⌉ (from m/la + m/lb ≥ 3·jm−1 — tighter
    *    than the per-side bound because both lengths are known here).
    */
  private def jwStratumJoin(preA: DataFrame, preB: DataFrame, jm: Double,
                            extra: Column, blockCols: Seq[String],
                            leftLtRight: Boolean): DataFrame = {
    val factor = 3.0 * jm - 2.0
    val band = least(col("a.__len"), col("b.__len")).cast("double") >=
      greatest(col("a.__len"), col("b.__len")) * factor - 1e-9
    val alphaPair = ceil(lit(3.0 * jm - 1.0) *
      col("a.__len") * col("b.__len") /
      (col("a.__len") + col("b.__len")) - 1e-9).cast("int")
    val positional =
      least(col("a.__len") - col("a.__rn"),
        col("b.__len") - col("b.__rn")) + 1 >= alphaPair
    val blockEq = blockCols
      .map(b => col(s"a.$b") === col(s"b.$b"))
      .foldLeft(lit(true))(_ && _)
    val order =
      if (leftLtRight) col("a.__jwid") < col("b.__jwid") else lit(true)
    preA.as("a").join(preB.as("b"),
      col("a.__ch") === col("b.__ch") &&
        col("a.__occ") === col("b.__occ") &&
        order && band && positional && blockEq && extra)
  }

  /** Candidate union over the two Winkler-boost strata — lossless for
    * `minJw > 0.8`:
    *  - SHARED first char (prefix length ℓ ≥ 1): the boost can apply, so
    *    only jaro ≥ (minJw−0.4)/0.6 is forced — but the first char
    *    becomes an extra EQUI-join key, splitting every posting list by
    *    the alphabet;
    *  - DIFFERENT first chars (ℓ = 0): no boost exists, so jaro ≥ minJw
    *    outright — a much tighter bound and a far shorter prefix.
    * Every pair with jw ≥ minJw has some true ℓ and lands in exactly one
    * stratum (any passing pair has jaro > 0.7, so ℓ ≥ 1 implies the
    * boost fired).
    */
  private def jwCandidateUnion(preLoose: (DataFrame, DataFrame),
                               preTight: (DataFrame, DataFrame),
                               minJw: Double, blockCols: Seq[String],
                               leftLtRight: Boolean): DataFrame = {
    val jBoost = (minJw - 0.4) / 0.6
    val g1 = jwStratumJoin(preLoose._1, preLoose._2, jBoost,
      col("a.__fc") === col("b.__fc"), blockCols, leftLtRight)
    val g0 = jwStratumJoin(preTight._1, preTight._2, minJw,
      col("a.__fc") =!= col("b.__fc"), blockCols, leftLtRight)
    val proj = (df: DataFrame) => df.select(
      col("a.__jwid").as("i"), col("b.__jwid").as("j"),
      col("a.__jws").as("si"), col("b.__jws").as("sj"))
    proj(g1).unionByName(proj(g0)).distinct()
  }

  /** Characters of `s`, sorted — the string's multiset in canonical form. */
  private def sortedChars(s: Column): Column =
    array_join(array_sort(filter(split(s, ""), c => c =!= "")), "")

  /** Deletions each record may need from its sorted-char form before two
    * qualifying records share a variant: k(len) = len − α(len) with
    * α(len) = max(⌈(3·jm−2)·len⌉, 1). Monotone in len, so the corpus
    * maximum decides route feasibility.
    */
  private def jwDeletionsNeeded(len: Int, jm: Double): Int = {
    val factor = 3.0 * jm - 2.0
    math.max(len - math.max(math.ceil(len * factor - 1e-9).toInt, 1), 0)
  }

  /** Hard bound on JW key length, mirroring
    * [[graft.functions.DamerauLevenshtein]]'s 4M-cell DP discipline: both
    * candidate routes do O(len²) per-row work ([[charOccElements]]'s
    * running occurrence count; the anagram route's deletion-variant
    * explode) plus an explode to ~len rows per record, so at 1024 chars a
    * record costs ~1M element ops and 1k posting rows — the practical
    * ceiling for name/title keys. Pointing the operator at document-scale
    * text (this repo's `documents.text` runs to ~100k chars → 10¹⁰ ops
    * PER ROW) must fail loudly at plan time, not melt an executor;
    * shingle/MinHash dedup ([[Dedup]]) is the right tool there.
    */
  private[graft] val MaxJwKeyLen = 1024

  private def jwMaxLen(dfs: Seq[(DataFrame, String)]): Int = {
    val maxLen = dfs.map { case (df, str) =>
      val r = df.agg(max(length(col(str)))).head()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }.max
    require(maxLen <= MaxJwKeyLen,
      s"jaro-winkler candidate generation is for name/title keys: longest " +
        s"input string is $maxLen chars (max $MaxJwKeyLen). Both routes do " +
        "O(len^2) per-row element work; for document-scale text use " +
        "shingle/MinHash dedup (graft.operators.Dedup) instead")
    maxLen
  }

  /** ANAGRAM deletion blocking — the generator for TIGHT thresholds,
    * where the match bound m ≥ (3·jm−2)·max(|a|,|b|) leaves each side at
    * most `maxDel ≤ 2` characters outside the common multiset: two
    * qualifying strings then share a deletion variant of their SORTED
    * character strings (remove each side's ≤ maxDel unmatched chars and
    * the common multiset remains, in canonical order — the SymSpell
    * pigeonhole on multisets instead of sequences). Posting keys are
    * near-whole sorted strings — practically unique — so candidate volume
    * tracks the true-pair count instead of any posting list's square.
    * Digit-structured corpora (ids, "Customer#000000042") defeat
    * character-frequency prefixes (every record shares the rare
    * elements); they cannot defeat a key that IS the multiset minus a
    * character or two.
    */
  private def jwAnagramPrep(df: DataFrame, id: String, str: String,
                            blockCols: Seq[String], maxDel: Int,
                            jm: Double): DataFrame = {
    // any qualifying pair's witness variant is the common multiset C with
    // |C| = overlap ≥ ⌈(3·jm−2)·len⌉ for EITHER side's len, so variants
    // shorter than the record's own bound cannot witness anything — prune
    // them (lossless). Without this, short strings all share the empty /
    // one-char variants and their posting lists go quadratic on
    // short-string corpora.
    val factor = 3.0 * jm - 2.0
    val alpha = greatest(
      ceil(col("__len") * factor - 1e-9).cast("int"), lit(1))
    // spread the narrow scan first: the per-row variant build is the
    // expensive part, and a single-file parquet input would otherwise run
    // it on one or two cores
    graft.sources.Tables.ensureParallelism(
      df.select(col(id).as("__jwid") +: col(str).as("__jws") +:
        blockCols.map(col): _*))
      .withColumn("__len", length(col("__jws")))
      .select(col("__jwid") +: col("__jws") +: col("__len") +:
        explode(deletionVariants(sortedChars(col("__jws")),
          math.max(maxDel, 1))).as("__v") +:
        blockCols.map(col): _*)
      .filter(length(col("__v")) >= alpha)
  }

  private def jwAnagramJoin(preA: DataFrame, preB: DataFrame, jm: Double,
                            blockCols: Seq[String],
                            leftLtRight: Boolean): DataFrame = {
    val factor = 3.0 * jm - 2.0
    val band = least(col("a.__len"), col("b.__len")).cast("double") >=
      greatest(col("a.__len"), col("b.__len")) * factor - 1e-9
    val blockEq = blockCols
      .map(b => col(s"a.$b") === col(s"b.$b"))
      .foldLeft(lit(true))(_ && _)
    val order =
      if (leftLtRight) col("a.__jwid") < col("b.__jwid") else lit(true)
    // the candidate stream is the one corpus-scale exchange here, and a
    // pair matches once per shared variant — dedup carries ONLY the
    // 16-byte id pair through the global distinct (the ×100 rehearsal
    // measured the string-carrying form spilling at 485M candidate
    // rows), then reattaches the verify strings from input-sized
    // (id → string) maps. That reattach is only lossless when __jws is
    // functionally dependent on __jwid, so id uniqueness is ENFORCED
    // in-plan (raise_error inside the map build — the requireUniqueIds
    // discipline of the graph index): a duplicate id with two distinct
    // strings would otherwise silently pick one and drop true matches
    // at verify time
    val ids = preA.as("a").join(preB.as("b"),
        col("a.__v") === col("b.__v") && order && band && blockEq)
      .select(col("a.__jwid").as("i"), col("b.__jwid").as("j"))
      .distinct()
    def strMap(pre: DataFrame, idOut: String, strOut: String): DataFrame =
      pre.select(col("__jwid").as(idOut), col("__jws").as(strOut))
        // one shuffle: the map-side partial collect_set collapses the
        // per-variant duplication before the exchange
        .groupBy(col(idOut))
        .agg(collect_set(col(strOut)).as("__ss"))
        .select(col(idOut),
          when(size(col("__ss")) > 1,
            raise_error(concat(lit("duplicate id with conflicting " +
              "strings in the fuzzy-join input: "), col(idOut).cast("string"),
              lit(" — ids must determine their string"))))
            .otherwise(element_at(col("__ss"), 1)).as(strOut))
    val sA = strMap(preA, "i", "si")
    val sB = strMap(preB, "j", "sj")
    ids.join(sA, "i").join(sB, "j").select("i", "j", "si", "sj")
  }

  private def jwRequire(minJw: Double): Unit =
    require(minJw > 0.8 && minJw <= 1.0,
      s"minJw=$minJw: the Jaro match bound 3j-2 must stay positive in " +
        "both boost strata; below 0.8 use coarser blocking instead")

  /** Lossless candidate pairs for `jaro_winkler(a, b) >= minJw` within
    * equal `blockCols` — every qualifying pair is returned; non-qualifying
    * pairs may be too (callers verify with the exact comparator, q88's
    * generate-then-verify discipline). Derivation, for the
    * RapidFuzz/DuckDB variant [[graft.functions.JaroWinkler]]:
    * jw ≤ jaro + ℓ·0.1·(1−jaro) with prefix ℓ ≤ 4, so jw ≥ t forces
    * jaro ≥ (t−0.4)/0.6 when the first chars agree and jaro ≥ t when they
    * differ (no boost without a shared first char); each Jaro term ≤ 1
    * forces the match count m ≥ (3·jaro−2)·max(|a|,|b|); Jaro matching is
    * injective on character occurrences, so the (ch, occ) element overlap
    * is ≥ m. That yields a LENGTH BAND, an element-overlap bound driving
    * the rarity-ordered prefix filter, and a pairwise POSITIONAL prune —
    * all exact inequalities, so the union of the two strata provably
    * contains every qualifying pair (spec: brute-force equality at
    * t ∈ {0.85, 0.9, 0.98}).
    *
    * Scale shape: explode is ×len; the element-frequency table is
    * alphabet×maxOcc-sized (broadcast); the prefix cut is one keyed
    * window per record; candidates come from EQUI-joins on
    * (element, first-char, blocks) — never a cartesian. Candidate volume
    * is Σ over prefix elements of posting², concentrated on rare
    * elements by the rarity order and split by the alphabet in the
    * shared-first-char stratum. BMP strings only for exactness (the
    * comparator compares UTF-16 code units; `length` counts code
    * points).
    *
    * Output: (i, j, si, sj) with i < j, distinct.
    */
  def jaroWinklerSelfCandidates(df: DataFrame, minJw: Double,
                                idCol: String = "id", strCol: String = "name",
                                blockCols: Seq[String] = Nil): DataFrame = {
    jwRequire(minJw)
    val jBoost = (minJw - 0.4) / 0.6
    val maxDel = jwDeletionsNeeded(jwMaxLen(Seq((df, strCol))), jBoost)
    if (maxDel <= 2) {
      val pre = graft.CacheRegistry.persist(
        jwAnagramPrep(df, idCol, strCol, blockCols, maxDel, jBoost))
      jwAnagramJoin(pre, pre, jBoost, blockCols, leftLtRight = true)
    } else {
      val elems = graft.CacheRegistry.persist(
        jwElements(df, idCol, strCol, blockCols))
      val freq = elems.groupBy(col("__ch"), col("__occ"))
        .agg(count(lit(1)).as("__df"))
      val loose = graft.CacheRegistry.persist(
        jwPrefixes(elems, freq, jBoost))
      val tight = jwPrefixes(elems, freq, minJw)
      jwCandidateUnion((loose, loose), (tight, tight), minJw, blockCols,
        leftLtRight = true)
    }
  }

  /** Two-table [[jaroWinklerSelfCandidates]]: lossless candidates for
    * `jaro_winkler(left str, right str) >= minJw` with equal `blockCols`
    * (columns of BOTH frames under the same names). The element-frequency
    * order is computed over the UNION of both sides so the two prefix
    * cuts share one total order — required for the pigeonhole argument.
    * Output: (left_id, right_id, sl, sr), distinct.
    */
  def jaroWinklerCandidates(left: DataFrame, right: DataFrame, minJw: Double,
                            leftId: String, leftStr: String,
                            rightId: String, rightStr: String,
                            blockCols: Seq[String] = Nil): DataFrame = {
    jwRequire(minJw)
    val jBoost = (minJw - 0.4) / 0.6
    val maxDel = jwDeletionsNeeded(
      jwMaxLen(Seq((left, leftStr), (right, rightStr))), jBoost)
    val out = if (maxDel <= 2) {
      val lp = graft.CacheRegistry.persist(
        jwAnagramPrep(left, leftId, leftStr, blockCols, maxDel, jBoost))
      val rp = graft.CacheRegistry.persist(
        jwAnagramPrep(right, rightId, rightStr, blockCols, maxDel, jBoost))
      jwAnagramJoin(lp, rp, jBoost, blockCols, leftLtRight = false)
    } else {
      val le = graft.CacheRegistry.persist(
        jwElements(left, leftId, leftStr, blockCols))
      val re = graft.CacheRegistry.persist(
        jwElements(right, rightId, rightStr, blockCols))
      val freq = le.select(col("__ch"), col("__occ"))
        .unionByName(re.select(col("__ch"), col("__occ")))
        .groupBy(col("__ch"), col("__occ")).agg(count(lit(1)).as("__df"))
      val ll = jwPrefixes(le, freq, jBoost)
      val rl = jwPrefixes(re, freq, jBoost)
      val lt = jwPrefixes(le, freq, minJw)
      val rt = jwPrefixes(re, freq, minJw)
      jwCandidateUnion((ll, rl), (lt, rt), minJw, blockCols,
        leftLtRight = false)
    }
    out.withColumnsRenamed(Map("i" -> "left_id", "j" -> "right_id",
      "si" -> "sl", "sj" -> "sr"))
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
