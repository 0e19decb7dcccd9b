package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.Anonymize

/** Every custom expression must actually COMPILE under whole-stage
  * codegen. A codegen failure doesn't fail tests by default — Spark logs
  * an error and silently falls back to interpreted mode, which keeps
  * results correct while quietly discarding the performance the native
  * kernels exist for (a missing static forwarder did exactly this to the
  * shingle kernel). CODEGEN_ONLY turns that silent fallback into a loud
  * failure.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  /** CODEGEN_ONLY covers the expression-projection factory; the
    * whole-stage path has its OWN silent fallback (a janino failure
    * drops the stage to the non-codegen operators and logs), so
    * `spark.sql.codegen.fallback=false` is set too — with both, any
    * compile failure anywhere in the plan fails the test instead of
    * passing on interpreted results (ADVICE r12: the k=400 kernel
    * assertion was exactly the regression this would have masked).
    */
  private def withCodegenOnly[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  test("all custom kernels compile under CODEGEN_ONLY") {
    withCodegenOnly {
      val docs = Seq((1L, "the quick brown fox jumps"), (2L, "a b"))
        .toDF("doc_id", "text").repartition(2) // repartition defeats local-relation pre-evaluation
      // WordShingles
      assert(docs.select(explode(TextFunctions.shingles(col("text"), 3))).count() === 3)
      // CharShingles ("a b" has 3 chars → 1 window of 3; other doc 25−3+1)
      assert(docs.select(explode(TextFunctions.charShingles(col("text"), 3))).count() === 24)
      // Blake2b
      assert(docs.select(GraftFunctions.blake2b_hex(col("text"))).count() === 2)
      // ArrayDotProduct
      val emb = Seq((1L, Array(1.0, 2.0)), (2L, Array(3.0, 4.0)))
        .toDF("id", "v").repartition(2)
      val dots = emb.select(GraftFunctions.dot_product(col("v"), col("v")).as("d"))
        .as[Double].collect().sorted
      assert(dots === Array(5.0, 25.0))
      // MultiWordReplace (reference-object codegen path)
      val labeled = Seq("acme ships", "nothing here").toDF("c").repartition(2)
      val out = Anonymize.anonymizeLabels(labeled, "c", Seq("acme", "other"))
        .as[String].collect().toSet
      assert(out === Set("ANON_CLIENT 1 ships", "nothing here"))
      // StableDouble
      val sd = emb.select((GraftFunctions.stable_lit(2.0) *
        GraftFunctions.dot_product(col("v"), col("v"))).as("d"))
        .as[Double].collect().sorted
      assert(sd === Array(10.0, 50.0))
      // Md5Lanes (digest lane 0 of "a" = 0x0cc175b9, per hashlib)
      val lanes = docs.select(element_at(
          GraftFunctions.md5_lanes(lit("a")), 1).as("l"))
        .as[Long].collect()
      assert(lanes.forall(_ === 0x0cc175b9L))
      // CharClassCounts ("a b": 1×a, 1×b, 1×space)
      val ccc = docs.select(graft.functions.GraftFunctions
        .char_class_counts(col("text")).as("c"))
        .collect().map(_.getSeq[Long](0))
      assert(ccc.forall(_.sum > 0))
      assert(ccc.exists(a => a(0) === 1L && a(1) === 1L && a(26) === 1L))
      // NfcNormalize (decomposed e + U+0301 must compose to é)
      val deco = Seq("café", "ascii only").toDF("c").repartition(2)
      val nfc = deco.select(TextFunctions.nfcNormalize(col("c")))
        .as[String].collect().toSet
      assert(nfc === Set("café", "ascii only"))
      // NearestCells — at k=400, the size that broke the struct-literal
      // form (64 KB method limit): must COMPILE, not fall back
      val bigIdx = graft.operators.IVF.Index(
        Array.tabulate(400, 8)((i, d) => math.sin(i * 8 + d)))
      val cells = emb.select(col("id"), graft.functions.GraftFunctions
          .nearest_cells(array_repeat(col("v")(0), 8)
            .cast("array<double>"), bigIdx.centroids, 5).as("cs"))
        .collect().map(_.getSeq[Int](1))
      assert(cells.forall(_.length === 5))
      // NearestCells at the 1e9-vector deployment sizing (~16k cells,
      // HnswSpec's defaultShards line): the kernel's generated source is
      // constant-size in k (one loop over a reference-array matrix), so
      // the compile must succeed at ANY k — asserted at k=16384 because
      // "holds by construction" is exactly what the k≈400 janino episode
      // disproved for the struct form. Compile time is bounded: the
      // wall-clock is logged for BASELINE's note.
      val hugeIdx = Array.tabulate(16384, 8)((i, d) => math.sin(i * 8L + d))
      val t0 = System.nanoTime()
      val cells16k = emb.select(graft.functions.GraftFunctions
          .nearest_cells(array_repeat(col("v")(0), 8)
            .cast("array<double>"), hugeIdx, 4).as("cs"))
        .collect().map(_.getSeq[Int](0))
      info(f"nearest_cells k=16384 CODEGEN_ONLY pass: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      assert(cells16k.forall(_.length === 4))
      assert(cells16k.forall(_.forall(c => c >= 0 && c < 16384)))
    }
  }

  test("nearest_cells is bitwise the struct-literal argmin/sort form at " +
       "every (k, nProbe) shape, ties included") {
    import graft.operators.IVF
    // crafted ties: centroids 2 and 5 identical -> equal scores, lower
    // cid must order first (the lexicographic struct contract)
    val cents = Array.tabulate(8, 4)((i, d) =>
      if (i == 5) math.cos(2 * 4 + d) else math.cos(i * 4 + d))
    val idx = IVF.Index(cents)
    val vecs = (1 to 200).map { r =>
      (r.toLong, (0 until 4).map(d =>
        math.sin(r * 17 + d * 3) * 2.0).toArray)
    }
    val df = vecs.toDF("id", "v").repartition(3)
    for (nProbe <- Seq(1, 3, 8, 12)) {
      val native = df.select(col("id"),
          GraftFunctions.nearest_cells(col("v"), idx.centroids,
            math.min(nProbe, idx.k)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val struct = df.select(col("id"),
          IVF.structProbeExpr(col("v"), idx, nProbe).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(native === struct, s"nProbe=$nProbe")
    }
    // the driver-side kernel agrees with probeIds' argmin on every vector
    vecs.take(20).foreach { case (_, v) =>
      val a = IVF.probeIds(idx, v, 1).head
      assert(graft.functions.CentroidOps.nearest(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        idx.centroids, idx.centroids.map(_.map(x => x * x).sum), 1)
        .toIntArray().head === a)
    }
  }

  test("hyperplane_sig is bitwise the per-plane when(dot >= 0) tree and " +
       "compiles under CODEGEN_ONLY") {
    import graft.operators.Similarity
    val planes = Similarity.hyperplanes(16, 8)
    val vecs = (1 to 150).map { r =>
      (r.toLong, (0 until 8).map(d => math.sin(r * 13 + d * 5) * 2.0).toArray)
    }
    val df = vecs.toDF("id", "v").repartition(3)
    // the retired expression-tree form, rebuilt inline as the reference
    val tree = (0 until planes.length).map { b =>
      when(GraftFunctions.dot_product(col("v"), lit(planes(b))) >= 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
    def dump(c: org.apache.spark.sql.Column) =
      df.select(col("id"), c.as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dump(GraftFunctions.hyperplane_sig(col("v"), planes)) ===
      dump(tree))
    // the driver-side signature agrees (lshNeighbors compares the two)
    vecs.take(20).foreach { case (_, v) =>
      assert(graft.functions.HyperplaneOps.signature(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        planes) === Similarity.querySignature(v, planes))
    }
    withCodegenOnly {
      val sigs = df.select(GraftFunctions.hyperplane_sig(col("v"), planes))
        .as[Long].collect()
      assert(sigs.length === 150)
    }
    // loud nulls, as every vector kernel contracts
    val bad = Seq((1L, Seq[java.lang.Double](1.0, null))).toDF("id", "v")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.hyperplane_sig(col("v"), planes)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("hyperplane_sig"), msgs)
  }

  test("stable_lit generates value-invariant source and survives the optimizer") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    // the whole point: two different constants → byte-identical generated
    // source (the value rides the reference array), so re-planned training
    // iterations share one compiled class instead of recompiling per plan
    def src(x: Double): String = {
      val ctx = new CodegenContext
      graft.functions.StableDouble(x).genCode(ctx).code.toString
    }
    assert(src(1.5) === src(-273.15))
    assert(!graft.functions.StableDouble(1.5).foldable)
    // and ConstantFolding must not collapse it back into an embedded literal
    val plan = spark.range(1).select(
      (GraftFunctions.stable_lit(3.25) + col("id")).as("x"))
      .queryExecution.optimizedPlan
    assert(plan.expressions.exists(_.exists(_.isInstanceOf[graft.functions.StableDouble])),
      s"StableDouble folded away:\n$plan")
  }

  test("stable_lit_long: value-invariant source, correct arithmetic, " +
    "optimizer-proof") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    def src(x: Long): String = {
      val ctx = new CodegenContext
      graft.functions.StableLong(x).genCode(ctx).code.toString
    }
    assert(src(42L) === src(Long.MaxValue))
    assert(!graft.functions.StableLong(7L).foldable)
    // exactness past 2^53 — the reason PageRank cannot detour via doubles
    val big = (1L << 60) + 3L
    val got = spark.range(1)
      .select((GraftFunctions.stable_lit_long(big) + col("id")).as("x"))
      .collect().head.getLong(0)
    assert(got === big)
  }
}
