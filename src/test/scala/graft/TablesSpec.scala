package graft

import graft.sources.Tables

/** Source-side contracts not already pinned by the pipeline goldens:
  * CSV round-trip with the ingest conventions, the rename map, and the
  * latest-partition / file-split resolvers as bare units.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("csv: header, inferred schema, lowercased column names") {
    val dir = tmpDir("graft-csv")
    val w = new java.io.PrintWriter(s"$dir/t.csv")
    w.println("ID,Amount,Label"); w.println("1,2.5,a"); w.println("2,3.5,b"); w.close()
    val df = Tables.csv(spark, s"$dir/t.csv")
    assert(df.columns.toSeq === Seq("id", "amount", "label"))
    assert(df.schema("id").dataType.typeName === "integer")
    assert(df.schema("amount").dataType.typeName === "double")
    assert(df.orderBy("id").collect().map(_.getDouble(1)).toSeq === Seq(2.5, 3.5))
  }

  test("jsonl: one document per line, lowercased names, optional schema") {
    val dir = tmpDir("graft-jsonl")
    val w = new java.io.PrintWriter(s"$dir/docs.jsonl")
    w.println("""{"Doc_ID": 1, "Text": "hello world", "lang": "en"}""")
    w.println("""{"Doc_ID": 2, "Text": "bonjour", "lang": "fr"}""")
    w.close()
    val df = Tables.jsonl(spark, s"$dir/docs.jsonl")
    assert(df.columns.sorted.toSeq === Seq("doc_id", "lang", "text"))
    assert(df.count() === 2)
    assert(df.filter($"doc_id" === 1).head().getAs[String]("text") === "hello world")
    // explicit schema skips the inference pass and pins types
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "Doc_ID LONG, Text STRING, lang STRING")
    val typed = Tables.jsonl(spark, s"$dir/docs.jsonl", Some(schema))
    assert(typed.schema("doc_id").dataType.typeName === "long")
    assert(typed.count() === 2)
  }

  test("renameColumns applies the map and ignores absent keys") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = Tables.renameColumns(df, Map("a" -> "id", "zzz" -> "nope"))
    assert(out.columns.toSeq === Seq("id", "b"))
  }

  test("latestPartition picks the lexicographic max date dir; None when empty") {
    val dir = tmpDir("graft-latest")
    for (d <- Seq("2024-01-02", "2024-01-10", "2023-12-31"))
      new java.io.File(s"$dir/$d").mkdirs()
    new java.io.PrintWriter(s"$dir/stray.txt") { println("x"); close() }
    assert(Tables.latestPartition(spark, dir) === Some("2024-01-10"))
    assert(Tables.latestPartition(spark, tmpDir("graft-empty")) === None)
    assert(Tables.latestPartition(spark, s"$dir/does-not-exist") === None)
  }

  test("partitionFiles splits by extension and sorts") {
    val dir = tmpDir("graft-files")
    for (f <- Seq("b.csv", "a.parquet", "ignore.txt"))
      new java.io.PrintWriter(s"$dir/$f") { println("x"); close() }
    val files = Tables.partitionFiles(spark, dir)
    assert(files.map(_._1) === Seq("parquet", "csv"))
    assert(files.map(f => new java.io.File(f._2).getName) === Seq("a.parquet", "b.csv"))
  }

  test("ensureParallelism widens a single-split scan and no-ops otherwise") {
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
      .coalesce(1)
    val wide = Tables.ensureParallelism(narrow)
    assert(wide.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    val already = narrow.repartition(spark.sparkContext.defaultParallelism)
    // no extra exchange on top of an already-parallel frame
    assert(Tables.ensureParallelism(already) eq already)
    // wide-plan gate: Dataset.distinct() (Deduplicate) and set ops shuffle
    // already — the probe must return them untouched, never run their
    // shuffle at plan-build time
    val deduped = narrow.distinct()
    assert(Tables.ensureParallelism(deduped) eq deduped)
    val setOp = narrow.intersect(narrow.limit(10))
    assert(Tables.ensureParallelism(setOp) eq setOp)
  }
}
