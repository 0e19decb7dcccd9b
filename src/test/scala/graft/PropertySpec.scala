package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{Blake2b, MisraGries}
import graft.operators.Anonymize
import graft.sinks.ExcelSink

/** ScalaCheck contracts for the pure kernels (no Spark session needed):
  * hash stability/injectivity-in-practice, enumeration shape, column refs.
  */
object PropertySpec extends Properties("graft") {

  private val strGen = Gen.stringOf(Gen.alphaNumChar).map(_.take(64))

  property("blake2b: deterministic, 2*digestSize lowercase hex") =
    Prop.forAll(strGen, Gen.choose(1, 32)) { (s, d) =>
      val h1 = Blake2b.hexDigest(s.getBytes("UTF-8"), d)
      val h2 = Blake2b.hexDigest(s.getBytes("UTF-8"), d)
      h1 == h2 && h1.length == 2 * d && h1.matches("[0-9a-f]+")
    }

  property("blake2b: distinct inputs -> distinct 10-hex pseudonyms (sampled)") =
    Prop.forAll(Gen.listOfN(50, strGen)) { xs =>
      val distinct = xs.distinct
      distinct.map(s => Blake2b.hexDigest(s.getBytes("UTF-8"), 5)).toSet.size == distinct.size
    }

  property("blake2b: digest prefixes differ across sizes (independent params)") =
    Prop.forAll(strGen.suchThat(_.nonEmpty)) { s =>
      // RFC 7693 folds digest length into the parameter block, so a 5-byte
      // digest is NOT a truncation of the 8-byte digest
      val d5 = Blake2b.hexDigest(s.getBytes("UTF-8"), 5)
      val d8 = Blake2b.hexDigest(s.getBytes("UTF-8"), 8)
      !d8.startsWith(d5)
    }

  private val unicodeGen = Gen.listOf(Gen.frequency(
    4 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('́', '̈', '̀', 'é', 'ü',
      '中', ' '))).map(_.mkString)

  property("nfc kernel: equals java.text.Normalizer NFC and is idempotent") =
    Prop.forAll(unicodeGen) { s =>
      val once = graft.functions.NfcNormalize.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      val twice = graft.functions.NfcNormalize.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(once)).toString
      once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC) &&
        twice == once
    }

  property("charClassCounts: matches reference classification and sums " +
    "to the code-point count") =
    Prop.forAll(unicodeGen) { s =>
      val got = graft.functions.CharClassCounts.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toLongArray()
      val cps = s.codePoints().toArray
      val ref = new Array[Long](28)
      cps.foreach { cp =>
        val i = if (cp >= 'a' && cp <= 'z') cp - 'a'
                else if (cp == ' ') 26 else 27
        ref(i) += 1
      }
      got.sameElements(ref) && got.sum == cps.length.toLong
    }

  property("labelIndex: 1-based contiguous enumeration in sorted order") =
    Prop.forAll(Gen.listOf(strGen)) { labels =>
      val idx = Anonymize.labelIndex(labels, "ANON")
      // nulls and empty strings carry no identity and are dropped
      val distinct = labels.filter(l => l != null && l.nonEmpty).distinct.sorted
      if (distinct.size <= 1) idx.values.toSet.subsetOf(Set("ANON"))
      else {
        idx.size == distinct.size &&
        distinct.zipWithIndex.forall { case (l, i) => idx(l) == s"ANON ${i + 1}" }
      }
    }

  property("misra-gries: any stream, any split — bounds hold, serde round-trips") =
    Prop.forAll(
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")),
      Gen.choose(1, 6), Gen.choose(0, 100)) { (stream, k, cut) =>
      // the aggregate's buffer algebra exercised directly (no session):
      // update on two arbitrary partitions, serde round-trip, merge
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.StringType
      import org.apache.spark.unsafe.types.UTF8String
      val agg = MisraGries(BoundReference(0, StringType, nullable = true), k)
      val (p1, p2) = stream.splitAt(cut % (stream.size + 1))
      def fill(part: Seq[String]) = {
        val buf = agg.createAggregationBuffer()
        part.foreach(s => agg.update(buf, InternalRow(UTF8String.fromString(s))))
        buf
      }
      val merged = agg.merge(fill(p1), agg.deserialize(agg.serialize(fill(p2))))
      val n = stream.size
      val bound = n / (k + 1)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sizeOk = merged.size <= k
      val boundsOk = merged.forall { case (item, est) =>
        est <= truth(item) && est >= truth(item) - bound
      }
      val heavyOk = truth.forall { case (item, c) =>
        c <= bound || merged.contains(item)
      }
      val exactOk = truth.size > k ||
        merged.toMap == truth // distinct <= k: every count exact
      sizeOk && boundsOk && heavyOk && exactOk
    }

  property("colRef: bijective over a large range and strictly A1-ordered") =
    Prop.forAll(Gen.choose(0, 20000), Gen.choose(0, 20000)) { (a, b) =>
      val (ra, rb) = (ExcelSink.colRef(a), ExcelSink.colRef(b))
      (a == b) == (ra == rb) &&
      // A1 ordering: shorter refs sort before longer; same length → lexicographic
      ((a < b) == (ra.length < rb.length || (ra.length == rb.length && ra < rb)) || a == b)
    }
}
