package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.Blake2b
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

  property("colRef: bijective over a large range and strictly A1-ordered") =
    Prop.forAll(Gen.choose(0, 20000), Gen.choose(0, 20000)) { (a, b) =>
      val (ra, rb) = (ExcelSink.colRef(a), ExcelSink.colRef(b))
      (a == b) == (ra == rb) &&
      // A1 ordering: shorter refs sort before longer; same length → lexicographic
      ((a < b) == (ra.length < rb.length || (ra.length == rb.length && ra < rb)) || a == b)
    }
}
