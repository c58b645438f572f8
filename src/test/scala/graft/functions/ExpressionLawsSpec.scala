package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests pinning the fused codegen expressions to independent
  * JVM reference implementations over ARBITRARY unicode text (ASCII,
  * multi-byte, astral-plane, runs of spaces, empties) — no Spark session,
  * so these fuzz thousands of cases cheaply. The Spark-side equivalence
  * to the composed Column forms is covered in FunctionsSpec; these laws
  * check the byte-level walkers themselves.
  */
object ExpressionLawsSpec extends Properties("ExpressionLaws") {

  private val piece: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const(" "),
    Gen.const("  "),
    Gen.oneOf("é", "中", "文文", "😀", "ß", "\t", "."))
  private val text: Gen[String] = Gen.listOf(piece).map(_.mkString)
  private val width: Gen[Int] = Gen.choose(1, 8)

  private def refHash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Code-point windows exactly like Hashing.shingles (substr semantics:
    * short tails at the end collapse into shorter windows; texts shorter
    * than n yield the whole text once), pre-distinct.
    */
  private def refWindows(s: String, n: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    val count = math.max(cps.length - (n - 1), 1)
    (0 until count).map(i => new String(cps, i, math.min(n, cps.length - i)))
  }

  property("CharGini.gini ≡ 1 − Σcnt²/len² over code points (NaN iff empty)") =
    Prop.forAll(text) { s =>
      val cps = s.codePoints().toArray.toSeq
      val got = CharGini.gini(UTF8String.fromString(s))
      if (cps.isEmpty) got.isNaN
      else {
        val sumsq = cps.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
        val len = cps.size.toDouble
        got == 1.0 - sumsq.toDouble / (len * len)
      }
    }

  property("FloatVecDot.dot ≡ index-order double accumulation") =
    Prop.forAll(Gen.listOfN(16, Gen.chooseNum(-1e6f, 1e6f))) { fs =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(fs.toArray)
      var acc = 0.0
      fs.foreach(f => acc += f.toDouble * f.toDouble)
      FloatVecDot.dot(arr, arr) == acc
    }

  property("WordBigrams.build ≡ split/filter/sliding reference") =
    Prop.forAll(text) { s =>
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val ref = if (toks.length < 2) Seq.empty[String]
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      val arr = WordBigrams.build(UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      got == ref
    }

  property("MinShingleHash60.minHash ≡ min of md5-60 over windows") =
    Prop.forAll(text, width) { (s, n) =>
      val ref = refWindows(s, n).map(refHash60).min
      MinShingleHash60.minHash(UTF8String.fromString(s), n) == ref
    }

  property("ShingleHash60s.hashes ≡ distinct windows hashed, first-occurrence order") =
    Prop.forAll(text, width) { (s, n) =>
      val ref = refWindows(s, n).distinct.map(refHash60)
      val arr = ShingleHash60s.hashes(UTF8String.fromString(s), n)
      val got = (0 until arr.numElements()).map(arr.getLong)
      got == ref
    }

  property("TokenStats.stats ≡ split/distinct/stopword/codepoint-length reference") =
    Prop.forAll(text) { s =>
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val stop = TokenStats.DefaultStopwords.toSet
      val stopSet = new java.util.HashSet[UTF8String]()
      TokenStats.DefaultStopwords.foreach(w => stopSet.add(UTF8String.fromString(w)))
      val row = TokenStats.stats(UTF8String.fromString(s), stopSet)
      row.getInt(0) == toks.length &&
        row.getInt(1) == toks.distinct.length &&
        row.getInt(2) == toks.count(stop) &&
        row.getLong(3) == toks.map(t => t.codePointCount(0, t.length).toLong).sum &&
        row.getInt(4) == s.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
    }

  property("TermCounts.counts ≡ groupBy-count reference, first-occurrence order") =
    Prop.forAll(text) { s =>
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val ref = toks.distinct.map(t => (t, toks.count(_ == t).toLong))
      val arr = TermCounts.counts(UTF8String.fromString(s))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      got == ref
    }

  property("SimHashSig.sig ≡ per-bit majority vote of token md5-60s (-1 iff no tokens)") =
    Prop.forAll(text, Gen.choose(1, 62)) { (s, bits) =>
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val ref =
        if (toks.isEmpty) -1L
        else {
          val votes = new Array[Int](bits)
          toks.foreach { t =>
            val h = refHash60(t)
            (0 until bits).foreach { j =>
              if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            }
          }
          (0 until bits).map(j => if (votes(j) > 0) 1L << j else 0L).sum
        }
      SimHashSig.sig(UTF8String.fromString(s), bits) == ref
    }

  property("MinHashSig.sig ≡ (a + i·b) mod-masked mins over windows") =
    Prop.forAll(text, width, Gen.choose(1, 16)) { (s, n, k) =>
      val h60Mask = (1L << 60) - 1
      val b56Mask = (1L << 56) - 1
      val ws = refWindows(s, n)
      val ref = (0 until k).map { i =>
        ws.map { w =>
          val a = refHash60(w)
          val b = refHash60("#" + w) & b56Mask
          (a + i.toLong * b) & h60Mask
        }.min
      }
      val arr = MinHashSig.sig(UTF8String.fromString(s), n, k)
      val got = (0 until arr.numElements()).map(arr.getLong)
      got == ref
    }

  // small-vocab token streams so duplicated grams actually occur (the
  // generic `text` gen almost never repeats a k-gram)
  private val repetitiveText: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "aa", "x", "é中", "😀")).map(_.mkString(" "))

  property("DupGramCovered.covered ≡ interval-union over duplicated sliding grams") =
    Prop.forAll(Gen.oneOf(text, repetitiveText), Gen.choose(2, 5)) { (s, k) =>
      val toks = s.split(" ", -1).filter(_.nonEmpty).toSeq
      val ref =
        if (toks.length < k) 0
        else {
          val hashes = toks.sliding(k).map(g => refHash60(g.mkString(" "))).toVector
          val counts = hashes.groupBy(identity).view.mapValues(_.size).toMap
          val dupStarts = hashes.zipWithIndex.collect {
            case (h, p) if counts(h) >= 2 => p + 1 // 1-based
          }
          // union of [p, p+k-1] as a position-set size
          dupStarts.flatMap(p => p until (p + k)).distinct.size
        }
      DupGramCovered.covered(UTF8String.fromString(s), k) == ref
    }
}
