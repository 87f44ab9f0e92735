package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CharHashExpression, VecOps}

/** ScalaCheck properties for the native kernels (functions/VecOps) against
  * independent naive reimplementations — the same differential discipline
  * as the pipeline properties, at the expression level. */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100).withWorkers(1), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val P = VecOps.P

  test("qround: integer result, |x - qround(x)| <= 0.5, odd symmetry") {
    check(Prop.forAll(Gen.chooseNum(-1e12, 1e12)) { x =>
      val r = VecOps.qround(x)
      math.abs(x - r) <= 0.5 && VecOps.qround(-x) == -r
    })
  }

  test("qround: ties round away from zero") {
    check(Prop.forAll(Gen.chooseNum(-1000000L, 1000000L)) { n =>
      VecOps.qround(n + 0.5) == (if (n >= 0) n + 1 else n) &&
      VecOps.qround(n - 0.5) == (if (n > 0) n else n - 1)
    })
  }

  test("charHash: naive codepoint fold over arbitrary unicode strings") {
    // includes a supplementary-plane codepoint (surrogate pair in UTF-16)
    val genCp = Gen.oneOf(Gen.choose('a'.toInt, 'z'.toInt),
      Gen.oneOf(0xB5, 0xDF, 0x8A9E, 0x1F642, 0x20, 0x9))
    check(Prop.forAll(Gen.listOf(genCp)) { cps =>
      val s = cps.map(Character.toChars(_).mkString).mkString
      val naive = s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 131 + c) % P)
      CharHashExpression.hash(s) == naive
    })
  }

  test("gramHashes: distinct window hashes in first-occurrence order") {
    val genTokens = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dog", "cat", "a"))
    check(Prop.forAll(genTokens, Gen.choose(1, 4)) { (tokens, n) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray)
      val got = VecOps.gramHashes(arr, n).toLongArray().toSeq
      val th = tokens.map(CharHashExpression.hash)
      val naive = th.sliding(n).filter(_.size == n)
        .map(_.reduceLeft((h, t) => (h * 131 + t) % P)).toSeq.distinct
      got == naive
    })
  }

  test("gramSeq: all window hashes in order, duplicates kept") {
    val genTokens = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dog", "cat", "a"))
    check(Prop.forAll(genTokens, Gen.choose(1, 4)) { (tokens, n) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray)
      val got = VecOps.gramSeq(arr, n).toLongArray().toSeq
      val th = tokens.map(CharHashExpression.hash)
      val naive = th.sliding(n).filter(_.size == n)
        .map(_.reduceLeft((h, t) => (h * 131 + t) % P)).toSeq
      got == naive
    })
  }

  test("minhashSig: elementwise min of the permuted hash set") {
    val genHashes = Gen.listOf(Gen.chooseNum(0L, P - 1))
    check(Prop.forAll(genHashes, Gen.choose(1, 20)) { (hs, k) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(hs.toArray)
      val got = Option(VecOps.minhashSig(arr, k)).map(_.toLongArray().toSeq)
      val naive =
        if (hs.isEmpty) None
        else Some((0 until k).map(i =>
          hs.map(h => ((2L * i + 1) * h + 7919L * i + 1) % P).min))
      got == naive
    })
  }

  test("simHash: bits follow the sign of the per-bit vote") {
    val genTokens = Gen.nonEmptyListOf(Gen.oneOf("x", "yy", "zzz", "dog", "ox"))
    check(Prop.forAll(genTokens) { tokens =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray)
      val got = VecOps.simHash(arr)
      val th = tokens.map(CharHashExpression.hash)
      val naive = (0 until 32).map { j =>
        val vote = th.map(h => 2L * ((h >> j) & 1L) - 1L).sum
        if (vote > 0) 1L << j else 0L
      }.sum
      got == naive
    })
  }

  test("minGramHash: min over naive per-window folds; sentinel when short") {
    val genStr = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(genStr, Gen.choose(1, 10)) { (s, g) =>
      val got = VecOps.minGramHash(UTF8String.fromString(s), g)
      if (s.length < g) got == -1L
      else {
        val naive = s.map(_.toLong).sliding(g).filter(_.size == g)
          .map(_.reduceLeft((h, c) => (h * 131 + c) % P)).min
        got == naive
      }
    })
  }

  test("tokStats: naive count/charsum/stop-hit recomputation") {
    val genTok = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('ß')))
      .map(_.mkString)
    check(Prop.forAll(Gen.listOf(genTok), Gen.listOf(genTok)) { (toks, stops) =>
      import org.apache.spark.sql.catalyst.util.ArrayData
      val row = VecOps.tokStats(
        ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        ArrayData.toArrayData(stops.map(UTF8String.fromString).toArray[Any]))
      row.getLong(0) == toks.size.toLong &&
        row.getLong(1) == toks.map(t => t.codePointCount(0, t.length).toLong).sum &&
        row.getLong(2) == toks.count(stops.contains).toLong
    })
  }

  /** Bounded-heap aggregators: any interleaving of O(k) displace-inserts
    * and merges must equal sort-take-k of the full input (the top-k
    * identity that makes partial aggregation correct). */
  test("TopKPairsByValueAsc / TopKByValueDesc: fold+merge == global sort.take(k)") {
    import graft.operators.TypedAggregates.{TopKByValueDesc, TopKPairsByValueAsc}
    val genPairs = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 20L)))
    check(Prop.forAll(genPairs, Gen.choose(1, 8), Gen.choose(1, 5)) { (xs, k, nChunks) =>
      val asc = TopKPairsByValueAsc(k)
      val merged = xs.grouped(math.max(1, xs.size / nChunks))
        .map(_.foldLeft(asc.zero)(asc.reduce))
        .foldLeft(asc.zero)(asc.merge)
      val expAsc = xs.sortBy(p => (p._2, p._1)).take(k)
      val gotAsc = asc.finish(merged)

      val desc = TopKByValueDesc(k)
      val xsD = xs.map { case (id, v) => (id, v.toDouble) }
      val mergedD = xsD.grouped(math.max(1, xsD.size / nChunks))
        .map(_.foldLeft(desc.zero)(desc.reduce))
        .foldLeft(desc.zero)(desc.merge)
      val expDesc = xsD.sortBy(p => (-p._2, p._1)).take(k)
      gotAsc == expAsc && desc.finish(mergedD) == expDesc
    })
  }
}
