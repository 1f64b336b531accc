package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MathKernels

/** Property checks for the round-7 scalar kernels — pure JVM functions, so
  * the invariants run without a SparkSession. Each law is from the
  * function's published definition.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  test("jaro/jaroWinkler: identity, symmetry, [0,1] bounds") {
    for (Seq(a, b) <- samples(Gen.listOfN(2, word))) {
      val j = MathKernels.jaro(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - MathKernels.jaro(b, a)) < 1e-12, s"symmetry: '$a' '$b'")
      val w = MathKernels.jaroWinkler(a, b)
      assert(w >= j - 1e-12 && w <= 1.0, "winkler boosts, never exceeds 1")
    }
    for (a <- samples(word)) {
      assert(MathKernels.jaro(a, a) == 1.0 || a.isEmpty && MathKernels.jaro(a, a) == 1.0)
    }
  }

  test("damerauLevenshtein: metric-style laws") {
    for (Seq(a, b) <- samples(Gen.listOfN(2, word))) {
      val d = MathKernels.damerauLevenshtein(a, b)
      assert(d == MathKernels.damerauLevenshtein(b, a), "symmetry")
      assert(d >= math.abs(a.length - b.length), "length lower bound")
      assert(d <= math.max(a.length, b.length), "replace-all upper bound")
      assert((d == 0) == (a == b), "identity of indiscernibles")
    }
    // the transposition case that distinguishes it from plain Levenshtein
    assert(MathKernels.damerauLevenshtein("ab", "ba") == 1)
  }

  test("gcd/lcm: divisibility and product law") {
    val small = Gen.choose(-1000L, 1000L)
    for (Seq(a, b) <- samples(Gen.listOfN(2, small))) {
      val g = MathKernels.gcd(a, b)
      assert(g >= 0)
      if (g != 0) assert(a % g == 0 && b % g == 0)
      val l = MathKernels.lcm(a, b)
      if (a != 0 && b != 0) {
        assert(l % a == 0 && l % b == 0)
        assert(g * l == math.abs(a * b), s"gcd*lcm == |a*b| for $a, $b")
      } else assert(l == 0L)
    }
  }

  test("erf/erfc: complement, odd symmetry, bounds") {
    for (x <- samples(Gen.choose(-5.0, 5.0))) {
      assert(math.abs(MathKernels.erf(x) + MathKernels.erfc(x) - 1.0) < 1e-12)
      assert(math.abs(MathKernels.erf(x) + MathKernels.erf(-x)) < 1e-12)
      assert(MathKernels.erf(x) >= -1.0 && MathKernels.erf(x) <= 1.0)
    }
    // probit inverts the normal CDF: probit(Phi(x)) == x
    for (x <- samples(Gen.choose(-3.0, 3.0))) {
      val phi = 0.5 * MathKernels.erfc(-x / math.sqrt(2.0))
      assert(math.abs(MathKernels.probit(phi) - x) < 1e-9)
    }
  }

  test("tgamma/lgamma: recurrence and factorials") {
    for (x <- samples(Gen.choose(0.5, 20.0))) {
      // Gamma(x+1) = x * Gamma(x), checked in log space for stability
      assert(math.abs(MathKernels.lgamma(x + 1) - (math.log(x) + MathKernels.lgamma(x))) < 1e-9)
    }
    for (n <- 1 to 8) {
      assert(math.abs(MathKernels.tgamma(n + 1.0) - (1 to n).product.toDouble) < 1e-6)
    }
  }

  test("crc64: deterministic, distinct on simple corpora, ECMA check value") {
    val strs = samples(word).distinct
    val hashes = strs.map(s => MathKernels.crc64(s.getBytes("UTF-8")))
    assert(hashes == strs.map(s => MathKernels.crc64(s.getBytes("UTF-8"))), "deterministic")
    assert(hashes.distinct.size == strs.size, "no collisions on a small word set")
    // published ECMA-182 check value for '123456789'
    assert(MathKernels.crc64("123456789".getBytes("UTF-8")) == 0x6C40DF5F0B497347L)
  }

  test("readableTimeDelta: round-trips unit arithmetic") {
    assert(MathKernels.readableTimeDelta(0) == "0 seconds")
    assert(MathKernels.readableTimeDelta(1) == "1 second")
    assert(MathKernels.readableTimeDelta(61) == "1 minute, 1 second")
    assert(MathKernels.readableTimeDelta(-3661) == "-1 hour, 1 minute, 1 second")
    assert(MathKernels.readableTimeDelta(86400 * 366.0) == "1 year, 1 day")
  }

  test("NearestCells: insertion-select equals full sort-by-(dist,cell), ties included") {
    // the kernel's nProbe selection buffer is hand-rolled — check it against
    // the obvious reference (compute every distance, sort by (dist, cell),
    // take nProbe) over random shapes, INCLUDING duplicated centroids so
    // exact distance ties exercise the cell tie-break
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 60) {
      val dims = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(12)
      val nProbe = 1 + rnd.nextInt(k + 2) // may exceed k — clamps to k
      val base = Seq.fill(k)(Seq.fill(dims)(rnd.nextInt(4).toDouble))
      // duplicate a centroid under a different cell id to force dist ties
      val cents = if (k > 1) base.updated(k - 1, base.head) else base
      val cells = rnd.shuffle((0 until k).toList) // non-contiguous order too
      val v = Seq.fill(dims)(rnd.nextInt(4).toDouble)
      val expr = graft.functions.NearestCells(
        Literal.create(v, ArrayType(DoubleType)), cells, cents, nProbe)
      val got = expr.eval(InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val gotPairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getDouble(0), r.getInt(1))
      }
      val want = cells.zip(cents).map { case (cell, c) =>
        (c.zip(v).map { case (x, y) => (y - x) * (y - x) }.sum, cell)
      }.sorted.take(math.min(nProbe, k))
      assert(gotPairs == want, s"trial $trial dims=$dims k=$k nProbe=$nProbe")
    }
  }

  test("byte-level BPE: lossless — decoded hex tokens reconstruct the piece bytes (r15)") {
    import org.apache.spark.unsafe.types.UTF8String
    val text: Gen[String] = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
        1 -> Gen.oneOf('.', ',', '!', 'é', 'ß', '中'), 1 -> Gen.const('\n')))
    } yield cs.mkString
    val piece = java.util.regex.Pattern.compile(
      " ?[\\p{L}\\p{N}]+| ?[^\\p{L}\\p{N}\\s]+")
    def hexToBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // arbitrary merge tables must never change WHAT bytes the tokens
    // cover, only how they are grouped
    val merges = Seq(Array[String](), Array("74", "68", "7468", "65"),
      Array("20", "61", "C3", "A9", "61", "61"))
    for (s <- samples(text); m <- merges) {
      val enc = graft.functions.BpeOps.encodeBytes(UTF8String.fromString(s), m)
      val got = (0 until enc.numElements())
        .flatMap(i => hexToBytes(enc.getUTF8String(i).toString))
      val matcher = piece.matcher(s)
      val want = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while (matcher.find()) want ++= matcher.group().getBytes("UTF-8")
      assert(got == want.toSeq, s"'$s' merges=${m.mkString(",")}")
      // every token is whole bytes: even hex length, uppercase alphabet
      (0 until enc.numElements()).foreach { i =>
        val t = enc.getUTF8String(i).toString
        assert(t.length % 2 == 0 && t.forall("0123456789ABCDEF".contains(_)), t)
      }
    }
  }

  test("Md5Prefix60 equals the conv(substring(md5, 1, 15), 16, 10) device (r18)") {
    // the native kernel must be bit-identical to the hex-prefix spelling
    // every DuckDB oracle replays (q120/q135/q169 stay green off this)
    val rng = new scala.util.Random(60L)
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rng.nextInt(30))(rng.nextPrintableChar()).mkString
      val bytes = s.getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      val expected = new java.math.BigInteger(hex.substring(0, 15), 16).longValueExact()
      assert(graft.functions.Md5Prefix60.hash(bytes) == expected, s"input '$s'")
    }
  }

  test("GramHash60 equals the per-gram join+hash reference loop (r18)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(61L)
    (1 to 200).foreach { _ =>
      val len = rng.nextInt(12)
      val toks = Seq.fill(len)(
        Seq.fill(1 + rng.nextInt(5))(('a' + rng.nextInt(26)).toChar).mkString)
      val n = 1 + rng.nextInt(4)
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = graft.functions.GramHash60(
        org.apache.spark.sql.catalyst.expressions.Literal(1), n).compute(arr)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      val want =
        if (len < n) Seq.empty
        else (0 to len - n).map(i => graft.functions.Md5Prefix60.hash(
          toks.slice(i, i + n).mkString(" ").getBytes("UTF-8")))
      assert(gotSeq == want, s"toks=$toks n=$n")
    }
  }

  test("ArrayDigest128: canonical equality, distinctness, null/length domains (r21)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    def digD(xs: Seq[java.lang.Double]): Seq[Byte] =
      graft.functions.ArrayDigest128(Literal.create(xs, ArrayType(DoubleType)))
        .eval(null).asInstanceOf[Array[Byte]].toSeq
    def digL(xs: Seq[Long]): Seq[Byte] =
      graft.functions.ArrayDigest128(Literal.create(xs, ArrayType(LongType, false)))
        .eval(null).asInstanceOf[Array[Byte]].toSeq

    // grouping-key canonicalization: −0.0 ≡ +0.0, every NaN bit pattern ≡
    // the canonical NaN — exactly NormalizeFloatingNumbers' contract
    assert(digD(Seq(0.0, 1.5)) === digD(Seq(-0.0, 1.5)))
    val weirdNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    assert(digD(Seq(Double.NaN)) === digD(Seq(weirdNaN)))
    // value identity
    assert(digD(Seq(1.0, 2.0, 3.0)) === digD(Seq(1.0, 2.0, 3.0)))
    // null elements live in their own slot domain: distinct from any value
    // and from absence
    assert(digD(Seq(null, 1.0)) !== digD(Seq(0.0, 1.0)))
    assert(digD(Seq(1.0, null)) !== digD(Seq(1.0)))
    // length-sensitive
    assert(digD(Seq(1.0)) !== digD(Seq(1.0, 0.0)))
    // distinctness over random corpora (the property semDedup's collapse
    // stands on): 4000 distinct vectors → 4000 distinct digests
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 4000).map(_ => Seq.fill(8)(
      java.lang.Double.valueOf(rnd.nextDouble())))
    assert(vecs.map(digD).distinct.size === vecs.size)
    // long arrays (shingle-hash sets) digest and distinguish too
    val longs = (0 until 2000).map(_ => Seq.fill(6)(rnd.nextLong()))
    assert(longs.map(digL).distinct.size === longs.size)
    // order-sensitive (sets here are sorted arrays; order is content)
    assert(digL(Seq(1L, 2L)) !== digL(Seq(2L, 1L)))
  }
}
