package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the kernel implementations — pure JVM,
  * no Spark session: the kernels must match straightforward reference
  * models on arbitrary inputs (SURVEY §5.3).
  */
object KernelProps extends Properties("Kernels") {

  private val doubleArr: Gen[Array[Double]] =
    Gen.containerOf[Array, Double](Gen.chooseNum(-1e6, 1e6))

  property("dot equals the sequential fold, bit for bit") =
    forAll(doubleArr) { xs =>
      val a = new GenericArrayData(xs)
      val expect = xs.foldLeft(0.0)((acc, v) => acc + v * v)
      java.lang.Double.doubleToLongBits(Kernels.dot(a, a, false, false)) ==
        java.lang.Double.doubleToLongBits(expect)
    }

  property("dot is symmetric") =
    forAll(doubleArr, doubleArr) { (xs, ys) =>
      val n = math.min(xs.length, ys.length)
      val a = new GenericArrayData(xs.take(n))
      val b = new GenericArrayData(ys.take(n))
      java.lang.Double.doubleToLongBits(Kernels.dot(a, b, false, false)) ==
        java.lang.Double.doubleToLongBits(Kernels.dot(b, a, false, false))
    }

  private val P = Kernels.P
  private val hashArr: Gen[Array[Long]] =
    Gen.containerOf[Array, Long](Gen.chooseNum(0L, P - 1))

  /** Reference model: the mod-P chain as written in Dedup.bands. */
  private def modelBands(hs: Array[Long], bands: Int, rows: Int): Seq[Long] =
    (0 until bands).map { j =>
      (0 until rows).foldLeft(1125899907L) { (acc, k) =>
        val i = j * rows + k
        val a = (i.toLong * 2654435761L + 1L) % P
        val b = (i.toLong * 40503L + 7L) % P
        val m = if (hs.isEmpty) P else hs.map(h => (a * h + b) % P).min
        (acc * 31 + m) % P
      }
    }

  property("minhashBands equals the mod-P reference model") =
    forAll(hashArr, Gen.chooseNum(1, 16), Gen.chooseNum(1, 8)) { (hs, bands, rows) =>
      val got = Kernels.minhashBands(new GenericArrayData(hs), bands, rows)
      got.toLongArray().toSeq == modelBands(hs, bands, rows)
    }

  property("minhashBands values stay in [0, P)") =
    forAll(hashArr) { hs =>
      Kernels.minhashBands(new GenericArrayData(hs), 16, 4)
        .toLongArray().forall(v => v >= 0 && v < P)
    }

  property("permuting the shingle hashes never changes the bands (set semantics)") =
    forAll(hashArr) { hs =>
      val shuffled = scala.util.Random.shuffle(hs.toSeq).toArray
      Kernels.minhashBands(new GenericArrayData(hs), 8, 8).toLongArray().toSeq ==
        Kernels.minhashBands(new GenericArrayData(shuffled), 8, 8).toLongArray().toSeq
    }

  // Mixed ASCII / multi-byte text: the packed winnow kernel has an
  // ASCII byte-slice fast path and a codepoint slow path — the
  // bijection with the string kernel must hold on BOTH, for arbitrary
  // k/w and text lengths (incl. shorter-than-k and shorter-than-w).
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ü', 'ß', '中', '☃')))
  } yield cs.mkString

  property("winnowPacked is the hex bijection of winnow for arbitrary text, k, w") =
    forAll(textGen, Gen.chooseNum(1, 10), Gen.chooseNum(1, 6)) { (text, k, w) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val packed = Kernels.winnowPacked(u, k, w).toLongArray()
        .map(v => f"$v%08x").toSeq
      val str = {
        val arr = Kernels.winnow(u, k, w)
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      }
      packed == str
    }

  property("winnowPacked values are unsigned 32-bit") =
    forAll(textGen) { text =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      Kernels.winnowPacked(u, 4, 3).toLongArray()
        .forall(v => v >= 0L && v <= 0xffffffffL)
    }

  // --- BPE encode ---

  private val bpeWordGen: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
  private val bpeTextGen: Gen[String] =
    Gen.listOf(bpeWordGen).map(_.mkString(" "))
  private val mergeGen: Gen[Array[String]] = Gen.listOf(for {
    a <- Gen.oneOf("a", "b", "c", "d", "ab", "cd", "abc")
    b <- Gen.oneOf("a", "b", "c", "d", "ab", "cd")
  } yield s"$a $b").map(_.distinct.toArray)

  private def encode(text: String, merges: Array[String]): Seq[String] = {
    val arr = Kernels.bpeEncode(
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      new BpeTable(merges))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("bpeEncode reconstruction: concat of tokens == text minus spaces, any merge table") =
    forAll(bpeTextGen, mergeGen) { (text, merges) =>
      encode(text, merges).mkString == text.replace(" ", "")
    }

  property("bpeEncode with an empty merge table is the per-character split") =
    forAll(bpeTextGen) { text =>
      encode(text, Array.empty) ==
        text.split(" ", -1).toSeq.flatMap(_.map(_.toString))
    }

  property("bpeEncode emits no token outside the closure of chars and merged pairs") =
    forAll(bpeTextGen, mergeGen) { (text, merges) =>
      val legal = Set("a", "b", "c", "d") ++ merges.map(_.split(" ", 2).mkString)
      encode(text, merges).forall(legal.contains)
    }

  // --- NFC ---

  private val unicodeGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString), Gen.const("é"),
    Gen.const("é"), Gen.const("가"),
    Gen.const("가"), Gen.const(" "))).map(_.mkString)

  property("nfc is idempotent and matches java.text.Normalizer") =
    forAll(unicodeGen) { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val once = Kernels.nfc(u).toString
      Kernels.nfc(
        org.apache.spark.unsafe.types.UTF8String.fromString(once)).toString == once &&
        once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  // --- PQ encode ---

  private val pqCase: Gen[(Array[Double], Array[Array[Array[Float]]], Boolean)] =
    for {
      m <- Gen.chooseNum(1, 4)
      sub <- Gen.chooseNum(1, 4)
      k <- Gen.chooseNum(2, 6)
      vec <- Gen.containerOfN[Array, Double](m * sub, Gen.chooseNum(-100.0, 100.0))
      books <- Gen.containerOfN[Array, Array[Array[Float]]](m,
        Gen.containerOfN[Array, Array[Float]](k,
          Gen.containerOfN[Array, Float](sub,
            Gen.chooseNum(-100.0f, 100.0f))))
      norm <- Gen.oneOf(true, false)
    } yield (vec, books, norm)

  /** Reference model: sequential-order norm, unit divide (zero norm →
    * zeros), sequential squared-L2, first-min argmin, 8-bit pack. */
  private def modelPq(vec: Array[Double], books: Array[Array[Array[Float]]],
                      normalize: Boolean): Long = {
    val norm = math.sqrt(vec.foldLeft(0.0)((a, v) => a + v * v))
    val u =
      if (!normalize) vec
      else if (norm == 0.0) vec.map(_ => 0.0)
      else vec.map(_ / norm)
    val sub = books(0)(0).length
    books.zipWithIndex.map { case (book, j) =>
      val dists = book.map { cent =>
        (0 until sub).foldLeft(0.0) { (acc, i) =>
          val diff = u(j * sub + i) - cent(i).toDouble
          acc + diff * diff
        }
      }
      val best = dists.indices.minBy(dists(_)) // first min wins
      best.toLong << (8 * j)
    }.sum
  }

  private def tableOf(books: Array[Array[Array[Float]]]): PqBooksTable = {
    val m = books.length; val k = books(0).length; val sub = books(0)(0).length
    val flat = new Array[Double](m * k * sub)
    for (j <- 0 until m; c <- 0 until k; i <- 0 until sub)
      flat((j * k + c) * sub + i) = books(j)(c)(i).toDouble
    new PqBooksTable(flat, m, k, sub)
  }

  property("pqEncode equals the normalize→argmin→pack reference model") =
    forAll(pqCase) { case (vec, books, norm) =>
      val got = Kernels.pqEncode(new GenericArrayData(vec), tableOf(books),
        Kernels.TDouble, norm)
      got != null && got.longValue() == modelPq(vec, books, norm)
    }

  property("pqEncode is null on a short vector, and ignores extra trailing dims for codes") =
    forAll(pqCase) { case (vec, books, norm) =>
      val short = Kernels.pqEncode(
        new GenericArrayData(vec.dropRight(1)), tableOf(books),
        Kernels.TDouble, norm)
      // Extra dims feed the norm but not the distances: with
      // normalize=false the packed code must not change.
      val longer = Kernels.pqEncode(
        new GenericArrayData(vec ++ Array(7.5)), tableOf(books),
        Kernels.TDouble, normalize = false)
      short == null &&
        longer != null &&
        longer.longValue() == modelPq(vec, books, normalize = false)
    }

  /** ivfCosScores reference model — the EXPRESSION's semantics
    * verbatim: null for non-members and dims mismatch, Spark's
    * non-ANSI Divide rule (zero divisor → null, never Java 0/0 = NaN),
    * sequential-fold dots. Vectors may be ZERO (the r18 degenerate
    * channel) and qdiv may be 0 (a zero-norm query). */
  private val ivfCase: Gen[(Array[Double], Int, Array[Double],
      Array[Double], Array[Boolean], Boolean)] =
    for {
      d <- Gen.chooseNum(1, 6)
      nQ <- Gen.chooseNum(1, 3)
      kCells <- Gen.chooseNum(1, 4)
      cell <- Gen.chooseNum(-1, 4) // may be out of range
      zero <- Gen.oneOf(true, false)
      vec <- if (zero) Gen.const(Array.fill(d)(0.0))
        else Gen.containerOfN[Array, Double](d, Gen.chooseNum(-10.0, 10.0))
      zn <- Gen.oneOf(true, false)
      q <- Gen.containerOfN[Array, Double](nQ * d, Gen.chooseNum(-10.0, 10.0))
      qdiv <- Gen.containerOfN[Array, Double](nQ,
        Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.1, 10.0)))
      member <- Gen.containerOfN[Array, Boolean](nQ * kCells,
        Gen.oneOf(true, false))
    } yield (vec, cell, q, qdiv, member, zn)

  property("ivfCosScores equals the expression model incl. zero-norm rows and zero-divisor nulls") =
    forAll(ivfCase) { case (vec, cell, q, qdiv, member, zeroNull) =>
      val d = vec.length
      val nQ = qdiv.length
      val kCells = member.length / nQ
      val t = new IvfCosTable(q, qdiv, member, nQ, d, kCells, zeroNull)
      val got = Kernels.ivfCosScores(new GenericArrayData(vec),
        Kernels.TDouble, cell, t)
      val aa = vec.foldLeft(0.0)((acc, x) => acc + x * x)
      (0 until nQ).forall { qq =>
        val expect: Any =
          if (zeroNull && aa == 0.0) null
          else if (cell < 0 || cell >= kCells || !member(qq * kCells + cell))
            null
          else {
            val ab = (0 until d).foldLeft(0.0)((acc, j) =>
              acc + vec(j) * q(qq * d + j))
            val den = math.sqrt(aa) * qdiv(qq)
            if (den == 0.0) null else (ab / den): java.lang.Double
          }
        val g = got.get(qq, org.apache.spark.sql.types.DoubleType)
        (g == null && expect == null) || (g != null && expect != null &&
          java.lang.Double.doubleToLongBits(g.asInstanceOf[Double]) ==
            java.lang.Double.doubleToLongBits(
              expect.asInstanceOf[java.lang.Double].doubleValue()))
      }
    }

  // --- header decoders (imageDims / wavMeta): the null-not-throw
  // doctrine fuzzed — crawler byte soup must CLASSIFY, never crash ---

  private val byteSoup: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))
  // Soup biased to start like a real container, so the fuzz spends its
  // budget INSIDE the parsers (marker scans, chunk walks, truncation
  // edges) instead of bouncing off the signature checks.
  private def sigBytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private val signedSoup: Gen[Array[Byte]] = for {
    sig <- Gen.oneOf(
      sigBytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      sigBytes(0xff, 0xd8),
      sigBytes('G', 'I', 'F', '8', '9', 'a'),
      sigBytes('B', 'M'),
      sigBytes('R', 'I', 'F', 'F', 0x24, 0, 0, 0, 'W', 'A', 'V', 'E'))
    tail <- byteSoup
  } yield sig ++ tail

  property("imageDims never throws and any decode has a known format and positive dims") =
    forAll(Gen.oneOf(byteSoup, signedSoup)) { bs =>
      Kernels.imageDims(bs) match {
        case null => true
        case r =>
          Set("png", "jpeg", "gif", "bmp")(r.getUTF8String(0).toString) &&
            r.getInt(1) > 0 && r.getInt(2) > 0
      }
    }

  property("wavMeta never throws and any decode has positive PCM fields") =
    forAll(Gen.oneOf(byteSoup, signedSoup)) { bs =>
      Kernels.wavMeta(bs) match {
        case null => true
        case r => r.getUTF8String(0).toString == "wav" &&
          r.getInt(1) > 0 && r.getInt(2) > 0 && r.getInt(3) > 0
      }
    }

  // --- unigram encode ---

  private val pieceGen: Gen[Array[String]] = Gen.listOf(for {
    p <- Gen.oneOf("a", "b", "c", "d", "ab", "bc", "cd", "abc", "abcd")
    bits <- Gen.chooseNum(0L, 30L)
  } yield s"$p\t$bits").map(_.groupBy(_.split("\t")(0)).values
    .map(_.head).toArray)

  private def uniEncode(text: String, pieces: Array[String]): Seq[String] = {
    val arr = Kernels.unigramEncode(
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      new UnigramTable(if (pieces.isEmpty) Array("a\t1") else pieces))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("unigramEncode reconstruction: concat of pieces == text minus spaces, any inventory") =
    forAll(bpeTextGen, pieceGen) { (text, pieces) =>
      uniEncode(text, pieces).mkString == text.replace(" ", "")
    }

  property("unigramEncode pieces are inventory members or single OOV codepoints") =
    forAll(bpeTextGen, pieceGen) { (text, pieces) =>
      val inv = pieces.map(_.split("\t")(0)).toSet + "a"
      uniEncode(text, pieces).forall(p => inv(p) || p.length == 1)
    }

  property("unigramSegment is optimal: no split of any piece into inventory halves is cheaper") =
    forAll(bpeTextGen, pieceGen) { (text, pieces) =>
      // Cost of the chosen segmentation must be <= the all-singles
      // baseline cost (both computable from the same table).
      val table = new UnigramTable(
        if (pieces.isEmpty) Array("a\t1") else pieces)
      def bits(p: String): Long = {
        val c = table.cost.get(p)
        if (c != null) c.longValue()
        else if (p.length == 1) Kernels.UnigramOovBits
        else Long.MaxValue / 4
      }
      text.split(" ", -1).forall { w =>
        val chosen = Kernels.unigramSegment(w, table).map(bits).sum
        val singles = w.map(ch => bits(ch.toString)).sum
        chosen <= singles
      }
    }

  // --- tokenizer-apply kernels: O(word²) bound removed (r21) ---

  /** The pre-r21 naive BPE merge loop, kept as the reference model:
    * rescan all adjacent pairs for the global min rank, merge ALL its
    * occurrences left-to-right in one pass, repeat. The heap/linked-
    * list kernel must match it token-for-token on ARBITRARY merge
    * tables (including ones no trainer would emit, where a created
    * pair outranks a pending one — the same-rank drain's job). */
  private def bpeReference(text: String, table: BpeTable): Seq[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    for (word <- text.split(" ", -1)) {
      var symbols = {
        val buf = new scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < word.length) {
          val n = Character.charCount(word.codePointAt(i))
          buf += word.substring(i, i + n)
          i += n
        }
        buf
      }
      var done = symbols.length < 2
      while (!done) {
        var best = -1
        var bestRank = Int.MaxValue
        for (i <- 0 until symbols.length - 1) {
          val r = table.rank.get(symbols(i) + " " + symbols(i + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); best = i
          }
        }
        if (best < 0) done = true
        else {
          val a = symbols(best); val b = symbols(best + 1)
          val merged = new scala.collection.mutable.ArrayBuffer[String]()
          var j = 0
          while (j < symbols.length) {
            if (j < symbols.length - 1 && symbols(j) == a &&
                symbols(j + 1) == b) { merged += (a + b); j += 2 }
            else { merged += symbols(j); j += 1 }
          }
          symbols = merged
          done = symbols.length < 2
        }
      }
      out ++= symbols
    }
    out.toSeq
  }

  property("bpeEncode (heap merge) equals the naive rescan reference, any merge table") =
    forAll(bpeTextGen, mergeGen) { (text, merges) =>
      encode(text, merges) == bpeReference(text, new BpeTable(merges))
    }

  /** The compute-side twin of the decode fuzz (VERDICT r20 #1): a
    * 1 M-char SPACELESS word — the whole-document "word" a CJK page,
    * minified JS bundle, or base64 run produces — must tokenize in
    * bounded time through both apply kernels. The pre-fix loops cost
    * ~5×10¹¹ iterations here (hours in one task); the bounded kernels
    * are O(word × maxLen) / O(word log word) and finish in well under
    * a second each. 20 s is a >100× cushion for CI noise while still
    * two orders of magnitude below the unbounded cost. */
  property("degenerate 1M-char spaceless word tokenizes in bounded time") = {
    val word = "abcd" * 250000
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(word)
    // Doubling merge chain so BPE does real work (n-1 total merges).
    val merges = Array("a b", "c d", "ab cd") ++
      (0 until 16).map(i => ("abcd" * (1 << i)) + " " + ("abcd" * (1 << i)))
    val t0 = System.nanoTime()
    val bpe = Kernels.bpeEncode(u, new BpeTable(merges))
    val tBpe = (System.nanoTime() - t0) / 1e9
    val pieces = Array("a\t3", "b\t3", "c\t3", "d\t3", "ab\t4", "cd\t4",
      "abcd\t5", "dabc\t5", "bcda\t5", "cdab\t5")
    val t1 = System.nanoTime()
    val uni = Kernels.unigramEncode(u, new UnigramTable(pieces))
    val tUni = (System.nanoTime() - t1) / 1e9
    // Sanity on the outputs, so a fast-but-wrong path can't pass.
    val bpeLen = (0 until bpe.numElements())
      .map(i => bpe.getUTF8String(i).numChars()).sum
    val uniLen = (0 until uni.numElements())
      .map(i => uni.getUTF8String(i).numChars()).sum
    Prop.propBoolean(bpeLen == word.length && uniLen == word.length &&
      tBpe < 20.0 && tUni < 20.0) :| f"bpe=$tBpe%.2fs uni=$tUni%.2fs"
  }
}
