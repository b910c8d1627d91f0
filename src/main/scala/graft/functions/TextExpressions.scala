package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the shingling hot path.
  *
  * The SQL formulation (`transform(sequence(1, L-n+1), p ->
  * substring(text, p, n))`) calls `substring` once per position, and
  * UTF8String's substring walks codepoints from byte 0 on every call
  * — O(L²) per document. A 100 kB document is 10¹⁰ byte steps in one
  * task; even the 300-char corpus here spent ~2 s/pass on it. This
  * expression walks the string ONCE, records codepoint boundaries,
  * and emits every n-gram as a byte-range slice — O(L + k·n), with
  * optional in-row dedup (a LinkedHashSet) so SET semantics cost no
  * corpus-wide `distinct` exchange at all.
  *
  * Short-document semantics match the SQL version exactly: a
  * document with fewer than `n` codepoints yields ONE shingle — the
  * whole document (`substring(text, 1, n)` of a short string).
  */
case class NgramShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(n > 0, "shingle width must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    NgramShingles.compute(a.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.NgramShingles.compute($a, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_ngram_shingles"
}

object NgramShingles {

  /** Static entry for generated code: one pass, byte-range slices. */
  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // codepoint start offsets (+ end sentinel)
    val off = new Array[Int](len + 1)
    var i = 0
    var m = 0
    while (i < len) {
      off(m) = i
      m += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    off(m) = len
    val k = m - n + 1
    if (k <= 0) return new GenericArrayData(Array[Any](s))
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](k * 2)
      var j = 0
      while (j < k) {
        seen.add(UTF8String.fromBytes(bytes, off(j), off(j + n) - off(j)))
        j += 1
      }
      new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
    } else {
      val arr = new Array[Any](k)
      var j = 0
      while (j < k) {
        arr(j) = UTF8String.fromBytes(bytes, off(j), off(j + n) - off(j))
        j += 1
      }
      new GenericArrayData(arr)
    }
  }

  /** Column API: array of n-gram shingles (all occurrences). */
  def ngramShingles(text: Column, n: Int): Column =
    ColumnBridge.column(NgramShingles(ColumnBridge.expression(text), n, distinct = false))

  /** Column API: array of DISTINCT n-gram shingles, first-occurrence
    * order — per-row set semantics, no shuffle.
    */
  def ngramShingleSet(text: Column, n: Int): Column =
    ColumnBridge.column(NgramShingles(ColumnBridge.expression(text), n, distinct = true))
}

/** Per-row MinHash signature over a shingle array — the whole
  * signature in ONE projection.
  *
  * The SQL formulation (explode shingles → groupBy(id) with k
  * `min(pmod(base·aᵢ+bᵢ, P))` aggregates) shuffles every
  * (id, shingle) occurrence through an exchange just to take k
  * mins that are computable row-locally. This expression folds the
  * k affine permutations over the shingle array in a tight loop:
  * zero shuffle for signatures at any corpus size, and the min over
  * DISTINCT shingles equals the min over occurrences, so outputs are
  * bit-identical to the aggregate form (spec-pinned).
  *
  * Hash chain replicates Spark's `xxhash64(shingle)` (XXH64, seed
  * 42) then the same affine family `(base·aᵢ+bᵢ) mod (2³¹−1)` the
  * aggregate form uses — P = 2³¹−1 keeps `base·aᵢ+bᵢ < 2⁶²`,
  * overflow-free in a long.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, "signature width must be positive")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    MinHashSignature.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.MinHashSignature.compute($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_signature"
}

object MinHashSignature {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  val MersennePrime: Long = 2147483647L // 2^31-1

  /** The affine-permutation table (aᵢ, bᵢ) — splitmix64-seeded, the
    * SAME chain the aggregate formulation used, so signatures are
    * reproducible across both forms.
    */
  def perm(i: Int): (Long, Long) = {
    var z = (i + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val a = math.abs(z ^ (z >>> 31)) % (MersennePrime - 1) + 1
    val b = math.abs(z * 31) % MersennePrime
    (a, b)
  }

  // per-k permutation tables, built once per JVM
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def tablesFor(k: Int): (Array[Long], Array[Long]) =
    tables.computeIfAbsent(k, { kk =>
      val ps = (0 until kk).map(perm)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** Static entry for generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val (as, bs) = tablesFor(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      // null elements carry no shingle — skip, as the explode form
      // would have dropped them from the distinct set
      if (s != null) {
        // Spark's xxhash64(string) = XXH64 over the UTF-8 bytes, seed 42
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val base = java.lang.Math.floorMod(h, MersennePrime)
        var i = 0
        while (i < k) {
          val v = java.lang.Math.floorMod(base * as(i) + bs(i), MersennePrime)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: k-wide MinHash signature of a shingle array. */
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), k))
}

/** Per-row 64-bit SimHash over a token array — the whole fingerprint
  * in ONE projection.
  *
  * The aggregate formulation exploded every (id, token) occurrence
  * through a corpus-wide exchange and needed 21-bit packed counters
  * (3 per long, 22 aggregate columns) to stay codegen-friendly —
  * which capped documents at 2²¹ tokens. Folding the votes row-
  * locally removes the shuffle AND the bound: plain int counters
  * handle any document Spark can hold in a row. Semantics identical:
  * token hash = Spark's `xxhash64` (XXH64, seed 42), bit j set ⟺
  * 2·ones_j > n over the token MULTISET.
  */
case class SimHashFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any): Any =
    SimHashFingerprint.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SimHashFingerprint.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHashFingerprint =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashFingerprint {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Static entry for generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    var voters = 0L // non-null tokens actually voting
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        voters += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (2L * counts(b) > voters) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Column API: 64-bit SimHash of a token array. */
  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHashFingerprint(ColumnBridge.expression(tokens)))
}

/** Position-wise agreement count of two MinHash signatures — the
  * candidate-pair Jaccard ESTIMATE numerator in one tight loop.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, (x,y) ->
  * if(x=y,1,0)), 0, +)`) evaluates two lambdas per signature slot in
  * interpreted mode; at LSH-candidate scale (hundreds of thousands
  * of pairs × k slots) that interpreter dispatch dominated the whole
  * estimate stage. Semantics are identical, including the padding
  * edge: `zip_with` pads the shorter array with nulls and
  * `when(x === y, 1).otherwise(0)` reads a null comparison as 0, so
  * unequal-length (or null-element) slots count 0 here too.
  */
case class SigAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(
    ArrayType(org.apache.spark.sql.types.LongType),
    ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SigAgreement.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigAgreement.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sig_agreement"
}

object SigAgreement {

  /** Static entry for generated code: slots where both sides are
    * present and equal; padded/null slots contribute 0 exactly like
    * the zip_with form.
    */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  /** Column API: number of agreeing signature slots. */
  def sigAgreement(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreement(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** One-pass token / punctuation / per-language stopword profile — the
  * counts behind `tokenCount`, `punctCount`, `stopwordCount` and
  * `langId` in a single scan of the string.
  *
  * The regexp formulation ran up to 10 NFA passes per document (5
  * stopword alternations for langId, each also referenced by the
  * max-comparison chain). This expression lowercases once
  * (`UTF8String.toLowerCase` — the identical function Spark's
  * `lower` uses) and walks the bytes once. Count semantics replicate
  * `regexp_count` with Java's default (ASCII `\\w`) classes exactly:
  *   - `n_tokens` = maximal `[a-z0-9]+` runs of the lowered text
  *     (underscore and any non-ASCII byte are separators);
  *   - `punct` = occurrences of `[.,;:!?]` in the RAW text (ASCII
  *     bytes never occur inside UTF-8 multi-byte sequences, so a
  *     byte count IS the char count);
  *   - `stops[i]` = matches of `\\b(w1|...|wk)\\b` for language i over
  *     the lowered text: a match is exactly a maximal word-char run
  *     equal to one of the stopwords, where the boundary's word
  *     class is Java's — `'_'` or ANY Unicode letter/digit (the
  *     known `\\b`-vs-ASCII-`\\w` asymmetry of java.util.regex).
  * TextFunctionsSpec pins equivalence against the regexp forms over
  * the real corpus plus adversarial underscore/unicode/case edges.
  */
case class TextProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = TextProfile.outType

  override def nullSafeEval(a: Any): Any =
    TextProfile.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextProfile.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): TextProfile =
    copy(child = newChild)

  override def prettyName: String = "graft_text_profile"
}

object TextProfile {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.IntegerType

  /** Language order is the langId chain's order — fixed API. */
  val orderedLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  val stopwordTable: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "es" -> Seq("el", "los", "las", "y", "que", "una"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "zai"))

  val outType: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("stops", ArrayType(IntegerType, containsNull = false))))

  // word → bitmask of languages containing it (bit i = orderedLangs(i))
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    orderedLangs.zipWithIndex.foreach { case (lang, i) =>
      stopwordTable(lang).foreach { w =>
        val prev = m.get(w)
        m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }
  private val maxStopLen = wordMask.keySet().toArray.map(_.toString.length).max

  private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' => true
    case _ => false
  }

  /** Static entry for generated code. One pass over code points.
    * Java's `\\b` quirk is mirrored deliberately: the boundary node
    * treats `'_' || Character.isLetterOrDigit(cp)` as word chars
    * (UNICODE letters and digits!) even while `\\w` and the token
    * class stay ASCII — so `éthe` has NO boundary before the `t`
    * and never matches the stopword `the`, exactly like
    * `regexp_count`.
    */
  def compute(s: UTF8String): InternalRow = {
    val raw = s.toString
    var punct = 0
    var i = 0
    while (i < raw.length) {
      if (isPunct(raw.charAt(i))) punct += 1
      i += 1
    }
    val low = s.toLowerCase.toString
    val stops = new Array[Int](orderedLangs.length)
    var tokens = 0
    var inTok = false
    var runStart = -1
    i = 0
    while (i <= low.length) {
      val cp = if (i < low.length) low.codePointAt(i) else -1
      val step = if (cp < 0) 1 else Character.charCount(cp)
      val isTok = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (isTok && !inTok) { tokens += 1; inTok = true }
      else if (!isTok) inTok = false
      val isW = cp >= 0 && (cp == '_' || Character.isLetterOrDigit(cp))
      if (isW) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        if (i - runStart <= maxStopLen) {
          val mask = wordMask.get(low.substring(runStart, i))
          if (mask != null) {
            var l = 0
            val mv = mask.intValue()
            while (l < stops.length) {
              if ((mv & (1 << l)) != 0) stops(l) += 1
              l += 1
            }
          }
        }
        runStart = -1
      }
      i += step
    }
    InternalRow(tokens, punct,
      new GenericArrayData(stops.map(x => x: Any)))
  }

  /** Column API: struct(n_tokens, punct, stops[lang-ordinal]). */
  def profile(text: Column): Column =
    ColumnBridge.column(TextProfile(ColumnBridge.expression(text)))
}
