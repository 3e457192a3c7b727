package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_bpe_encode(text, mergesFlat): byte-pair-encoding tokenization of
  * `text` under a fixed merge table — the engine-portable subword tokenizer
  * behind BPE-budgeted sampling/packing/sharding (graft.ops.Bpe).
  *
  * Semantics (deliberately chosen so ANY engine can replay them with one
  * string REPLACE per merge over a separator encoding — see
  * graft.ops.Bpe.encodedSql):
  *   1. U+001F (the encoding separator) is stripped from the text;
  *   2. the text is split into code-point tokens (spaces are ordinary
  *      tokens, so merge tables without space-containing tokens can never
  *      merge across words);
  *   3. merges apply SEQUENTIALLY in rank order; each merge (a, b) → "ab"
  *      rewrites all left-to-right non-overlapping occurrences of the
  *      adjacent pair in one pass. For merge tables in valid BPE training
  *      order (a merged token is always produced by an earlier rank than
  *      any rank that consumes it) this equals the classic
  *      lowest-rank-present loop of Sennrich et al. 2016 ("Neural Machine
  *      Translation of Rare Words with Subword Units").
  *
  * `mergesFlat` is a foldable array<string> of flattened pairs
  * [a1, b1, a2, b2, …] — the merge table travels as a plan literal, like
  * graft_ivf_cell's centroids; graft.ops.Bpe bounds its size. Per-row cost
  * is O(K) hash probes (a merge whose parts are both absent from the
  * document's current token multiset is skipped without a scan) plus one
  * O(n) scan per merge that might apply. Null text → empty array.
  *
  * The optional third argument `byteLevel` (foldable boolean) switches the
  * initial split from code points to UTF-8 BYTES mapped through the GPT-2
  * byte alphabet ([[BpeBytes.Alphabet]]) — the external-tokenizer mode: one
  * array lookup per byte in the same primitive loop, replacing the
  * hex/regex/HOF Column byte-encode (measured ~1.3 ms/doc) with
  * microseconds. Bit-identical to `gpt2ByteEncode` ∘ the code-point path
  * (every mapped char is one code point; no separator strip — the mapped
  * alphabet cannot contain U+001F). */
case class BpeEncode(
    child: Expression, merges: Expression,
    byteLevel: Option[Expression] = None) extends Expression {

  override def children: Seq[Expression] = Seq(child, merges) ++ byteLevel
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = TilePairs.BpeName

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && merges.foldable &&
      (merges.dataType == ArrayType(StringType, containsNull = false) ||
        merges.dataType == ArrayType(StringType, containsNull = true)) &&
      byteLevel.forall(b => b.foldable && b.dataType == BooleanType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_bpe_encode expects (string, foldable array<string> of flattened " +
          "pairs[, foldable boolean byteLevel])")

  private lazy val mergeList: Array[(String, String)] = {
    val a = merges.eval().asInstanceOf[ArrayData]
    require(a.numElements() % 2 == 0,
      "graft_bpe_encode: merges array must have even length (flattened pairs)")
    Array.tabulate(a.numElements() / 2) { i =>
      val l = a.getUTF8String(2 * i)
      val r = a.getUTF8String(2 * i + 1)
      // the type check admits containsNull=true arrays (typedLit produces
      // them); fail loudly here instead of NPEing mid-eval
      require(l != null && r != null,
        "graft_bpe_encode: merges array must not contain NULL elements")
      (l.toString, r.toString)
    }
  }

  private val empty = new GenericArrayData(Array.empty[Any])

  private lazy val byteMode: Boolean =
    byteLevel.exists(_.eval().asInstanceOf[Boolean])

  def compute(s: UTF8String): ArrayData = {
    if (s == null) return empty
    var toks = new ArrayBuffer[String](16)
    if (byteMode) {
      // GPT-2 byte alphabet: one mapped char per UTF-8 byte (no separator
      // strip — the mapped alphabet cannot contain U+001F)
      val bytes = s.getBytes
      toks.sizeHint(bytes.length)
      var i = 0
      while (i < bytes.length) {
        toks += BpeBytes.Alphabet(bytes(i) & 0xff)
        i += 1
      }
    } else {
      val str = s.toString
      // code-point tokens, stripping the U+001F separator
      toks.sizeHint(str.length)
      var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        val n = Character.charCount(cp)
        if (cp != 0x1f) toks += str.substring(i, i + n)
        i += n
      }
    }
    if (toks.isEmpty) return empty
    // token multiset counts — O(1) "can this merge apply at all?" probe
    var counts = new java.util.HashMap[String, Integer](toks.length * 2)
    toks.foreach(t => counts.merge(t, 1, (x, y) => x + y))
    var m = 0
    while (m < mergeList.length) {
      val (a, b) = mergeList(m)
      val ca = counts.getOrDefault(a, 0).intValue()
      val cb = counts.getOrDefault(b, 0).intValue()
      val possible = if (a == b) ca >= 2 else ca >= 1 && cb >= 1
      if (possible) {
        val out = new ArrayBuffer[String](toks.length)
        var applied = false
        var j = 0
        while (j < toks.length) {
          if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) {
            out += a + b
            applied = true
            j += 2
          } else {
            out += toks(j)
            j += 1
          }
        }
        if (applied) {
          toks = out
          counts = new java.util.HashMap[String, Integer](toks.length * 2)
          toks.foreach(t => counts.merge(t, 1, (x, y) => x + y))
        }
      }
      m += 1
    }
    new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("kernel", this)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $ref.compute(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), merges = newChildren(1),
      byteLevel = newChildren.lift(2))
}

/** graft_sp_unigram(text, pieces, scores): SentencePiece UNIGRAM
  * segmentation (Kudo 2018, "Subword Regularization") — the Viterbi
  * maximum-likelihood split of `text` over a piece vocabulary with
  * log-probability scores. This is the inference path for
  * Unigram-TRAINED models (T5/mT5/Gemma/XLNet families), which carry no
  * merge history and therefore cannot run through [[BpeEncode]].
  *
  * Semantics (engine-portable; graft.ops.Bpe documents the DuckDB
  * recursive-CTE replay):
  *   1. positions are CODE POINTS; `dp[i]` = best score of any
  *      segmentation of the first i code points; `dp[0] = 0`;
  *   2. candidates ending at i: every piece whose surface equals the
  *      text at [i−len, i), scoring `dp[i−len] + score(piece)`, plus an
  *      UNKNOWN edge consuming ONE code point at
  *      `min(scores) − 10.0` (SentencePiece's kUnkPenalty). The unk
  *      edge is unconditional here where SentencePiece inserts it only
  *      when no single-char piece matches — equivalent, because a
  *      matching single-char piece scores ≥ min(scores), which beats
  *      the unk edge STRICTLY, so the extra candidate can never win;
  *   3. ties break toward the LONGER piece — SentencePiece's effective
  *      rule: its lattice compares nodes ending at a position in
  *      insertion order (begin ascending = length DESCENDING, unk last)
  *      with a strict `>`, so the first — longest — equal-scoring node
  *      keeps the backpointer;
  *   4. an unknown code point's token is the code point itself (the
  *      lattice node's surface), so `concat(tokens) == text` exactly.
  *
  * Scores arrive as float64 (the proto's float32 widened — exact);
  * the DP sums in float64, so a replay summing the same dump in
  * float64 is bit-identical. NULL/empty text → empty array. Per-row
  * cost is O(n · maxPieceLen) trie steps, allocation-free until the
  * output copy. `pieces`/`scores` are foldable plan literals
  * (dictionary-sized, the merge-table convention); duplicate surfaces
  * keep the FIRST (lowest-index) score, matching the ops layer's
  * LinkedHashMap convention. */
case class SpUnigramEncode(
    child: Expression, pieces: Expression, scores: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(child, pieces, scores)
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = TilePairs.SpUnigramName

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && pieces.foldable && scores.foldable &&
      (pieces.dataType == ArrayType(StringType, containsNull = false) ||
        pieces.dataType == ArrayType(StringType, containsNull = true)) &&
      (scores.dataType == ArrayType(DoubleType, containsNull = false) ||
        scores.dataType == ArrayType(DoubleType, containsNull = true)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_sp_unigram expects (string, foldable array<string>, " +
          "foldable array<double>)")

  /** Code-point trie node; `score` is NaN for non-terminal nodes. */
  private final class Node {
    var kids: java.util.HashMap[Integer, Node] = null
    var score: Double = Double.NaN
  }

  private lazy val (root: Node, unkScore: Double) = {
    val ps = pieces.eval().asInstanceOf[ArrayData]
    val ss = scores.eval().asInstanceOf[ArrayData]
    require(ps != null && ss != null && ps.numElements() == ss.numElements(),
      "graft_sp_unigram: pieces and scores must be equal-length arrays")
    require(ps.numElements() > 0, "graft_sp_unigram: piece table must be non-empty")
    val r = new Node
    var mn = Double.PositiveInfinity
    var i = 0
    while (i < ps.numElements()) {
      val pu = ps.getUTF8String(i)
      require(pu != null, "graft_sp_unigram: pieces must not contain NULL")
      val p = pu.toString
      require(p.nonEmpty, "graft_sp_unigram: pieces must be non-empty strings")
      // a NULL element would unbox to 0.0 (the best possible log-prob —
      // silently dominating segmentation); ±Inf would make unkScore -Inf
      // and the backtrack's `pos -= bl(pos)` could subtract 0 forever —
      // the never-throw contract must also be a never-HANG contract
      require(!ss.isNullAt(i), "graft_sp_unigram: scores must not contain NULL")
      val sc = ss.getDouble(i)
      require(!sc.isNaN && !sc.isInfinite,
        "graft_sp_unigram: scores must be finite")
      if (sc < mn) mn = sc
      var node = r
      var j = 0
      while (j < p.length) {
        val cp = p.codePointAt(j)
        j += Character.charCount(cp)
        if (node.kids == null) node.kids = new java.util.HashMap[Integer, Node](4)
        var nx = node.kids.get(Integer.valueOf(cp))
        if (nx == null) { nx = new Node; node.kids.put(Integer.valueOf(cp), nx) }
        node = nx
      }
      if (node.score.isNaN) node.score = sc // duplicate surface: first wins
      i += 1
    }
    (r, mn - 10.0)
  }

  private val empty = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String): ArrayData = {
    if (s == null) return empty
    val str = s.toString
    if (str.isEmpty) return empty
    root // force table validation before any DP work
    val m = str.length
    // code-point start offsets (starts(n) = m closes the last token)
    val starts = new Array[Int](m + 1)
    var n = 0
    var i = 0
    while (i < m) { starts(n) = i; i += Character.charCount(str.codePointAt(i)); n += 1 }
    starts(n) = m
    val dp = new Array[Double](n + 1)
    java.util.Arrays.fill(dp, Double.NegativeInfinity)
    dp(0) = 0.0
    val bl = new Array[Int](n + 1) // chosen last-piece length (code points)
    var b = 0
    while (b < n) {
      // every position is reachable (the unk edge chains from dp(0))
      val base = dp(b)
      // unk edge: one code point at the penalty score
      val us = base + unkScore
      if (us > dp(b + 1)) { dp(b + 1) = us; bl(b + 1) = 1 }
      // trie walk from b — relax every piece match; the relaxation keeps
      // the lexicographic (score, length) max, so on equal score the
      // LONGER candidate wins regardless of relaxation order
      var node = root
      var j = b
      var walking = true
      while (walking && j < n && node.kids != null) {
        val nx = node.kids.get(Integer.valueOf(str.codePointAt(starts(j))))
        if (nx == null) walking = false
        else {
          node = nx
          j += 1
          if (!node.score.isNaN) {
            val sc = base + node.score
            val len = j - b
            if (sc > dp(j) || (sc == dp(j) && len > bl(j))) {
              dp(j) = sc; bl(j) = len
            }
          }
        }
      }
      b += 1
    }
    var cnt = 0
    var pos = n
    while (pos > 0) { cnt += 1; pos -= bl(pos) }
    val out = new Array[Any](cnt)
    pos = n
    var k = cnt - 1
    while (pos > 0) {
      val len = bl(pos)
      out(k) = UTF8String.fromString(str.substring(starts(pos - len), starts(pos)))
      k -= 1
      pos -= len
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("kernel", this)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $ref.compute(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pieces = newChildren(1), scores = newChildren(2))
}

/** The GPT-2 byte alphabet (Radford et al. 2019 `bytes_to_unicode`),
  * indexed by byte value: printable latin bytes map to themselves
  * ('!'..'~', '¡'..'¬', '®'..'ÿ'), every other byte to U+0100+n in byte
  * order — space is 'Ġ' (U+0120), newline 'Ċ' (U+010A). Shared by the
  * [[BpeEncode]] byte mode and graft.ops.Bpe's Column-side encode/dump. */
object BpeBytes {
  val Alphabet: Array[String] = {
    val printable =
      ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      val cp = if (printable(b)) b else { val c = 256 + n; n += 1; c }
      new String(Character.toChars(cp))
    }
  }
}
