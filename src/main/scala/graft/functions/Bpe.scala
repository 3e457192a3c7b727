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
