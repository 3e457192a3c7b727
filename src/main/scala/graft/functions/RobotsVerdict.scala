package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_robots_verdict(target, rules): the kind-rank (0 = allow,
  * 1 = disallow) of the FIRST rule in the precedence-sorted `rules`
  * array whose regex matches `target`, or NULL when nothing matches —
  * the hot loop of [[graft.ops.Robots.robotsAllowed]] as a native
  * kernel.
  *
  * Why a kernel: the rule patterns are DATA (one regex per robots
  * line), so the pure-Column formulation evaluates `regexp_like` with a
  * NON-FOLDABLE pattern — Spark only caches compiled regexes for
  * foldable patterns, so every row×rule pays a `Pattern.compile`. At
  * crawl scale (10⁹ URLs × tens of rules per host) that is pure CPU
  * burn on identical host-level patterns. The kernel memoizes compiled
  * patterns per executor in a bounded concurrent map — the working set
  * is the DISTINCT rule strings of the hosts a task touches, which the
  * per-host rule aggregation already made small.
  *
  * Match semantics are exactly Spark's `RLike`: java.util.regex FIND
  * (pattern located anywhere unless the rule anchored itself) — the
  * pure-Column twin and the kernel are bit-parity-tested. Rules with a
  * NULL pattern (parse sentinels) never match. */
case class RobotsVerdict(target: Expression, rules: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(target, rules)
  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = true
  override def prettyName: String = TilePairs.RobotsVerdictName
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = target.dataType.isInstanceOf[StringType] &&
      (rules.dataType match {
        case ArrayType(s: StructType, _) =>
          s.length == 3 && s(1).dataType == IntegerType &&
            s(2).dataType.isInstanceOf[StringType]
        case _ => false
      })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<struct<_, int, string>>)")
  }

  def compute(t: UTF8String, arr: ArrayData): Any = {
    val s = t.toString
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 3)
        if (!row.isNullAt(2)) {
          val pat = row.getUTF8String(2).toString
          val p = RobotsVerdict.compiled(pat)
          if (p.matcher(s).find(0))
            return if (row.isNullAt(1)) null else Integer.valueOf(row.getInt(1))
        }
      }
      i += 1
    }
    null
  }

  override def eval(input: InternalRow): Any = {
    val t = target.eval(input).asInstanceOf[UTF8String]
    if (t == null) return null
    val arr = rules.eval(input).asInstanceOf[ArrayData]
    if (arr == null) null else compute(t, arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tc = target.genCode(ctx)
    val rc = rules.genCode(ctx)
    val ref = ctx.addReferenceObj("kernel", this)
    ev.copy(code = code"""
      ${tc.code}
      ${rc.code}
      Object ${ev.value}_o = null;
      if (!${tc.isNull} && !${rc.isNull})
        ${ev.value}_o = $ref.compute(${tc.value}, ${rc.value});
      boolean ${ev.isNull} = ${ev.value}_o == null;
      int ${ev.value} = ${ev.isNull} ? -1 : ((Integer) ${ev.value}_o).intValue();
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(target = newChildren(0), rules = newChildren(1))
}

object RobotsVerdict {
  /** Per-executor compiled-pattern memo. Bounded by an INSERT-BELOW-CAP
    * rule: once the map is full, new patterns compile per call but the
    * established working set is NEVER evicted — round 12 cleared the whole
    * map at capacity, which near the boundary recompiled every cached
    * pattern under concurrent tasks (cache thrash with zero benefit). The
    * working set (distinct rule strings of the hosts one task touches) is
    * far below the cap, so in practice the map never fills; the cap is a
    * memory backstop, not an eviction policy. COMPILE FAILURES ARE CACHED
    * TOO (as their `PatternSyntaxException`, rethrown on every hit) — the
    * kernel keeps bit-parity with the pure-Column `regexp_like` twin,
    * which throws on a malformed data-derived rule, but no longer pays an
    * uncached recompile per row to do so. */
  private val MaxCachedPatterns = 16384
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private[functions] def compiled(pat: String): java.util.regex.Pattern = {
    cache.get(pat) match {
      case p: java.util.regex.Pattern => return p
      case e: java.util.regex.PatternSyntaxException => throw e
      case _ => ()
    }
    val v: AnyRef =
      try java.util.regex.Pattern.compile(pat)
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          if (cache.size() < MaxCachedPatterns) cache.putIfAbsent(pat, e)
          throw e
      }
    if (cache.size() < MaxCachedPatterns) cache.putIfAbsent(pat, v)
    v.asInstanceOf[java.util.regex.Pattern]
  }
}
