package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical corpus-curation endpoint: the hygiene chain a
  * training-data pipeline runs before tokenization, composed from the
  * individually-oracled stages (extension beyond the reference surface,
  * SURVEY §2.12).
  *
  * Stage order is deliberate for scale: the narrow per-row filters
  * (quality, repetition) run FIRST so the shuffling stages (exact dedup,
  * near-dup clustering) see the smallest possible corpus; the deterministic
  * sample runs LAST so the sampled corpus is already clean and its rate is
  * measured against kept documents.
  */
object Curation {

  /** Optional Unicode normalization → quality filter → repetition filter →
    * optional corpus-level common-line removal → exact dedup on the
    * whitespace/case-insensitive fingerprint (keep the smallest id) →
    * optional MinHash near-dup removal (keep one representative per
    * cluster) → optional deterministic id-hash sample.
    *
    * Input schema is preserved. Defaults: `normalize = false` (requires
    * GraftExtensions when on), `lineDedupMaxDocFreq = 0` (off; > 0 removes
    * lines appearing in more than that many docs BEFORE fingerprinting, so
    * de-boilerplated duplicates collapse), `samplePercent = 100` keeps
    * everything, `nearDup = false` skips the clustering stage. */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      normalize: Boolean = false,
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.2,
      maxDupWordFrac: Double = 0.3,
      maxTopWordFrac: Double = 0.2,
      maxTopBigramFrac: Double = 0.18,
      lineDedupMaxDocFreq: Long = 0L,
      nearDup: Boolean = true,
      nearDupThreshold: Double = 0.8,
      samplePercent: Int = 100,
  ): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(idCol, textCol))
    val canonical =
      if (normalize)
        TextOps.normalizeText(df, textCol, form = "NFKC", stripAccents = false)
      else df
    val filtered = TextOps.repetitionFilter(
      TextOps.qualityFilter(canonical, textCol, minTokens, maxPunctRatio),
      textCol, maxDupWordFrac, maxTopWordFrac, maxTopBigramFrac)
    val lineClean =
      if (lineDedupMaxDocFreq > 0L)
        TextOps.removeCommonLines(filtered, idCol, textCol,
          maxDocFreq = lineDedupMaxDocFreq)
      else filtered
    // exact dedup on the normalized fingerprint: one hash shuffle, smallest
    // id survives (deterministic)
    val exact = Dedup.exact(
      lineClean.withColumn("__fp", TextOps.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp")
    val deduped =
      if (nearDup) Dedup.dedupCorpus(exact, idCol, textCol, threshold = nearDupThreshold)
      else exact
    if (samplePercent >= 100) deduped
    else Sampling.hashSample(deduped, idCol, samplePercent)
  }
}
