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

  /** Quality filter → repetition filter → exact dedup on the
    * whitespace/case-insensitive fingerprint (keep the smallest id) →
    * optional MinHash near-dup removal (keep one representative per
    * cluster) → optional deterministic id-hash sample.
    *
    * Input schema is preserved. `samplePercent = 100` keeps everything;
    * `nearDup = false` skips the clustering stage (the only non-narrow
    * stage besides the fingerprint dedup shuffle). */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.2,
      maxDupWordFrac: Double = 0.3,
      maxTopWordFrac: Double = 0.2,
      maxTopBigramFrac: Double = 0.18,
      nearDup: Boolean = true,
      nearDupThreshold: Double = 0.8,
      samplePercent: Int = 100,
  ): DataFrame = {
    graft.core.Validators.requireColumns(df, Seq(idCol, textCol))
    val filtered = TextOps.repetitionFilter(
      TextOps.qualityFilter(df, textCol, minTokens, maxPunctRatio),
      textCol, maxDupWordFrac, maxTopWordFrac, maxTopBigramFrac)
    // exact dedup on the normalized fingerprint: one hash shuffle, smallest
    // id survives (deterministic)
    val exact = Dedup.exact(
      filtered.withColumn("__fp", TextOps.fingerprint(col(textCol))),
      Seq("__fp"), idCol).drop("__fp")
    val deduped =
      if (nearDup) Dedup.dedupCorpus(exact, idCol, textCol, threshold = nearDupThreshold)
      else exact
    if (samplePercent >= 100) deduped
    else Sampling.hashSample(deduped, idCol, samplePercent)
  }
}
