package graft.core

import org.apache.spark.sql.DataFrame
import graft.errors.FeatureFactoryException._

/** The fit/transform contract (reference: src/pipeline.rs:25-50).
  *
  * `transform` is lazy — it only rewrites the DataFrame's logical plan
  * (Catalyst collapses the stacked projections); `fit` is eager — it runs
  * small aggregate jobs and stores learned parameters on the driver
  * (reference: src/pipeline.rs:23, :117).
  */
trait Transformer extends Serializable {
  def fit(df: DataFrame): this.type
  def transform(df: DataFrame): DataFrame
  def isStateful: Boolean = false
  def fitTransform(df: DataFrame): DataFrame = fit(df).transform(df)
}

/** Base for stateful transformers: tracks the fitted flag and raises
  * FitNotCalled on premature transform (reference: src/transformers/imputation.rs:147-149). */
trait StatefulTransformer extends Transformer {
  @transient protected var fitted: Boolean = false
  override def isStateful: Boolean = true
  protected def requireFitted(): Unit = if (!fitted) throw FitNotCalled()
  /** ModelIO restore hooks: a deserialized transformer carries its learned
    * state, so it must also carry the fitted flag. */
  private[core] def markFitted(): Unit = fitted = true
  private[core] def isFitted: Boolean = fitted
}

/** Sequential (name, transformer) chain (reference: src/pipeline.rs:118-192).
  *
  * `fit` interleaves fit/transform so step i+1 is fitted on the output of
  * step i, and returns the final transformed DataFrame — the whole chain is
  * one logical plan that Catalyst optimizes at the terminal action.
  */
class Pipeline(val steps: Seq[(String, Transformer)], val verbose: Boolean = false)
    extends Serializable {

  private def requireNonEmpty(): Unit =
    if (steps.isEmpty)
      throw InvalidParameter("Pipeline must contain at least one step")

  /** Fit every step in order; returns the fully transformed DataFrame
    * (reference: src/pipeline.rs:135-164). */
  def fit(df: DataFrame): DataFrame = {
    requireNonEmpty()
    steps.foldLeft(df) { case (cur, (name, t)) =>
      val t0 = System.nanoTime()
      // Library errors pass through untouched; anything else (Spark
      // AnalysisException, IO failures) is an ENGINE failure — wrap as the
      // EngineError passthrough variant with the cause chain preserved, the
      // analogue of the reference's DataFusion/IO passthroughs, rather than
      // misclassifying it as a parameter error.
      val out =
        try t.fit(cur).transform(cur)
        catch {
          case e: graft.errors.FeatureFactoryException => throw e
          case e: Exception =>
            throw EngineError(s"Pipeline step '$name' failed: ${e.getMessage}", e)
        }
      Logging.debug(f"fit step '$name' done in ${(System.nanoTime() - t0) / 1e9}%.3fs")
      if (verbose)
        println(f"[pipeline] $name done in ${(System.nanoTime() - t0) / 1e9}%.3fs")
      out
    }
  }

  /** Apply-only chain; stateful steps must be pre-fitted
    * (reference: src/pipeline.rs:167-186, README.md:122-123). */
  def transform(df: DataFrame): DataFrame = {
    requireNonEmpty()
    steps.foldLeft(df) { case (cur, (name, t)) =>
      val t0 = System.nanoTime()
      val out = t.transform(cur)
      Logging.debug(f"transform step '$name' done in ${(System.nanoTime() - t0) / 1e9}%.3fs")
      if (verbose)
        println(f"[pipeline] $name done in ${(System.nanoTime() - t0) / 1e9}%.3fs")
      out
    }
  }

  /** Alias for fit, which already returns the transformed frame
    * (reference: src/pipeline.rs:189-191). */
  def fitTransform(df: DataFrame): DataFrame = fit(df)
}

object Pipeline {
  /** Varargs sugar — analogue of the reference's `make_pipeline!` macro
    * (src/pipeline.rs:208-219). */
  def apply(steps: (String, Transformer)*): Pipeline = new Pipeline(steps)
  def verbose(steps: (String, Transformer)*): Pipeline = new Pipeline(steps, verbose = true)
}
