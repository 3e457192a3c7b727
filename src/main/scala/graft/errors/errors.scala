package graft.errors

/** Error ADT mirroring the reference's `FeatureFactoryError` enum
  * (reference: src/exceptions.rs:25-61, 9 variants). Engine-specific
  * passthrough variants (DataFusion/Arrow/IO) map onto Spark analogues.
  */
sealed abstract class FeatureFactoryException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

object FeatureFactoryException {
  /** A hyperparameter or argument is invalid (src/exceptions.rs: InvalidParameter). */
  final case class InvalidParameter(msg: String) extends FeatureFactoryException(msg)

  /** A required input column is absent or has the wrong type (MissingColumn). */
  final case class MissingColumn(msg: String) extends FeatureFactoryException(msg)

  /** A stateful transformer was used before `fit` (FitNotCalled). */
  final case class FitNotCalled()
      extends FeatureFactoryException("fit must be called before transform")

  /** Requested behavior is intentionally unimplemented (NotImplemented). */
  final case class NotImplemented(msg: String) extends FeatureFactoryException(msg)

  /** Unsupported file format / source (UnsupportedFormat). */
  final case class UnsupportedFormat(msg: String) extends FeatureFactoryException(msg)

  /** Passthrough for engine (Spark) failures — analogue of the reference's
    * DataFusionError/ArrowError passthrough variants. */
  final case class EngineError(msg: String, cause: Throwable)
      extends FeatureFactoryException(msg, cause)

  /** Passthrough for IO failures (IoError). */
  final case class IoError(msg: String, cause: Throwable)
      extends FeatureFactoryException(msg, cause)
}
