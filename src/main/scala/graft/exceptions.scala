package graft

/** Error taxonomy mirroring the reference's custom exceptions
  * (reference: rdsa_utils/exceptions.py:9-48). Same seven names so
  * pipeline code and tests can assert on the type.
  */
class ColumnNotInDataframeError(msg: String) extends RuntimeException(msg)
class ConfigError(msg: String) extends RuntimeException(msg)
class DataframeEmptyError(msg: String) extends RuntimeException(msg)
class PipelineError(msg: String) extends RuntimeException(msg)
class TableNotFoundError(msg: String) extends RuntimeException(msg)
class InvalidBucketNameError(msg: String) extends RuntimeException(msg)
class InvalidS3FilePathError(msg: String) extends RuntimeException(msg)
