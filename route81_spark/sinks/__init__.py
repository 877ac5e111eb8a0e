from route81_spark.sinks.classify import classify, ClassifierConfig
from route81_spark.sinks.merge import apply_changes, KeyedParquetTable

__all__ = ["classify", "ClassifierConfig", "apply_changes", "KeyedParquetTable"]
