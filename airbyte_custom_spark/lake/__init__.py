from airbyte_custom_spark.lake.table import (  # noqa: F401
    LakeTable,
    MergeResult,
    ConcurrentCommitError,
    SchemaEvolutionError,
)
