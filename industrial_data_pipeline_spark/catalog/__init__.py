from industrial_data_pipeline_spark.catalog.schemas import (
    ARCHIVE_SCHEMA,
    ATTRIBUTE_SCHEMA,
    ELEMENT_SCHEMA,
)
from industrial_data_pipeline_spark.catalog.store import ParquetStore

__all__ = ["ELEMENT_SCHEMA", "ATTRIBUTE_SCHEMA", "ARCHIVE_SCHEMA", "ParquetStore"]
