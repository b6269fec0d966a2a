from qms_datawarehouse_spark.sources.pyds import register_docstore
from qms_datawarehouse_spark.sources.readers import (
    detect_json_format,
    load_fixture,
    load_fixtures,
    read_documents,
    read_json_auto,
)

__all__ = [
    "detect_json_format",
    "load_fixture",
    "load_fixtures",
    "read_documents",
    "read_json_auto",
    "register_docstore",
]
