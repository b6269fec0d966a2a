from qms_datawarehouse_spark.sources.bucketed import (
    colocated_join,
    write_bucketed_table,
)
from qms_datawarehouse_spark.sources.fileskip import (
    build_file_manifest,
    prune_files,
    read_pruned,
)
from qms_datawarehouse_spark.sources.pyds import register_docstore
from qms_datawarehouse_spark.sources.readers import (
    detect_json_format,
    load_fixture,
    load_fixtures,
    read_documents,
    read_json_auto,
)

__all__ = [
    "build_file_manifest",
    "prune_files",
    "read_pruned",
    "colocated_join",
    "write_bucketed_table",
    "detect_json_format",
    "load_fixture",
    "load_fixtures",
    "read_documents",
    "read_json_auto",
    "register_docstore",
]
