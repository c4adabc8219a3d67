"""logstash_filter_translate_spark — a PySpark-native translate/enrich/route/
aggregate engine with the query semantics of
logstash-plugins/logstash-filter-translate, re-expressed Spark-first.

Public API:
    TranslateConfig, Translate, translate — the core operator
    DictionaryFile, load_dictionary_file  — dictionary sources
    pages / pipeline modules              — the parse→enrich→route→aggregate
                                            north-star pipeline
"""

from .config import TranslateConfig, TranslateConfigError
from .operators.translate import (
    ROUTE_FAILED,
    ROUTE_FALLBACK,
    ROUTE_MATCHED,
    ROUTE_SKIPPED,
    ROUTE_UNMATCHED,
    Translate,
    translate,
    translate_with_table,
)
from .sources.dictionary import (
    DictionaryFile,
    DictionaryLoadError,
    load_dictionary_file,
)

__all__ = [
    "TranslateConfig",
    "TranslateConfigError",
    "Translate",
    "translate",
    "translate_with_table",
    "DictionaryFile",
    "DictionaryLoadError",
    "load_dictionary_file",
    "ROUTE_MATCHED",
    "ROUTE_FALLBACK",
    "ROUTE_UNMATCHED",
    "ROUTE_FAILED",
    "ROUTE_SKIPPED",
]

__version__ = "0.1.0"
