from similarities_spark.sources.synth import synth_webtext_pandas, synth_webtext_df
from similarities_spark.sources.readers import (
    read_webtext,
    read_documents_as_webtext,
    read_beir,
)

__all__ = [
    "synth_webtext_pandas",
    "synth_webtext_df",
    "read_webtext",
    "read_documents_as_webtext",
    "read_beir",
]
