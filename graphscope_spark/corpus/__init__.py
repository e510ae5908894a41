from graphscope_spark.corpus.extractor import (
    extract_file_deps,
    repo_link_edges,
    repo_vertices,
    with_sha256,
)
from graphscope_spark.corpus.generator import synth_corpus

__all__ = [
    "synth_corpus",
    "with_sha256",
    "extract_file_deps",
    "repo_link_edges",
    "repo_vertices",
]
