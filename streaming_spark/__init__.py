"""streaming_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Paradigm4/streaming SciDB plugin.

The reference (/root/reference) is a single-operator process-streaming
plugin: it pipes array chunks through a forked child process over
stdin/stdout (reference README.md:7, 37-43).  This package re-expresses
that capability Spark-first:

- ``stream()`` / ``stream_map()``  — chunked table-in/table-out user code
  over Arrow batches (``mapInPandas``/``mapInArrow``), with the reference's
  map+finalize contract (reference py_pkg/scidbstrm/__init__.py:117-139)
  and optional ``instance_id/chunk_no/value_no`` provenance coordinates
  (reference FeatherInterface.cpp:96-107).
- ``pipe_tsv()`` — the reference's TSV wire protocol to an *external*
  binary (header ``nlines\\n`` + escaped TSV body, ``\\N`` nulls,
  0-terminator handshake; reference TSVInterface.cpp:163-362).
- relational operators (filter/project/group/join/window/sort/...) via the
  DataFrame API — the surface the reference borrows from its host DB
  (SURVEY.md section 2.3).
- Structured Streaming integration (event-time windows, watermarks,
  stateful maps) — the north-star extension the reference lacks.
- large-scale training-data pipeline operators: dedup (exact / MinHash-LSH
  / SimHash / embedding-cosine), ANN similarity search, text analysis,
  multimodal binary columns.
"""

from streaming_spark.session import get_spark
from streaming_spark.io import load_tables, table_path
from streaming_spark.operators.stream import (
    stream,
    stream_arrow,
    stream_map,
    pack_func,
    read_func,
    ensure_parallelism,
)
from streaming_spark.operators.pipe import pipe_tsv, pipe_arrow, parse_tsv_response

__all__ = [
    "get_spark",
    "load_tables",
    "table_path",
    "stream",
    "stream_arrow",
    "stream_map",
    "ensure_parallelism",
    "pack_func",
    "read_func",
    "pipe_tsv",
    "pipe_arrow",
    "parse_tsv_response",
]

__version__ = "0.1.0"
