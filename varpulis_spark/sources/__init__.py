"""Sources: connector-analog readers (SURVEY §2.1).

Batch tables load via engine.read_parquet / engine.load_table; streaming
sources live in varpulis_spark.streaming (timer/file/kafka). This package
holds replay/test sources, starting with the `.evt` event-file format.
"""

from varpulis_spark.sources.event_file import load_evt  # noqa: F401
