"""VPL front-end: parse reference `.vpl` programs into our Stream API.

Covers the query subset exercised by the scenario corpus (stream
declarations, `->` sequence chains with `where`/`as`/`all`, `.within`,
`.not`, `.emit`, plus relational ops `.where/.select/.window/.aggregate/
.partition_by/.having/.distinct/.limit`). Reference grammar:
crates/varpulis-parser (Pest PEG, varpulis.pest); this is an independent
recursive-descent implementation of the same surface.
"""

from varpulis_spark.vpl.parser import parse_program  # noqa: F401
from varpulis_spark.vpl.compiler import run_program  # noqa: F401
