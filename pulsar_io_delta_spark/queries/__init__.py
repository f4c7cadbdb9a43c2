"""Import all query modules so their @register calls populate QUERIES.

Import order IS registration order IS the order the driver samples for
its correctness window, so the blocks least recently hard-verified go
first. Round 1 verified the first 50 registrations (reference_surface +
relational blocks); round 2 rotates the then-unchecked streaming / LLM /
SQL / extra blocks to the front so they land in the checked window,
followed by the surfaces touched by this round's fixes (cdc() rewrite →
reference_surface, asof-join semantics → relational3).
"""

from pulsar_io_delta_spark.queries import streaming_queries  # noqa: F401
from pulsar_io_delta_spark.queries import llm  # noqa: F401
from pulsar_io_delta_spark.queries import sql_surface  # noqa: F401
from pulsar_io_delta_spark.queries import extra_surface  # noqa: F401
from pulsar_io_delta_spark.queries import reference_surface  # noqa: F401
from pulsar_io_delta_spark.queries import relational3  # noqa: F401
from pulsar_io_delta_spark.queries import relational  # noqa: F401
from pulsar_io_delta_spark.queries import relational2  # noqa: F401
from pulsar_io_delta_spark.queries import pipeline_queries  # noqa: F401
