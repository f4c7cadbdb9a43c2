"""Import all query modules so their @register calls populate QUERIES."""

from pulsar_io_delta_spark.queries import reference_surface  # noqa: F401
from pulsar_io_delta_spark.queries import relational  # noqa: F401

try:  # populated in later build steps
    from pulsar_io_delta_spark.queries import streaming_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_io_delta_spark.queries import llm  # noqa: F401
except ImportError:
    pass
