"""Import all query modules so their @register calls populate QUERIES."""

from pulsar_io_delta_spark.queries import reference_surface  # noqa: F401
from pulsar_io_delta_spark.queries import relational  # noqa: F401

from pulsar_io_delta_spark.queries import relational2  # noqa: F401
from pulsar_io_delta_spark.queries import relational3  # noqa: F401
from pulsar_io_delta_spark.queries import streaming_queries  # noqa: F401
from pulsar_io_delta_spark.queries import llm  # noqa: F401
from pulsar_io_delta_spark.queries import sql_surface  # noqa: F401
from pulsar_io_delta_spark.queries import extra_surface  # noqa: F401
