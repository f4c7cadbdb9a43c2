"""pulsar_io_delta_spark — a PySpark-native analytics/ingestion engine.

A ground-up Spark rebuild of the capabilities of the reference connector
``frankxieke/pulsar-io-delta`` (a Delta Lake → Pulsar CDC source,
surveyed in SURVEY.md): Delta-log snapshot + incremental change replay,
CDC envelope derivation, canonical partition-value encoding and
murmur3 routing — plus the full relational / streaming / LLM-pipeline
query surface declared in SURVEY.md §2.3, all expressed with the
DataFrame API so Catalyst/Tungsten own the physical plan.

Nothing here is a translation of the reference's Java; reference
file:line citations in docstrings mark behavioral parity points only.
"""

__version__ = "0.1.0"

from pulsar_io_delta_spark.session import get_spark  # noqa: F401
