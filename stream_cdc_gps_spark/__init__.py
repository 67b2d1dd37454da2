"""stream_cdc_gps_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference streaming CDC/GPS pipeline (``sms7182/stream-cdc-gps``), re-expressed
Spark-first:

- batch relational analytics on the landed tables (DataFrame / Spark SQL,
  optimized by Catalyst + AQE),
- the reference's streaming semantics (GPS JSON ingest -> flatten ->
  Kafka-Connect envelope -> Debezium CDC decode -> geospatial landing) as
  Structured Streaming graphs built from pure DataFrame->DataFrame functions,
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column convention) designed for 100 TB scale.

Nothing here is a port: the reference (240 lines of Go, see SURVEY.md) tells
us WHAT to compute; the HOW is idiomatic PySpark.
"""

__version__ = "0.1.0"

from stream_cdc_gps_spark.session import get_spark  # noqa: F401
from stream_cdc_gps_spark.tables import load_table, register_views  # noqa: F401
