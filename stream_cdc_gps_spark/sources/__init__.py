"""Source readers (JSON/CSV/parquet/rate) with pinned schemas and
corrupt-record routing; Kafka source/sink builders live in
``stream_cdc_gps_spark.streaming.pipeline`` beside the graphs that use them."""
