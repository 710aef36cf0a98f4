from pg2any_spark.sinks.writers import (  # noqa: F401
    jdbc_writer,
    kafka_stream_writer,
    write_parquet_replica,
)
