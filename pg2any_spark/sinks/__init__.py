from pg2any_spark.sinks.sqlite_sink import (  # noqa: F401
    apply_batch_to_sqlite,
    sqlite_batch_applier,
)
from pg2any_spark.sinks.writers import (  # noqa: F401
    jdbc_writer,
    kafka_stream_writer,
    write_parquet_replica,
)
