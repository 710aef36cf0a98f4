from pg2any_spark.functions.dialects import (  # noqa: F401
    DIALECTS,
    AnsiDialect,
    KafkaDialect,
    MySqlDialect,
    SqliteDialect,
    SqlServerDialect,
)
from pg2any_spark.functions.envelope import to_debezium  # noqa: F401
