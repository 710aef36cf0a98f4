from pg2any_spark.operators.apply import apply_changes, typed_from_map  # noqa: F401
