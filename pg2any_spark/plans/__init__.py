from pg2any_spark.plans import queries  # noqa: F401
