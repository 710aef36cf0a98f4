from pg2any_spark.sources.fixtures import load_table, load_tables  # noqa: F401
from pg2any_spark.sources.cdc_gen import synth_customer_events  # noqa: F401
