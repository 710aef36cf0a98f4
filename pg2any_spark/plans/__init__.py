from pg2any_spark.plans import queries  # noqa: F401
from pg2any_spark.plans import queries_canary  # noqa: F401  (fills the registry)
from pg2any_spark.plans import queries_ml  # noqa: F401  (fills the registry)
from pg2any_spark.plans import queries_rel2  # noqa: F401  (fills the registry)
from pg2any_spark.plans import queries_retrieval  # noqa: F401  (fills the registry)
from pg2any_spark.plans import queries_temporal  # noqa: F401  (fills the registry)
from pg2any_spark.plans import queries_tpch3  # noqa: F401  (fills the registry)
