from spark_stream_kudu_spark.sources.tables import (  # noqa: F401
    SCHEMAS,
    TABLE_NAMES,
    load_table,
    register_views,
)
