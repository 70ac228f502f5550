from nlp_data_pipeline_spark.sources.catalog import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_all,
    register_views,
)
