from m5_competition_kaggle_spark.sources.catalog import (  # noqa: F401
    SCHEMAS,
    TABLES,
    load_table,
    register_views,
)
