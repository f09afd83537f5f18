from .features import (  # noqa: F401
    FEATURES_CTE,
    POLYGONS_CTE,
    features_df,
    polygons_df,
    load_table,
    register_views,
)
