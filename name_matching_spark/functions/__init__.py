from name_matching_spark.functions.normalize import (  # noqa: F401
    normalize_text,
    normalize_text_col,
    normalize_udf,
    STOPWORDS,
)
