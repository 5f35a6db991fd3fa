from flinkapps_spark.functions.dates import (
    convert_string_to_date,
    epoch_seconds,
    extract_year,
    extract_weekyear,
)
from flinkapps_spark.functions.text import (
    normalize_address,
    tokenize,
    word_code,
    register_function,
)
from flinkapps_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "convert_string_to_date", "epoch_seconds", "extract_year",
    "extract_weekyear", "normalize_address", "tokenize", "word_code",
    "register_function", "cosine_similarity", "dot", "l2_norm",
]
