from french_admin_etl_spark.functions.hashing import sha256_udf, content_sha
from french_admin_etl_spark.functions.normalize import (
    normalize_decimal,
    parse_round_int,
    valid_code,
)

__all__ = [
    "sha256_udf",
    "content_sha",
    "normalize_decimal",
    "parse_round_int",
    "valid_code",
]
