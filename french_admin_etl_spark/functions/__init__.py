from french_admin_etl_spark.functions.hashing import sha256_udf, content_sha
from french_admin_etl_spark.functions.normalize import (
    normalize_decimal,
    parse_round_int,
    valid_code,
)

from french_admin_etl_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)

__all__ = [
    "bpe_ish_token_count", "fingerprint", "lang_id", "quality_features",
    "token_count",
    "sha256_udf",
    "content_sha",
    "normalize_decimal",
    "parse_round_int",
    "valid_code",
]
