"""Column-expression functions (lazy ``Column`` builders, no actions)."""

from bdq_spark.functions.surrogate_keys import (
    NULL_STR_REPR,
    pseudonymize,
    surrogate_key_hash,
    surrogate_key_string,
)

__all__ = ["surrogate_key_string", "surrogate_key_hash", "pseudonymize", "NULL_STR_REPR"]
