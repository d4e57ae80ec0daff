"""Column-expression library. Everything here returns pyspark Columns built
from built-in `pyspark.sql.functions` (JVM-side, whole-stage-codegen'd) —
no Python UDFs in the hot path.
"""

from .cleaning import clamp, round_down_to_step, round_up_to_step, sentinel_to_null, trunc2
from .keys import composite_key, minute_key
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "clamp",
    "composite_key",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "minute_key",
    "round_down_to_step",
    "round_up_to_step",
    "sentinel_to_null",
    "trunc2",
]
