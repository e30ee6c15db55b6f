"""Scalar/vector function helpers.

The engine's scalar surface is Spark's built-in ``pyspark.sql.functions``
(exercised family-by-family in queries/scalar_funcs.py); this package
adds the composed helpers Spark lacks as built-ins.
"""

from ..operators.similarity import l2_norm  # noqa: F401
from ..operators.text import (  # noqa: F401
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count_bpe_ish,
    token_count_ws,
    tokens,
)
