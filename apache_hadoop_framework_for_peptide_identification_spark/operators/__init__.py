"""Composed operators the engine provides beyond raw DataFrame calls."""

from .asof import asof_join  # noqa: F401
from .topk import top_k, top_k_per_group  # noqa: F401
