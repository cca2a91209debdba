"""Column-function library (JVM-side expressions only)."""

from .text import lang_id_heuristic, quality_score, token_count  # noqa: F401
from .vectors import cosine_sim, dot_product  # noqa: F401
