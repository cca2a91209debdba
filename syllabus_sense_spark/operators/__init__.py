"""Reusable dataflow operators.

Each module implements one capability family from SURVEY.md §2 as a
composition of built-in DataFrame operators (Catalyst-optimizable);
Python UDFs appear only where Spark genuinely lacks the primitive.
"""

from .sessionize import group_topics, sessionize_elements  # noqa: F401
from .asof import asof_join  # noqa: F401
from .batching import assign_batches, mark_batch_status  # noqa: F401
