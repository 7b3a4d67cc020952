"""Training-data pipeline operator suite (dedup, similarity, text, multimodal).

Filled in module-by-module; registries start empty so imports stay stable.
"""

from __future__ import annotations

from ._registry import make_registry, tables  # noqa: F401

QUERIES, ORACLES, query = make_registry()
