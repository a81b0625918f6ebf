"""Ray-Data-native knowledge-graph construction engine.

Convenience surface — the canonical entry points re-exported at the
package root; see README for the full map.
"""

from .config import KGConfig
from .pipelines.kg import (
    get_conversation_graph,
    get_stats,
    list_versions,
    read_aliases,
    read_canonical_edges,
    read_canonical_nodes,
    read_edges,
    read_nodes,
    run_canonicalize_job,
    run_kg_job,
)

__all__ = [
    "KGConfig",
    "run_kg_job",
    "run_canonicalize_job",
    "read_nodes",
    "read_edges",
    "read_aliases",
    "read_canonical_nodes",
    "read_canonical_edges",
    "get_conversation_graph",
    "get_stats",
    "list_versions",
]
