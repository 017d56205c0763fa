"""Page-aware agent pipeline — a WORKING implementation of the
reference's unmounted 11-step agent (rag/agent/ — SURVEY.md §2.6: never
mounted, incompatible storage formats, arity bug at orchestrator.py:124,
chunk sort by text[:50]). Same step structure, same intent table, wired
to the real registry/retriever and mounted at POST /agent/query."""

from .orchestrator import PageAwareAgent  # noqa: F401
from .state import AgentState, QueryIntent  # noqa: F401
