"""Multi-chip execution: mesh construction, sharded retrieval, sharded
training. All new capability — the reference has no distributed execution
at all (SURVEY.md §2.9); this layer is designed for ICI meshes per §5.8.
"""

from .mesh import corpus_mesh, train_mesh  # noqa: F401
