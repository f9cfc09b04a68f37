"""bionext_ray — a Ray-Data-native knowledge-graph-construction engine with
the query/data-processing capabilities of ieeta-pt/BioNExt (reference at
/root/reference, studied for behavior only; architecture is Ray-Data-first).

Pipeline: Parquet web pages -> HTML-to-text extraction -> windowed NER mention
detection -> cascaded entity linking -> relation+novelty extraction ->
canonicalization -> partitioned graph materialization. Plus general
training-data ops (dedup, similarity search, text analysis) under
``bionext_ray.ops``.
"""

from .kb import KnowledgeBase, default_kb  # noqa: F401
from .stages.canonicalize import merge_graph_increment  # noqa: F401
from .pipeline import (kg_pipeline, kg_stage_datasets, pages_from_documents,  # noqa: F401
                       run_kg_to_graph)
from .runtime import (CheckpointRunner, run_kg_checkpointed,  # noqa: F401
                      run_kg_partitioned)

__version__ = "0.1.0"
