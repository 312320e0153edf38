"""Dataflow/graph layer (SURVEY.md §2.B rows 38-42, 51)."""

from .graph import Edge, EntryPoint, GraphValidationError, Node, Pipeline

__all__ = ["Node", "Edge", "EntryPoint", "Pipeline", "GraphValidationError"]
