"""aden_hive_fork_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of
``pajohmail/aden-hive-fork`` (an AI agent framework whose relational
surface is read-only SQL passthrough over tabular files and external
databases — see SURVEY.md §0) as an idiomatic Spark engine:

- relational SQL layer  -> Spark SQL over temp views        (engine, catalog)
- dataflow/graph layer  -> DataFrame pipelines + keyed state (plans, state)
- event/stream layer    -> Structured Streaming              (streaming)
- LLM-pipeline extras   -> dedup / similarity / text / multimodal (operators)

Everything here derives from public knowledge only: the Apache Spark
API and the reference repo's observable behavior.
"""

from .session import build_session
from .engine import Engine, SqlGuardError

__all__ = ["build_session", "Engine", "SqlGuardError"]
__version__ = "0.1.0"
