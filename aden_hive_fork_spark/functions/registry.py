"""UDF registry with per-node allowlists (SURVEY.md §2.B row 57).

The reference registers tools centrally and restricts which node may
call which tool (reference: core/framework/runner/tool_registry.py,
per-node allowlists executor.py:579-587, node.py:202). Spark analog:
a registry of named column-functions / UDFs; ``for_node`` resolves a
name under that node's allowlist; ``register_sql`` also exposes the
function to ``spark.sql`` queries.

Kinds, by preference (the Python-boundary policy of SCALING.md §5):
- "expr":   a Column-builder (pure JVM — the fast path)
- "pandas": an Arrow-batched pandas UDF
- "python": a row-at-a-time UDF (discouraged; supported for parity)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


class RegistryError(KeyError):
    pass


@dataclass
class _Entry:
    name: str
    kind: str  # expr | pandas | python
    fn: Callable
    return_type: str | None = None
    description: str = ""


@dataclass
class ToolRegistry:
    _entries: dict[str, _Entry] = field(default_factory=dict)
    _allowlists: dict[str, set[str]] = field(default_factory=dict)

    # -- registration --------------------------------------------------
    def register(
        self,
        name: str,
        fn: Callable,
        kind: str = "expr",
        return_type: str | None = None,
        description: str = "",
    ) -> None:
        if kind not in ("expr", "pandas", "python"):
            raise ValueError(f"unknown kind: {kind}")
        if kind in ("pandas", "python") and return_type is None:
            raise ValueError(f"{kind} UDFs require return_type")
        self._entries[name] = _Entry(name, kind, fn, return_type, description)

    def allow(self, node: str, names: list[str]) -> None:
        """Set a node's tool allowlist (executor.py:579-587 analog)."""
        unknown = [n for n in names if n not in self._entries]
        if unknown:
            raise RegistryError(f"allowlist references unknown tools: {unknown}")
        self._allowlists[node] = set(names)

    # -- resolution ----------------------------------------------------
    def list_tools(self) -> list[dict[str, str]]:
        return [
            {"name": e.name, "kind": e.kind, "description": e.description}
            for e in sorted(self._entries.values(), key=lambda e: e.name)
        ]

    def get(self, name: str, node: str | None = None) -> Callable:
        """Resolve a callable producing a Column. Enforces the node
        allowlist when ``node`` is given (no allowlist = deny-all,
        matching the reference's explicit-grant model)."""
        if name not in self._entries:
            raise RegistryError(f"unknown tool: {name}")
        if node is not None and name not in self._allowlists.get(node, set()):
            raise RegistryError(f"tool '{name}' not allowed for node '{node}'")
        e = self._entries[name]
        if e.kind == "expr":
            return e.fn
        if e.kind == "pandas":
            from pyspark.sql.functions import pandas_udf

            return pandas_udf(e.fn, e.return_type)
        from pyspark.sql.functions import udf

        return udf(e.fn, e.return_type)

    def register_sql(self, spark: SparkSession, name: str) -> None:
        """Expose a pandas/python entry to spark.sql() by name."""
        e = self._entries.get(name)
        if e is None:
            raise RegistryError(f"unknown tool: {name}")
        if e.kind == "expr":
            raise RegistryError("expr tools are Column builders; use them directly")
        spark.udf.register(name, self.get(name))
