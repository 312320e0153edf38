"""Scalar-function surface: expression compiler, JSON repair, scoring.

(SURVEY.md §2.A rows 27-28, §2.B rows 39, 52, 57.)
"""

from .json_repair import find_json_object, fix_unescaped_newlines, repair_json
from .registry import RegistryError, ToolRegistry
from .safe_eval_compiler import CompileError, compile_expr
from .scoring import weighted_score
from .validate import enforce_schema

__all__ = [
    "compile_expr",
    "CompileError",
    "find_json_object",
    "fix_unescaped_newlines",
    "repair_json",
    "weighted_score",
    "ToolRegistry",
    "RegistryError",
    "enforce_schema",
]
