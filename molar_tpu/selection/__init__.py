"""Selection language: parser + evaluator + the ``SelectionExpr`` handle.

A ``SelectionExpr`` is parsed once and can be applied per frame; coordinate-
independent subtrees are cached across applications (the reference's
``Precomputed`` mechanism, ast.rs:505-530), so per-frame re-evaluation only
recomputes state-dependent nodes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import nodes
from .evaluator import EvalContext, SelectionEvalError
from .parser import SelectionSyntaxError, parse

__all__ = [
    "SelectionExpr",
    "SelectionSyntaxError",
    "SelectionEvalError",
    "parse",
    "nodes",
]


class SelectionExpr:
    """A compiled selection expression, reusable across frames of one system."""

    def __init__(self, text: str):
        self.text = text
        self.ast = parse(text)
        self._cache: dict[int, np.ndarray] = {}
        self._cache_top_id: Optional[int] = None

    @property
    def is_state_dependent(self) -> bool:
        return nodes.is_state_dependent(self.ast)

    def _context(self, topology, state, subset) -> EvalContext:
        ctx = EvalContext(topology, state, subset)
        if self._cache_top_id == id(topology):
            ctx._static_cache = self._cache
        else:
            self._cache = ctx._static_cache = {}
            self._cache_top_id = id(topology)
        return ctx

    def apply(self, topology, state, subset: Optional[np.ndarray] = None) -> np.ndarray:
        """Evaluate -> sorted global index array. ``subset`` restricts both the
        search domain and the 'global' context (sub-selection semantics,
        selection_expr.rs apply_subset)."""
        return self._context(topology, state, subset).evaluate(self.ast)

    def compile_device(self, topology, state, cutoff_params=None):
        """Compile to a jitted per-frame mask function
        ``(coords, box, inv) -> bool[N]`` (see selection.compiled)."""
        from .compiled import compile_selection

        return compile_selection(self.ast, topology, state, cutoff_params)

    def __repr__(self) -> str:
        return f"SelectionExpr({self.text!r})"
