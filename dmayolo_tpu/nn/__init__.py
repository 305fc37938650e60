from .module import ApplyCtx, Identity, Lambda, Module, Sequential, Vars, make_vars
from . import blocks, heads, primitives

__all__ = [
    "ApplyCtx",
    "Identity",
    "Lambda",
    "Module",
    "Sequential",
    "Vars",
    "make_vars",
    "blocks",
    "heads",
    "primitives",
]
