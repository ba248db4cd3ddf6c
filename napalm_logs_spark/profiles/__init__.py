from .compiler import compile_line, CompiledPattern
from .registry import ProfileRegistry, load_registry

__all__ = ["compile_line", "CompiledPattern", "ProfileRegistry", "load_registry"]
