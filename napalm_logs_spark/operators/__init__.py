from .normalize import normalize, normalize_pandas, ENVELOPE_SCHEMA

__all__ = ["normalize", "normalize_pandas", "ENVELOPE_SCHEMA"]
