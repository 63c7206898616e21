from .gaff import FFError, apply_ff, gaff_types, parse_def

__all__ = ["apply_ff", "gaff_types", "parse_def", "FFError"]
