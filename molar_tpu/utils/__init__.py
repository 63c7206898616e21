"""Small shared utilities (banner, misc helpers)."""

from .greeting import greeting

__all__ = ["greeting"]
