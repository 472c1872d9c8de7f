from . import complexing

__all__ = ["complexing"]
