from .linalg import symmetrize

__all__ = ["symmetrize"]
