from .fct import FCT

__all__ = ["FCT"]
