from .fct import FCT, FCTWork

__all__ = ["FCT", "FCTWork"]
