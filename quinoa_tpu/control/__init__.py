"""Control layer: the `.q` control-file DSL and typed configuration.

Counterpart of the reference's src/Control/ (PEGTL grammars + tagged-tuple
input decks, ~20k LoC): the *deck schema is the contract* (SURVEY.md §5.6)
— the same block-structured keyword files the reference parses drive this
framework, so regression decks can be reused verbatim.
"""

from .qparser import parse_deck
from .config import InciterConfig, WalkerConfig, load_inciter, load_walker

__all__ = [
    "parse_deck",
    "InciterConfig",
    "WalkerConfig",
    "load_inciter",
    "load_walker",
]
