"""Base toolkit: timers, load distribution, progress, tables.

Counterpart of the reference's src/Base/ (namespace tk) utilities that
remain meaningful in this runtime: Timer (Timer.hpp:30-94 with ETA),
linear load distributor (LoadDistributor.cpp:23-90 — the virtualization
knob), Progress meters (Progress.hpp), and Table interpolation
(Table.cpp).  The reference's Charm++-specific pieces (PUP, chare-state
collector, reducers) map to jax/XLA mechanisms instead (SURVEY.md §5.8);
tk::Data's layout switch is realized by the framework-wide feature-major
convention; tk::Exception/Print map to Python exceptions/logging.
"""

from .timer import Timer
from .load import linear_load_distributor
from .progress import Progress
from .table import Table

__all__ = ["Timer", "linear_load_distributor", "Progress", "Table"]
