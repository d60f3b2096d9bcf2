"""walker statistics text writer.

Counterpart of the reference's TxtStatWriter (src/IO/TxtStatWriter.cpp):
time series of the requested ordinary and central moments.
"""

from __future__ import annotations

from typing import Sequence


def _term_label(term) -> str:
    if term and term[0] == "C":
        return "<" + "".join(f"{v[0].lower()}{v[1] + 1}" for v in term[1:]) + ">"
    return "<" + "".join(f"{v[0].upper()}{v[1] + 1}" for v in term) + ">"


class TxtStatWriter:
    def __init__(self, path: str, ordinary: Sequence = (), central: Sequence = ()):
        self.path = path
        self.terms = list(ordinary) + [("C",) + t for t in central]
        self._fh = open(path, "w")
        cols = ["it", "t"] + [_term_label(t) for t in self.terms]
        self._fh.write(
            "# " + "\t".join(f"{i + 1}:{c}" for i, c in enumerate(cols)) + "\n"
        )

    def write(self, it: int, t: float, moments: dict):
        row = [str(it), f"{t:.12e}"]
        row += [f"{moments[k]:.12e}" for k in self.terms]
        self._fh.write("\t".join(row) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
