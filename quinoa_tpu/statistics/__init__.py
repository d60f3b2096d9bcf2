from .stats import (
    Term,
    mean,
    variance,
    ordinary_moment,
    central_moment,
    estimate_moments,
)
from .pdf import UniPDF, BiPDF, TriPDF, estimate_pdf

__all__ = [
    "Term",
    "mean",
    "variance",
    "ordinary_moment",
    "central_moment",
    "estimate_moments",
    "UniPDF",
    "BiPDF",
    "TriPDF",
    "estimate_pdf",
]
