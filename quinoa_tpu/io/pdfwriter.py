"""PDF text output.

Counterpart of the reference's PDFWriter txt mode (src/IO/PDFWriter.cpp):
bin centers + probability density, one line per (non-empty) bin.
"""

from __future__ import annotations

import numpy as np


def write_pdf_txt(path: str, pdf) -> None:
    counts = np.asarray(pdf.counts)
    n = counts.sum()
    with open(path, "w") as fh:
        if counts.ndim == 1:
            fh.write("# 1:x 2:pdf\n")
            dens = counts / (n * pdf.binsize)
            for i, d in enumerate(dens):
                if counts[i]:
                    x = pdf.lo + (i + 0.5) * pdf.binsize
                    fh.write(f"{x:.12e}\t{d:.12e}\n")
        elif counts.ndim == 2:
            fh.write("# 1:x 2:y 3:pdf\n")
            area = pdf.binsize[0] * pdf.binsize[1]
            for i in range(counts.shape[0]):
                for j in range(counts.shape[1]):
                    if counts[i, j]:
                        x = pdf.lo[0] + (i + 0.5) * pdf.binsize[0]
                        y = pdf.lo[1] + (j + 0.5) * pdf.binsize[1]
                        fh.write(
                            f"{x:.12e}\t{y:.12e}\t{counts[i, j] / (n * area):.12e}\n"
                        )
        else:
            fh.write("# 1:x 2:y 3:z 4:pdf\n")
            volb = pdf.binsize[0] * pdf.binsize[1] * pdf.binsize[2]
            nz = np.nonzero(counts)
            for i, j, k in zip(*nz):
                x = pdf.lo[0] + (i + 0.5) * pdf.binsize[0]
                y = pdf.lo[1] + (j + 0.5) * pdf.binsize[1]
                z = pdf.lo[2] + (k + 0.5) * pdf.binsize[2]
                fh.write(
                    f"{x:.12e}\t{y:.12e}\t{z:.12e}\t"
                    f"{counts[i, j, k] / (n * volb):.12e}\n"
                )
