"""Training-data operators over document corpora (dedup, similarity search,
text analysis, multimodal plumbing) — the large-scale pipeline toolkit the
100 TB target needs alongside extraction (task brief: first-class components).
"""

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — matches DuckDB/SQL ROUND semantics.

    numpy/pandas round half-to-even, which disagrees with the SQL oracles at
    exact midpoints (e.g. 105/128 = 0.8203125 → SQL 0.820313, numpy
    0.820312), so every float column compared against an oracle goes through
    this instead.
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
