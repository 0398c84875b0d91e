"""Optional auxiliary scorers.

The hot scorers (decoder log-probs, CTC prefix, length bonus) are fused
into the device beam step (decode/beam_search.py::_beam_step_core). This
module holds the optional host-side scorers from the reference suite
(/root/reference/speechcatcher/beam_search/scorers.py) that are not part
of the per-step fused path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class LengthBonus:
    """Per-token insertion bonus (reference scorers.py:470-494). The fused
    beam step applies this as `penalty`; this class exists for API parity
    and offline rescoring."""

    def __init__(self, weight: float = 0.0):
        self.weight = weight

    def score(self, yseq: Sequence[int]) -> float:
        return self.weight * float(np.count_nonzero(np.asarray(yseq)))


class CoverageScorer:
    """Repetition penalty (reference scorers.py:497-526): score =
    -weight * (1 - unique_tokens/total_tokens). The reference defines this
    as an optional scorer and never wires it into its search; here it can
    additionally re-rank final hypotheses via the beam search's
    coverage_weight option."""

    def __init__(self, weight: float = 0.0):
        self.weight = weight

    def score(self, yseq: Sequence[int]) -> float:
        toks = [int(t) for t in yseq]
        if len(toks) <= 1:
            return 0.0
        repetition_ratio = 1.0 - len(set(toks)) / len(toks)
        return -self.weight * repetition_ratio
