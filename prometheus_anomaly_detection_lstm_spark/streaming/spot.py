"""Streaming SPOT threshold calibration (Siffer et al., KDD'17).

The reference hand-tunes ``anomaly_threshold_mse`` (config.yaml:113-119
ships a 0.0025 placeholder with a "tune me" comment); SPOT replaces it
with a risk-calibrated threshold fit on the detector's OWN recent MSE
scores: peaks over an initial quantile t are modeled with a
Generalized Pareto Distribution and the alarm level z_q solves
P(X > z_q) = q.  The fit here is the same closed-form method-of-moments
as the batch operator (``plans/wave11.spot_threshold``) — pinned equal
in ``tests/test_streaming_spot.py`` — so batch backtests and the
realtime detector agree on thresholds by construction.

Per the paper's protocol, scores the detector flags as anomalous are
NOT fed back into calibration (an alarm must not raise the bar for the
next alarm); everything else is.  State is a bounded deque of recent
scores (``max_history``) — a few KB per detector, trivially
checkpointable.
"""

from __future__ import annotations

from collections import deque

import numpy as np

#: defaults mirror the batch operator (plans/wave11.py).
SPOT_INIT_Q = 0.98
SPOT_RISK = 1e-3


def fit_spot_threshold(
    scores: np.ndarray,
    init_q: float = SPOT_INIT_Q,
    risk: float = SPOT_RISK,
) -> float | None:
    """Closed-form SPOT fit over a score history; None when the tail
    is degenerate (no excesses / zero-variance excesses) — the caller
    decides its fallback.  Exactly the batch operator's math."""
    scores = np.asarray(scores, dtype="float64")
    n = scores.size
    if n == 0:
        return None
    t0 = float(np.percentile(scores, init_q * 100))  # linear interp
    y = scores[scores > t0] - t0
    if y.size == 0:
        return None
    m = float(y.mean())
    s2 = float(y.var())  # ddof=0, matching var_pop
    if s2 <= 0.0:
        return None
    ratio = m * m / s2
    xi = (1.0 - ratio) / 2.0
    sigma = m * (1.0 + ratio) / 2.0
    arg = risk * n / y.size
    if abs(xi) < 1e-9:
        return t0 - sigma * float(np.log(arg))
    return t0 + (sigma / xi) * (arg ** (-xi) - 1.0)


class SpotCalibrator:
    """Bounded-history streaming SPOT threshold.

    ``observe`` feeds a (non-anomalous) score; ``threshold`` returns
    the current alarm level — None until ``min_history`` scores have
    arrived (the detector stays silent while calibrating, the paper's
    n-point init phase), and the static ``(1-risk)`` percentile of the
    history when the GPD fit is degenerate (flat tails have no peaks
    to model; the percentile is then exact on the empirical
    distribution)."""

    def __init__(
        self,
        init_q: float = SPOT_INIT_Q,
        risk: float = SPOT_RISK,
        min_history: int = 50,
        max_history: int = 2000,
    ):
        self.init_q = init_q
        self.risk = risk
        self.min_history = min_history
        self._scores: deque[float] = deque(maxlen=max_history)
        # the GPD refit is O(history); eval loops read .threshold per
        # observation (r7 ADVICE) — cache it, invalidated on observe()
        self._cached: float | None = None
        self._dirty = True

    def observe(self, score: float) -> None:
        self._scores.append(float(score))
        self._dirty = True

    def __len__(self) -> int:
        return len(self._scores)

    @property
    def threshold(self) -> float | None:
        if not self._dirty:
            return self._cached
        if len(self._scores) < self.min_history:
            z = None
        else:
            hist = np.asarray(self._scores)
            z = fit_spot_threshold(hist, self.init_q, self.risk)
            if z is None:
                z = float(np.percentile(hist, (1.0 - self.risk) * 100))
        self._cached = z
        self._dirty = False
        return z


class DriftSpotCalibrator(SpotCalibrator):
    """DSPOT — the paper's drifting-baseline variant (Siffer et al.,
    KDD'17 §4.3): the GPD is fit on RESIDUALS against a moving-average
    local model, so a slowly rising or falling baseline does not drag
    the threshold with it.  ``threshold`` returns the alarm level in
    the ORIGINAL score units (local mean + fitted residual level), so
    callers compare raw scores exactly as with plain SPOT.

    State: the plain-SPOT residual history plus the last
    ``depth`` raw scores for the local mean — both bounded.
    """

    def __init__(self, *args, depth: int = 24, **kwargs):
        super().__init__(*args, **kwargs)
        self.depth = depth
        self._recent: deque[float] = deque(maxlen=depth)

    def observe(self, score: float) -> None:
        if len(self._recent) == self.depth:
            # residual vs the local model BEFORE this point joins it
            self._scores.append(float(score) - self._local_mean())
            self._dirty = True
        self._recent.append(float(score))

    def _local_mean(self) -> float:
        return float(np.mean(self._recent))

    def __len__(self) -> int:
        return len(self._scores)

    @property
    def threshold(self) -> float | None:
        base = super().threshold  # residual-space level
        if base is None:
            return None
        return self._local_mean() + base
