"""
Copy-number models: CNgroup ("LCND") and KDEcut.

Behavioural port of reference cn_model.py:55-390 with the fit expressed as
dense array programs: the CNgroup grid search is a [bases x bins x CN]
tensor reduction (one jit), and the KDE is an explicit Gaussian-kernel
logsumexp — no scipy/sklearn objects to serialise.

Cohort mode pools per-gene depth values across samples; on a device mesh
the pooled histogram is a psum (see parallel/cohort.py).
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import NumpyEncoder


class Dist:
    """Abstract CN model with JSON (de)serialisation."""

    def __init__(self) -> None:
        self.raw_df: list[Any] = []

    def save(self, filename: str) -> None:
        with open(filename, "w") as f:
            json.dump(self.getParams(), f, cls=NumpyEncoder)

    @classmethod
    def load(cls, filename: str) -> "Dist":
        with open(filename) as f:
            return cls.setParams(json.load(f))

    def getParams(self) -> dict[str, Any]:
        raise NotImplementedError

    @classmethod
    def setParams(cls, data: dict[str, Any]) -> "Dist":
        raise NotImplementedError

    def fit(self, values: list[float]) -> None:
        raise NotImplementedError

    def assignCN(self, values: list[float]) -> list[int]:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# CNgroup kernels
# ---------------------------------------------------------------------------

def _normPdf(x: jax.Array, loc: float | jax.Array, scale: float | jax.Array) -> jax.Array:
    z = (x - loc) / scale
    return jnp.exp(-0.5 * z * z) / (scale * jnp.sqrt(2 * jnp.pi))


@partial(jax.jit, static_argnames=("bin_num", "max_cn", "start_base"))
def _cnGroupProb(
    base: jax.Array,
    x_max: float,
    base_dev: float,
    y0_dev: float,
    dev_decay: float,
    dev_decay_neg: float,
    bin_num: int,
    max_cn: int,
    start_base: int,
) -> jax.Array:
    """[CN, bins] probability table for one candidate CN=1 mean."""
    x = jnp.linspace(0.0, x_max, bin_num)
    cn = jnp.arange(0, max_cn, dtype=jnp.float32)
    if start_base == 1:
        dev = jnp.where(
            cn == 0, base_dev * y0_dev, base_dev * (dev_decay * (cn - 1) + 1)
        )
    elif start_base == 2:
        dev = jnp.where(
            cn < 2,
            base_dev * (dev_decay_neg * (2 - cn) + 1),
            base_dev * (dev_decay * (cn - 2) + 1),
        )
    else:
        raise NotImplementedError(start_base)
    y = _normPdf(x[None, :], base * cn[:, None], dev[:, None])
    return y * (x_max / bin_num)


def cnOnDevice() -> bool:
    """Venue rule for the CN kernels (mirrors typing's
    typingOnDevice): the grid is [bases x CN x bins] ~ 1 MFLOP — far
    below what amortises a dispatch over a high-latency link, so the
    numpy twins run by default; KGT_CN_DEVICE=1 forces the jitted path
    (the sharded cohort fit in parallel/typing.py is always on device)."""
    return os.environ.get("KGT_CN_DEVICE", "") == "1"


def _cnDevs(
    base_dev: float, y0_dev: float, dev_decay: float,
    dev_decay_neg: float, max_cn: int, start_base: int,
) -> np.ndarray:
    cn = np.arange(0, max_cn, dtype=np.float32)
    if start_base == 1:
        return np.where(
            cn == 0, base_dev * y0_dev, base_dev * (dev_decay * (cn - 1) + 1)
        ).astype(np.float32)
    if start_base == 2:
        return np.where(
            cn < 2,
            base_dev * (dev_decay_neg * (2 - cn) + 1),
            base_dev * (dev_decay * (cn - 2) + 1),
        ).astype(np.float32)
    raise NotImplementedError(start_base)


def _cnGroupProbHost(
    base: float, x_max: float, base_dev: float, y0_dev: float,
    dev_decay: float, dev_decay_neg: float,
    bin_num: int, max_cn: int, start_base: int,
) -> np.ndarray:
    """numpy twin of _cnGroupProb (same float32 arithmetic)."""
    x = np.linspace(0.0, x_max, bin_num, dtype=np.float32)
    cn = np.arange(0, max_cn, dtype=np.float32)
    dev = _cnDevs(base_dev, y0_dev, dev_decay, dev_decay_neg,
                  max_cn, start_base)
    z = (x[None, :] - np.float32(base) * cn[:, None]) / dev[:, None]
    y = np.exp(-0.5 * z * z) / (dev[:, None] * np.sqrt(2 * np.pi, dtype=np.float32))
    return (y * np.float32(x_max / bin_num)).astype(np.float32)


def _cnGroupGridSearchHost(
    density: np.ndarray, bases: np.ndarray, x_max: float,
    base_dev: float, y0_dev: float, dev_decay: float, dev_decay_neg: float,
    bin_num: int, max_cn: int, start_base: int,
) -> np.ndarray:
    """numpy twin of _cnGroupGridSearch, vectorised over bases
    ([B, CN, bins] ~ a few MB at product scale)."""
    x = np.linspace(0.0, x_max, bin_num, dtype=np.float32)
    dev = _cnDevs(base_dev, y0_dev, dev_decay, dev_decay_neg,
                  max_cn, start_base)
    cn = np.arange(0, max_cn, dtype=np.float32)
    mean = bases.astype(np.float32)[:, None, None] * cn[None, :, None]
    z = (x[None, None, :] - mean) / dev[None, :, None]
    y = np.exp(-0.5 * z * z) / (dev[None, :, None] * np.sqrt(2 * np.pi, dtype=np.float32))
    max_prob = (y * np.float32(x_max / bin_num)).max(axis=1)   # [B, bins]
    return (
        np.log(max_prob + np.float32(1e-9)) * density[None, :].astype(np.float32)
    ).sum(axis=1)


@partial(jax.jit, static_argnames=("bin_num", "max_cn", "start_base"))
def _cnGroupGridSearch(
    density: jax.Array,  # [bins] histogram of depths
    bases: jax.Array,    # [n_base] candidate CN=1 means
    x_max: float,
    base_dev: float,
    y0_dev: float,
    dev_decay: float,
    dev_decay_neg: float,
    bin_num: int,
    max_cn: int,
    start_base: int,
) -> jax.Array:
    """Log-likelihood of each candidate base (vmapped grid search,
    reference cn_model.py:124-168)."""

    def one(base):
        y = _cnGroupProb(
            base, x_max, base_dev, y0_dev, dev_decay, dev_decay_neg,
            bin_num, max_cn, start_base,
        )
        max_prob = y.max(axis=0)
        return jnp.sum(jnp.log(max_prob + 1e-9) * density)

    return jax.vmap(one)(bases)


class CNgroup(Dist):
    """Linear Copy Number Distributions: grid-search the CN=1 mean so a
    0..max_cn Normal mixture best explains the pooled gene depths."""

    def __init__(self) -> None:
        super().__init__()
        self.bin_num: int = 300
        self.max_cn: int = 7
        self.x_max: float = 1.0
        self.base: float | None = None
        self.base_dev: float = 0.08
        self.y0_dev: float = 1.5
        self.dev_decay: float = 0.5
        self.dev_decay_neg: float = 0.3
        self.start_base: int = 1
        self.data: list[float] = []
        self.likelihood: np.ndarray = np.array([])

    def getParams(self) -> dict[str, Any]:
        return {
            "method": "CNgroup",
            "x_max": self.x_max,
            "base": self.base,
            "base_dev": self.base_dev,
            "y0_dev": self.y0_dev,
            "dev_decay": self.dev_decay,
            "dev_decay_neg": self.dev_decay_neg,
            "bin_num": self.bin_num,
            "max_cn": self.max_cn,
            "data": self.data,
            "likelihood": self.likelihood,
            "start_base": self.start_base,
            "raw_df": self.raw_df,
        }

    @classmethod
    def setParams(cls, data: dict[str, Any]) -> "CNgroup":
        assert data["method"] == "CNgroup"
        self = cls()
        self.base = data["base"]
        self.base_dev = data["base_dev"]
        self.x_max = data["x_max"]
        self.y0_dev = data["y0_dev"]
        self.dev_decay = data["dev_decay"]
        self.bin_num = data["bin_num"]
        self.max_cn = data["max_cn"]
        self.data = data["data"]
        self.raw_df = data.get("raw_df", [])
        self.likelihood = np.array(data["likelihood"])
        self.start_base = data.get("start_base", 1)
        self.dev_decay_neg = data.get("dev_decay_neg", self.dev_decay)
        return self

    def fit(
        self,
        values: list[float],
        lower_bound: float = 0,
        upper_bound: float | None = None,
    ) -> None:
        if self.base is None:
            max_depth = max(values) * 1.2
            self.base_dev *= max_depth
            self.x_max = max(max_depth, 1e-6)
            self.data = list(values)
        if upper_bound is None:
            upper_bound = self.x_max

        density, _ = np.histogram(values, bins=self.bin_num, range=(0, self.x_max))
        bases = np.linspace(lower_bound, upper_bound, self.bin_num)
        if cnOnDevice():
            lik = np.asarray(
                _cnGroupGridSearch(
                    jnp.asarray(density, dtype=jnp.float32),
                    jnp.asarray(bases, dtype=jnp.float32),
                    float(self.x_max),
                    float(self.base_dev),
                    float(self.y0_dev),
                    float(self.dev_decay),
                    float(self.dev_decay_neg),
                    self.bin_num,
                    self.max_cn,
                    self.start_base,
                )
            )
        else:
            lik = _cnGroupGridSearchHost(
                density, bases, float(self.x_max), float(self.base_dev),
                float(self.y0_dev), float(self.dev_decay),
                float(self.dev_decay_neg), self.bin_num, self.max_cn,
                self.start_base,
            )
        self.likelihood = np.stack([bases, lik], axis=1)
        self.base = float(bases[int(np.argmax(lik))])

    def calcCNGroupProb(self, base: float) -> np.ndarray:
        if not cnOnDevice():
            return _cnGroupProbHost(
                base, float(self.x_max), float(self.base_dev),
                float(self.y0_dev), float(self.dev_decay),
                float(self.dev_decay_neg), self.bin_num, self.max_cn,
                self.start_base,
            )
        return np.asarray(
            _cnGroupProb(
                jnp.float32(base),
                float(self.x_max),
                float(self.base_dev),
                float(self.y0_dev),
                float(self.dev_decay),
                float(self.dev_decay_neg),
                self.bin_num,
                self.max_cn,
                self.start_base,
            )
        )

    def assignCN(self, values: list[float]) -> list[int]:
        assert self.base is not None
        cn_max = self.calcCNGroupProb(self.base).argmax(axis=0)
        space = self.x_max / self.bin_num
        idx = np.clip((np.asarray(values) / space).astype(int), 0, self.bin_num - 1)
        return [int(cn_max[i]) for i in idx]


# ---------------------------------------------------------------------------
# KDE
# ---------------------------------------------------------------------------

@jax.jit
def _kdeLogDensity(x: jax.Array, data: jax.Array, bandwidth: float) -> jax.Array:
    """Gaussian-kernel log density (sklearn KernelDensity.score_samples
    equivalent, reference cn_model.py:322-339)."""
    z = (x[:, None] - data[None, :]) / bandwidth
    log_k = -0.5 * z * z - jnp.log(bandwidth * jnp.sqrt(2 * jnp.pi))
    return jax.scipy.special.logsumexp(log_k, axis=1) - jnp.log(data.shape[0])


def _kdeLogDensityHost(
    x: np.ndarray, data: np.ndarray, bandwidth: float
) -> np.ndarray:
    """numpy twin of _kdeLogDensity (same float32 arithmetic)."""
    z = (x[:, None] - data[None, :]) / np.float32(bandwidth)
    log_k = -0.5 * z * z - np.float32(
        np.log(bandwidth * np.sqrt(2 * np.pi))
    )
    m = log_k.max(axis=1, keepdims=True)
    lse = m[:, 0] + np.log(np.exp(log_k - m).sum(axis=1))
    return (lse - np.float32(np.log(data.shape[0]))).astype(np.float32)


def _localMinima(y: np.ndarray, order: int) -> np.ndarray:
    """Indices i where y[i] < y[clip(i±k)] for k=1..order, matching scipy
    argrelextrema(np.less, mode='clip'): out-of-range neighbours clip to the
    boundary index, so the exact edges self-compare and never qualify."""
    n = len(y)
    idx = np.arange(n)
    ok = np.ones(n, dtype=bool)
    for k in range(1, order + 1):
        left = np.clip(idx - k, 0, n - 1)
        right = np.clip(idx + k, 0, n - 1)
        ok &= (y < y[left]) & (y < y[right])
    return idx[ok]


class KDEcut(Dist):
    """CN thresholds at local minima of a KDE over normalised depths."""

    def __init__(self) -> None:
        super().__init__()
        self.bandwidth: float = 0.05
        self.points: int = 100
        self.neighbor: int = 5
        self.x_max: float = 0.0
        self.local_min: list[float] = []
        self.data: list[float] = []
        self.prob: list[float] = []

    def getParams(self) -> dict[str, Any]:
        return {
            "method": "KDEcut",
            "bandwidth": self.bandwidth,
            "points": self.points,
            "neighbor": self.neighbor,
            "x_max": self.x_max,
            "local_min": self.local_min,
            "data": self.data,
            "prob": self.prob,
            "raw_df": self.raw_df,
        }

    @classmethod
    def setParams(cls, data: dict[str, Any]) -> "KDEcut":
        assert data["method"] == "KDEcut"
        self = cls()
        self.bandwidth = data["bandwidth"]
        self.points = data["points"]
        self.neighbor = data["neighbor"]
        self.x_max = data["x_max"]
        self.local_min = data["local_min"]
        self.data = data["data"]
        self.prob = data["prob"]
        self.raw_df = data.get("raw_df", [])
        return self

    def fit(self, values: list[float]) -> None:
        self.x_max = float(np.max(values))
        data = np.asarray(values, dtype=np.float32) / self.x_max
        x = np.linspace(0, 1.1, self.points)
        if cnOnDevice():
            y = np.asarray(
                _kdeLogDensity(
                    jnp.asarray(x, dtype=jnp.float32),
                    jnp.asarray(data), self.bandwidth,
                )
            )
        else:
            y = _kdeLogDensityHost(
                x.astype(np.float32), data, self.bandwidth
            )
        self.prob = y.tolist()
        self.local_min = [float(x[i]) for i in _localMinima(y, self.neighbor)]
        self.data = list(values)

    def assignCN(self, values: list[float]) -> list[int]:
        x = np.asarray(values) / self.x_max
        return list(np.searchsorted(self.local_min, x).astype(int))


def loadCNModel(filename: str) -> Dist:
    with open(filename) as f:
        data = json.load(f)
    if data["method"] == "KDEcut":
        return KDEcut.load(filename)
    if data["method"] == "CNgroup":
        return CNgroup.load(filename)
    raise NotImplementedError(data["method"])
