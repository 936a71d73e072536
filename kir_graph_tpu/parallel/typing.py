"""
Multi-chip allele typing: the beam search's score reduction sharded over
a device mesh, plus a sharded CN grid search.

The typing hot op is ``score[t, a] = sum_r max(log_probs[r, a],
prev[r, t])`` (reference typing_mulit_allele.py:540-542).  Here the
read axis shards over the mesh's ``data`` axis and the allele axis over
``model``: each chip reduces its read shard against its allele-column
shard, a psum over ``data`` completes the read sum, and an all_gather
over ``model`` assembles the full [T, A] score grid for the (tiny,
replicated) dedup + top-k.  The per-read prob matrices stay sharded and
device-resident across all CN steps; only the [k] score/index vectors
ever download — the same contract as the single-device beam
(typing.kernels.beamExtend).

The final float64 host rescore (typing.allele_typing.rescoreF64) runs
unchanged, so the sharded beam's end result is bit-identical to the
single-device path — asserted in tests/test_typing_sharded.py and the
driver's ``dryrun_multichip``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cn.models import CNgroup, _cnGroupGridSearch
from ..typing.allele_typing import AlleleTyping, TypingResult
from ..typing.kernels import pairMaxScores
from ..utils import logger


def _meshAxisSizes(mesh: Mesh) -> tuple[int, int]:
    d = int(mesh.shape.get("data", 1))
    m = int(mesh.shape.get("model", 1))
    return d, m


class ShardedAlleleTyping(AlleleTyping):
    """Beam search with the score reduction sharded over a mesh.

    Built from an existing (host) AlleleTyping via :meth:`fromModel`;
    shares every host-side field (variants, hashes, count matrices for
    the f64 rescore) and replaces the device arrays + step primitives.
    Only full-catalog steps are sharded — candidate-restricted steps
    (exonfirst's intron completion) operate on a handful of alleles and
    belong on one chip.
    """

    @classmethod
    def fromModel(cls, model: AlleleTyping, mesh: Mesh) -> "ShardedAlleleTyping":
        self = cls.__new__(cls)
        self.__dict__.update(model.__dict__)
        self.result = []
        self._initShard(mesh)
        return self

    # ------------------------------------------------------------------
    def _initShard(self, mesh: Mesh) -> None:
        self.mesh = mesh
        d, m = _meshAxisSizes(mesh)
        R, A = self.log_probs.shape
        self._R_true, self._A_true = R, A
        self._Rpad = -(-max(R, 1) // d) * d
        self._Apad = -(-max(A, 1) // m) * m

        def gput(x: np.ndarray, spec: P):
            # make_array_from_callback also works when the mesh spans
            # multiple processes (every controller holds the full host
            # copy) — jax.device_put with a cross-process sharding does
            # not, and mp_worker.py runs this path for real
            s = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                x.shape, s, lambda idx: x[idx]
            )

        self._gput = gput
        lp = np.zeros((self._Rpad, self._Apad), np.float32)
        lp[:R, :A] = self.log_probs
        self._lp_sh = gput(lp, P("data", "model"))
        w = np.zeros(self._Rpad, np.float32)
        w[:R] = 1.0  # pad rows carry zero weight in fraction sums
        self._w_sh = gput(w, P("data"))
        self._colmask = gput(np.arange(self._Apad) < A, P())
        # padded allele hashes: random (like the real ones) so a padded
        # extension can't alias a real multiset during dedup; padded
        # score slots are -inf-masked before top_k regardless
        rng = np.random.Generator(np.random.Philox(0x5AAD))
        ah1 = np.concatenate(
            [self._ah1, rng.integers(0, 1 << 32, self._Apad - A, dtype=np.uint32)]
        )
        ah2 = np.concatenate(
            [self._ah2, rng.integers(0, 1 << 32, self._Apad - A, dtype=np.uint32)]
        )
        self._ah1_sh = gput(ah1, P())
        self._ah2_sh = gput(ah2, P())
        # the unsharded device copy must never be touched from here on
        self._log_probs_dev = None
        self._beam_fns: dict = {}
        self._gather_fns: dict = {}
        self._frac_fns: dict = {}

    # -- sharded kernels (compiled per static shape, cached) -----------
    def _beamFn(self, T: int, k: int):
        fn = self._beam_fns.get((T, k))
        if fn is None:
            Apad = self._Apad
            _, m = _meshAxisSizes(self.mesh)
            Al = Apad // m

            def step(lp, prev, h1, h2, ah1, ah2, colmask):
                # lp [R/d, A/m]  prev [R/d, T]  hashes/colmask replicated
                scores = pairMaxScores(lp, prev)          # [T, A/m]
                scores = jax.lax.psum(scores, "data")
                scores = jax.lax.all_gather(
                    scores, "model", axis=1, tiled=True
                )                                          # [T, A]
                flat = jnp.where(
                    colmask[None, :], scores, -jnp.inf
                ).reshape(-1)
                h1f = (h1[:, None] + ah1[None, :]).reshape(-1)
                h2f = (h2[:, None] + ah2[None, :]).reshape(-1)
                idx0 = jnp.arange(T * Apad, dtype=jnp.int32)
                sh1, sh2, sidx = jax.lax.sort((h1f, h2f, idx0), num_keys=3)
                is_first = jnp.concatenate(
                    [
                        jnp.ones(1, bool),
                        (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1]),
                    ]
                )
                keep = jnp.zeros(T * Apad, bool).at[sidx].set(is_first)
                masked = jnp.where(keep, flat, -jnp.inf)
                value, idx = jax.lax.top_k(masked, k)
                t_sel = idx // Apad
                a_sel = idx % Apad
                # selected lp columns live on one model shard each:
                # masked local gather + pmax reassembles them everywhere
                start = jax.lax.axis_index("model") * Al
                loc = a_sel - start
                inr = (loc >= 0) & (loc < Al)
                vals = lp[:, jnp.where(inr, loc.astype(jnp.int32), 0)]
                vals = jnp.where(inr[None, :], vals, -jnp.inf)
                vals = jax.lax.pmax(vals, "model")
                new_prob = jnp.maximum(prev[:, t_sel], vals)
                return value, idx, new_prob

            fn = jax.jit(
                shard_map(
                    step, mesh=self.mesh,
                    in_specs=(
                        P("data", "model"), P("data"),
                        P(), P(), P(), P(), P(),
                    ),
                    out_specs=(P(), P(), P("data")),
                    check_vma=False,
                )
            )
            self._beam_fns[(T, k)] = fn
        return fn

    def _gatherFn(self, n: int):
        fn = self._gather_fns.get(n)
        if fn is None:
            _, m = _meshAxisSizes(self.mesh)
            Al = self._Apad // m

            def gather(lp, ids):
                start = jax.lax.axis_index("model") * Al
                loc = ids - start
                inr = (loc >= 0) & (loc < Al)
                vals = lp[:, jnp.where(inr, loc.astype(jnp.int32), 0)]
                vals = jnp.where(inr[None, :], vals, -jnp.inf)
                return jax.lax.pmax(vals, "model")

            fn = jax.jit(
                shard_map(
                    gather, mesh=self.mesh,
                    in_specs=(P("data", "model"), P()),
                    out_specs=P("data"),
                    check_vma=False,
                )
            )
            self._gather_fns[n] = fn
        return fn

    def _fracFn(self, T: int, n: int):
        fn = self._frac_fns.get((T, n))
        if fn is None:
            _, m = _meshAxisSizes(self.mesh)
            Al = self._Apad // m
            R_true = self._R_true

            def frac(lp, ids, top, w):
                # lp [R/d, A/m]  ids [T, n] repl  top [R/d, T]  w [R/d]
                start = jax.lax.axis_index("model") * Al
                loc = ids - start
                inr = (loc >= 0) & (loc < Al)
                sel = lp[:, jnp.where(inr, loc.astype(jnp.int32), 0)]
                sel = jnp.where(inr[None, :, :], sel, -jnp.inf)
                sel = jax.lax.pmax(sel, "model")          # [R/d, T, n]
                belong = (sel == top[:, :, None]).astype(jnp.float32)
                belong = belong / belong.sum(axis=2, keepdims=True)
                belong = belong * w[:, None, None]
                return jax.lax.psum(belong.sum(axis=0), "data") / R_true

            fn = jax.jit(
                shard_map(
                    frac, mesh=self.mesh,
                    in_specs=(P("data", "model"), P(), P("data"), P("data")),
                    out_specs=P(),
                    check_vma=False,
                )
            )
            self._frac_fns[(T, n)] = fn
        return fn

    # -- step primitive overrides --------------------------------------
    def _beamStep(self, allele_index, prev, k):
        if len(allele_index) != self._A_true:
            raise NotImplementedError(
                "ShardedAlleleTyping shards the full-catalog beam; "
                "candidate-restricted steps are tiny — run them on the "
                "host AlleleTyping"
            )
        T = prev.allele_id.shape[0]
        value, idx, new_prob = self._beamFn(T, k)(
            self._lp_sh, prev.allele_prob,
            jnp.asarray(prev.set_h1), jnp.asarray(prev.set_h2),
            self._ah1_sh, self._ah2_sh, self._colmask,
        )
        idx = np.asarray(idx)
        return np.asarray(value), idx // self._Apad, idx % self._Apad, new_prob

    def _fractionStep(self, top_id, top_prob):
        T, n = top_id.shape
        return np.asarray(
            self._fracFn(T, n)(
                self._lp_sh, jnp.asarray(top_id, dtype=jnp.int32),
                top_prob, self._w_sh,
            )
        )

    def _gatherColumns(self, ids):
        ids = np.asarray(ids, dtype=np.int32)
        return self._gatherFn(len(ids))(self._lp_sh, jnp.asarray(ids))


# ----------------------------------------------------------------------
def shardedCNFit(
    mesh: Mesh,
    values: list[float],
    lower_bound: float = 0.0,
    upper_bound: float | None = None,
    bin_extra: int = 200,
) -> CNgroup:
    """CNgroup fit with the base grid search sharded over every mesh
    device (cn/models.py:94-118 run per base shard; the histogram is
    tiny and replicated).  Returns a fitted CNgroup whose chosen base is
    identical to the host fit — asserted in tests/test_typing_sharded.py."""
    dist = CNgroup()
    dist.bin_num += bin_extra
    max_depth = max(values) * 1.2
    dist.base_dev *= max_depth
    dist.x_max = max(max_depth, 1e-6)
    dist.data = list(values)
    if upper_bound is None:
        upper_bound = dist.x_max

    density, _ = np.histogram(
        values, bins=dist.bin_num, range=(0, dist.x_max)
    )
    bases = np.linspace(lower_bound, upper_bound, dist.bin_num)
    D = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    n_pad = (-len(bases)) % D
    bases_pad = np.concatenate([bases, np.repeat(bases[-1:], n_pad)])

    kw = dict(
        x_max=float(dist.x_max), base_dev=float(dist.base_dev),
        y0_dev=float(dist.y0_dev), dev_decay=float(dist.dev_decay),
        dev_decay_neg=float(dist.dev_decay_neg),
        bin_num=dist.bin_num, max_cn=dist.max_cn,
        start_base=dist.start_base,
    )

    def shard(dens, b):
        lik = _cnGroupGridSearch(dens, b, **kw)
        # replicate the result so every process can fetch it (the mesh
        # may span hosts — mp_worker.py runs this path for real)
        return jax.lax.all_gather(lik, mesh.axis_names, tiled=True)

    fn = jax.jit(
        shard_map(
            shard, mesh=mesh,
            in_specs=(P(), P(mesh.axis_names)),
            out_specs=P(),
            check_vma=False,
        )
    )
    dens32 = np.asarray(density, dtype=np.float32)
    bases32 = np.asarray(bases_pad, dtype=np.float32)
    # make_array_from_callback: valid on cross-process meshes too
    dens_g = jax.make_array_from_callback(
        dens32.shape, NamedSharding(mesh, P()), lambda i: dens32[i]
    )
    bases_g = jax.make_array_from_callback(
        bases32.shape,
        NamedSharding(mesh, P(mesh.axis_names)),
        lambda i: bases32[i],
    )
    lik = np.asarray(fn(dens_g, bases_g))[: len(bases)]
    dist.likelihood = np.stack([bases, lik], axis=1)
    dist.base = float(bases[int(np.argmax(lik))])
    logger.info(
        f"[CN] sharded grid search over {D} devices: base = {dist.base}"
    )
    return dist
