"""
Multi-chip exact product path: the align -> classify pipeline of
align/device_annotate.py data-parallel over a device mesh.

Reads shard across the mesh's devices (SURVEY §2.4's read-batch axis):
each device runs the full monolith (seed -> banded DP -> pair select)
and the fused classification kernel on its shard; depth/pileup pool with
a psum, and the per-shard evidence buffers download for the host-side
merge (`align/stream.mergeEvidence` re-registers novel SNVs in global
row order, so the merged EvidenceArrays is bit-identical to the
single-device run — asserted in tests/test_exact_sharded.py).

The index tables ride along as closed-over jit constants, replicated
per device — the same pattern as `makeShardedCohortStep`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.annotate import VariantAnnotator
from ..align.device_annotate import DeviceAnnotator
from ..align.pipeline import GraphAligner
from ..align.stream import mergeEvidence
from ..utils import logger


class ShardedExactPath:
    """Data-parallel exact path over a flat device list."""

    def __init__(
        self,
        aligner: GraphAligner,
        annotator: VariantAnnotator,
        devices=None,
        mesh: Mesh | None = None,
    ):
        if mesh is not None:
            devices = mesh.devices.reshape(-1)
        self.devices = list(devices if devices is not None else jax.devices())
        self.mesh = Mesh(np.array(self.devices), axis_names=("data",))
        self.aligner = aligner
        self.annotator = annotator
        self.da = DeviceAnnotator(aligner, annotator)
        if not self.da.ok:
            raise ValueError(
                "index exceeds the device-annotate packing bounds; the "
                "sharded exact path has no host fallback"
            )
        aligner._device_mono  # noqa: B018 — ensure _mono_fn is built
        self._mono_sh = {}
        self._kern_sh = {}

    @property
    def D(self) -> int:
        return len(self.devices)

    # ------------------------------------------------------------------
    def _monoSharded(self, RL: int, uniform_len: int | None = None):
        fn = self._mono_sh.get((RL, uniform_len))
        if fn is None:
            mono = self.aligner._mono_fn

            def shard(b):
                return mono(b[0], RL, uniform_len)[None]

            fn = jax.jit(
                shard_map(
                    shard, mesh=self.mesh, in_specs=P("data"),
                    out_specs=P("data"), check_vma=False,
                )
            )
            self._mono_sh[(RL, uniform_len)] = fn
        return fn

    def _kernelSharded(self, RL: int, Hb: int, uniform_len: int | None = None):
        fn = self._kern_sh.get((RL, Hb, uniform_len))
        if fn is None:
            kern = self.da._kernel_fn

            def shard(b, w, h):
                out, pileup, depth = kern(
                    b[0], w[0], h[0], RL, Hb, 99, uniform_len
                )
                return (
                    out[None],
                    jax.lax.psum(pileup, "data"),
                    jax.lax.psum(depth, "data"),
                )

            fn = jax.jit(
                shard_map(
                    shard, mesh=self.mesh,
                    in_specs=(P("data"), P("data"), P("data")),
                    out_specs=(P("data"), P(), P()),
                    check_vma=False,
                )
            )
            self._kern_sh[(RL, Hb, uniform_len)] = fn
        return fn

    def _put(self, host: np.ndarray):
        return jax.device_put(
            host, NamedSharding(self.mesh, P("data"))
        )

    # ------------------------------------------------------------------
    def alignAnnotate(self, codes1, len1, codes2, len2):
        """-> (EvidenceArrays, depth, pileup), bit-identical to the
        single-device exact path on the same batch."""
        al, da = self.aligner, self.da
        D = self.D
        RL = al.p.read_len
        N = len(codes1)
        per = -(-N // D)
        if per > al.CHUNK_PAIRS:
            # large batches: loop super-chunks of D * CHUNK_PAIRS
            evs, depth_sum, pileup_sum = [], None, None
            step = D * al.CHUNK_PAIRS
            for s in range(0, N, step):
                ev, depth, pileup = self.alignAnnotate(
                    codes1[s:s + step], len1[s:s + step],
                    codes2[s:s + step], len2[s:s + step],
                )
                evs.append(ev)
                depth_sum = depth if depth_sum is None else depth_sum + depth
                pileup_sum = pileup if pileup_sum is None \
                    else pileup_sum + pileup
            return mergeEvidence(self.annotator, evs), depth_sum, pileup_sum

        bucket = al._bucket(max(per, 1), al.CHUNK_PAIRS)
        bufs, n0s = [], []
        for d in range(D):
            s = d * per
            buf, N0, Nb = da._packChunk(
                codes1[s:s + per], len1[s:s + per],
                codes2[s:s + per], len2[s:s + per], bucket=bucket,
            )
            bufs.append(buf.copy())
            n0s.append(N0)
        bufs_g = self._put(np.stack(bufs))
        from ..align.pipeline import _uniformLen

        ul = _uniformLen(
            np.asarray(len1, dtype=np.int32),
            np.asarray(len2, dtype=np.int32),
        )
        ws_dev = self._monoSharded(RL, ul)(bufs_g)
        ws = np.asarray(ws_dev)

        hard = [da.hardRows(ws[d]) for d in range(D)]
        n_hard = max((len(h) for h in hard), default=0)
        if max(n_hard, 1) > da.MAX_HARD:
            raise RuntimeError(
                f"hard-job count {n_hard} exceeds MAX_HARD={da.MAX_HARD}"
            )
        Hb = da._hardBucket(n_hard)
        hards = np.full((D, Hb), -1, np.int32)
        for d, h in enumerate(hard):
            hards[d, :len(h)] = h

        out_dev, pileup, depth = self._kernelSharded(RL, Hb, ul)(
            bufs_g, ws_dev, self._put(hards)
        )
        outs = np.asarray(out_dev)
        evs = []
        for d in range(D):
            if n0s[d] == 0:
                continue
            ev = da._assemble(ws[d], outs[d], n0s[d], bucket)
            if ev is None:
                raise RuntimeError(
                    "device-annotate cap overflow in sharded path"
                )
            evs.append(ev)
        logger.info(
            f"[Align] sharded exact path: {N} pairs over {D} devices "
            f"(bucket {bucket}, hard bucket {Hb})"
        )
        return mergeEvidence(self.annotator, evs), depth, pileup
