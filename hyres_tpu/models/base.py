"""Shared machinery for the entropy-coded codec wrappers.

Every codec family (checkerboard / ELIC / Cheng2020) shares: baked CDF
table state + ``update()`` (the reference's CompressionModel.update
convention, /root/reference/models/checkerboard.py:261-267), the
factorized-prior z-plane coding, and the timed ``inference()`` roundtrip
contract (checkerboard.py:242-259).
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..coding import RansDecoder
from ..entropy import (
    CdfTables,
    build_bottleneck_tables,
    build_gaussian_tables,
    get_scale_table,
)


class CodecBase:
    """Holds model + params + baked tables; subclasses add the jit stages."""

    def __init__(self, model, params, clamp: Tuple[float, float] | None = (0.0, 1.0),
                 coder: str = "host"):
        """coder: "host" = C++ rANS with per-chunk framing (rate-optimal,
        ~5 B overhead/plane, but forces host syncs between decode stages);
        "tpu" = on-device lane-parallel rANS (coding/tpu_rans.py) — the
        whole decode chain runs as one async chain of device programs at
        ~4 B/lane extra stream bytes. Families that haven't wired the TPU
        choreography yet silently use the host path."""
        if coder not in ("host", "tpu"):
            raise ValueError(f"unknown coder {coder!r}")
        self.model = model
        self.params = params
        self.clamp = clamp
        self.coder = coder
        self.scale_table = get_scale_table()
        self.gauss_tables: CdfTables | None = None
        self.eb_tables: CdfTables | None = None
        self.tpu_coder = None
        self._build_jits()

    def _after_tables(self):
        """(Re)build the device-side coder when tables change."""
        if self.coder == "tpu":
            from .codec import TpuPlaneCoder

            self.tpu_coder = TpuPlaneCoder(self.gauss_tables, self.eb_tables,
                                           scale_table=self.scale_table)

    # subclasses define their compiled stages here
    def _build_jits(self):
        raise NotImplementedError

    def _eb_param_dict(self) -> dict:
        return self.params["params"]["entropy_bottleneck"]

    def update(self, scale_table=None, force: bool = False) -> bool:
        """Bake the Gaussian scale-table CDFs and the factorized-prior CDFs.

        The compiled coder stages close over the scale table at
        construction time (it determines the index mapping on BOTH sides
        of the channel), so a different table here would silently desync
        indexes from the baked CDFs — reject it instead.
        """
        if scale_table is not None:
            st = np.asarray(scale_table, np.float32)
            if st.shape != self.scale_table.shape or not np.allclose(
                    st, self.scale_table):
                raise ValueError(
                    "custom scale tables must be passed to the codec "
                    "constructor (the compiled stages bind the table); "
                    "update() only re-bakes CDFs for the bound table")
        if self.gauss_tables is not None and not force:
            return False
        self.gauss_tables = build_gaussian_tables(self.scale_table)
        self.eb_tables = build_bottleneck_tables(self._eb_param_dict())
        self._after_tables()
        return True

    def install_tables(self, tables: dict) -> None:
        """Install pre-baked CDF tables from an ``updata`` artifact
        (cli/updata.py stores them next to the params, the TPU-native
        analog of the reference's registered CDF buffers inside the state
        dict — /root/reference/src/updata.py:36-78). Lets inference skip
        the bake entirely."""
        def mk(d):
            return CdfTables(
                quantized_cdf=np.asarray(d["quantized_cdf"], np.int32),
                cdf_length=np.asarray(d["cdf_length"], np.int32),
                offset=np.asarray(d["offset"], np.int32))

        self.gauss_tables = mk(tables["gaussian"])
        self.eb_tables = mk(tables["bottleneck"])
        self._after_tables()

    def _require_tables(self):
        if self.gauss_tables is None or self.eb_tables is None:
            raise RuntimeError("call update() before compress/decompress")

    # -- factorized-prior (z) coding ---------------------------------------

    def _eb_encode(self, z_sym: np.ndarray) -> List[bytes]:
        from .codec import _encode_planes

        C = z_sym.shape[-1]
        idx = np.ascontiguousarray(
            np.broadcast_to(np.arange(C, dtype=np.int32), z_sym.shape))
        return _encode_planes(z_sym, idx, self.eb_tables)

    def _eb_decode(self, strings: Sequence[bytes],
                   shape: Tuple[int, int]) -> np.ndarray:
        from .codec import _decode_planes

        t = self.eb_tables
        C = t.cdf_length.shape[0]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), (len(strings), *shape, C)))
        return _decode_planes(strings, idx, t)

    # -- pipelined serving ---------------------------------------------------

    # Default dispatch/finish hooks: eager (no overlap). CheckerboardCodec
    # (and HyresCodec via composition) override them with a real async
    # split: all device programs for image i enqueue before image i+1's,
    # and i's blob D2H + host framing then overlap i+1's device compute.
    def _compress_dispatch(self, x):
        return ("eager", self.compress(x))

    def _compress_finish(self, state):
        return state[1]

    def _dec_dispatch_from_comp(self, comp):
        """Return (x_hat_device, start_time) without the final sync."""
        if hasattr(self, "_decompress_dispatch"):
            return self._decompress_dispatch(comp["strings"], comp["shape"],
                                             comp.get("size"))
        start = time.time()
        d = self.decompress(comp["strings"], comp["shape"], comp.get("size"))
        return d["x_hat"], start

    def inference_stream(self, xs: Sequence, depth: int = 2) -> List[Dict]:
        """Pipelined roundtrips over a list of (1, H, W, 3) images.

        Software pipelining for the tunnel/host bottleneck: with the TPU
        coder, image i's encode pull (device_get) and host framing run
        while image i+1's device programs execute (TPU runs programs in
        dispatch order; D2H DMA overlaps compute), and likewise for the
        decode chain's final pull. ``depth`` images are in flight at
        once. Output order matches input order; per-image "time" spans
        dispatch->finish, so pipelined per-image wall times overlap —
        the meaningful metric is total wall / len(xs).

        The streams and reconstructions are bit-identical to sequential
        ``inference`` calls: the same compiled programs run on the same
        inputs, only the host<->device interleaving changes.
        """
        from collections import deque

        depth = max(1, depth)
        comps: List[Dict] = []
        pend = deque()
        for x in xs:
            pend.append(self._compress_dispatch(x))
            if len(pend) >= depth:
                comps.append(self._compress_finish(pend.popleft()))
        while pend:
            comps.append(self._compress_finish(pend.popleft()))

        outs: List[Dict] = []

        def _finish_dec(item):
            (x_hat, start), comp = item
            x_hat.block_until_ready()
            dec_time = time.time() - start
            outs.append({
                "x_hat": x_hat,
                "compressed": comp,
                "strings": comp["strings"],
                "shape": comp["shape"],
                "time": {
                    "compression": comp["time"],
                    "decompression": dec_time,
                    "total": comp["time"] + dec_time,
                },
            })

        dpend = deque()
        for comp in comps:
            dpend.append((self._dec_dispatch_from_comp(comp), comp))
            if len(dpend) >= depth:
                _finish_dec(dpend.popleft())
        while dpend:
            _finish_dec(dpend.popleft())
        return outs

    # -- timed roundtrip (reference checkerboard.py:242-259) ----------------

    def inference(self, x) -> Dict:
        comp = self.compress(x)
        dec = self.decompress(comp["strings"], comp["shape"], comp.get("size"))
        return {
            "x_hat": dec["x_hat"],
            "strings": comp["strings"],
            "shape": comp["shape"],
            "time": {
                "compression": comp["time"],
                "decompression": dec["time"],
                "total": comp["time"] + dec["time"],
            },
        }
