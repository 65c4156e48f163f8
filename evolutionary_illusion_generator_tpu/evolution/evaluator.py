"""The generation evaluator: one jitted device program per population.

The reference's generation is a 6-phase pipeline glued together by PNG files
on disk (SURVEY.md §3.1: render -> PredNet -> flow -> score -> assign ->
artifacts, generate_illusion.py:478-673).  Here phases 1-3 are ONE jitted
XLA program — CPPN render, PredNet rollout, and sparse flow never leave HBM:

    packed genomes ──vmap cppn──> images ──scan prednet──> flow frames
                  ──corners+LK──> (pop, K, 4) vectors + masks

Only the (tiny) vector sets come back to the host, where scoring runs in
float64 numpy with reference-exact math by default (bit-compatible rankings;
SURVEY.md §7 "fitness-gate divergence"), or stays on device with
``score_on_device=True`` for the fully-fused mode.

Populations are chunked at the host level (one chunk-shaped compile serves
any population size) and genomes are packed into growable (levels x width)
CPPN buckets, so XLA recompiles only when a bucket expands.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.cppn import (
    ACTIVATIONS,
    genome_depth,
    make_population_eval,
    pack_population_levels,
    population_act_set,
    required_nodes,
)
from ..models.prednet.model import (
    PredNetParams,
    quantize_params_int8,
    rollout_flow_frames,
)
from ..neat.config import NeatConfig
from ..neat.genome import Genome
from ..ops.fitness.calculate import score_vectors
from ..ops.fitness.metrics_jax import score_vectors_jax
from ..ops.flow.api import FlowConfig, batched_flow
from ..ops.grids import GRID_SCALING, create_grid
from ..ops.render import render_images, to_unit_float
from ..structure import StructureType

__all__ = ["EvalConfig", "GenerationEvaluator"]


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass(frozen=True)
class EvalConfig:
    """Static configuration of the generation device program."""

    structure: StructureType = StructureType.Circles
    w: int = 160
    h: int = 120
    c_dim: int = 3
    gradient: int = 1
    bg: int = 1
    # Equiluminant (HSV) rendering — the working version of the reference's
    # dead get_equilum_image_from_cppn path (generate_illusion.py:511).
    equilum: bool = False
    repeat: int = 20  # open-loop presentations (generate_illusion.py:483)
    extension: int = 2  # closed-loop frames (:531)
    # Renders per genome — the reference's latent-space traversal machinery
    # (s_step=2 -> pertype_count=1, generate_illusion.py:495-496): each
    # genome is rendered/evaluated this many times and its fitness is the
    # mean over renders (the reference sums score_d then divides, :615-616).
    # Vestigial there (the latent value s_val is computed but never reaches
    # the renderer, so renders are identical); surfaced here as a knob.
    pertype_count: int = 1
    flow: FlowConfig = field(default_factory=FlowConfig)
    score_on_device: bool = False
    # host scoring backend: "auto" (C++ if buildable, else numpy),
    # "native", or "numpy"
    score_backend: str = "auto"
    # Replace non-finite fitness scores with 0 (with a warning).  The
    # reference propagates NaN (e.g. a zero-norm flow vector) straight into
    # NEAT where it silently poisons max/mean comparisons; disable to
    # reproduce that.
    nan_to_zero: bool = True
    # Sanitizer mode: enable jax's NaN checker for the device program (every
    # jitted computation re-runs un-jitted and raises on the FIRST NaN
    # producer, with its source location).  Process-global (flips
    # ``jax_debug_nans``) and slow — debugging only.
    debug_nans: bool = False
    use_pallas: Union[bool, str] = False
    # Top-down conv(upsample2(R_above)) as four parity 2x2 convs at the
    # coarse resolution (models/prednet/model.py::_upconv_subpixel): 4/9
    # the FLOPs of that conv and no upsampled intermediate in HBM, at
    # bf16-rounding-level numeric drift.
    subpixel_up: bool = False
    # Pixel-layer convs/states in space-to-depth layout (models/prednet/
    # model.py::_s2d_kernel): PredNet's layer-0 channel counts (1-57) pad
    # to the MXU's 128 lanes at ~4-10% utilization; 4x channels at 1/4 the
    # spatial size do the same nominal FLOPs densely packed.  Same math up
    # to accumulation-order rounding.  Measured -10% end-to-end on the
    # north-star bench (10.44 -> 9.41 s/gen) with every rated-probe score
    # within +-0.006 of the dense path (BENCH_NOTES.md "s2d pixel layer").
    # ``None`` (default) resolves to True on TPU backends and False
    # elsewhere: CPU/GPU don't pad conv channels to 128 lanes, so there the
    # lifted kernel's zeros are ~4x real MACs, not free padding.
    s2d_l0: Optional[bool] = None
    # predictor compute dtype: "bfloat16" halves the rollout's post-conv
    # bandwidth (the generation's dominant cost); "float32" for exact
    # predictor numerics
    prednet_dtype: str = "bfloat16"
    # int8-quantize the frozen predictor's conv weights (per-output-channel
    # scales) with dynamic per-tensor activation quantization — the conv
    # FLOPs then run at the v5e MXU's doubled int8 throughput
    # (models/prednet/model.py::quantize_params_int8).  Quantization noise
    # perturbs the sub-pixel drift signal the fitness oracle reads, so this
    # is opt-in; promote only behind a measured rated-probe ordering check.
    prednet_int8: bool = False
    # population microbatching bound (memory); 0 = whole population at once
    microbatch: int = 0
    # CPPN level-bucket: genomes are packed into ``cppn_levels`` topological
    # levels of ``cppn_width`` nodes (one MXU matmul per level).  Generous
    # defaults so structural genome growth over a long run rarely forces a
    # mid-run recompile (remote recompiles cost minutes); capacity is
    # levels*width nodes, depth cap is ``cppn_levels``.
    cppn_levels: int = 8
    cppn_width: int = 16
    # CPPN activation pruning: "population" compiles only the activation
    # functions present in the current population (grow-only set — at most
    # one recompile per newly-appearing activation, clustered in the first
    # generations since activation_mutate_rate quickly surfaces them all);
    # "all" always compiles the full 7-function stack (no recompiles ever).
    cppn_act_mode: str = "population"
    # Exported-program cache: serialize the traced chunk program so warm
    # process starts skip host retracing (the measured warm floor,
    # BENCH_NOTES.md; utils/program_cache.py).  Best-effort — any
    # export/deserialize failure silently falls back to plain jit.
    program_cache: bool = True


class GenerationOutputs:
    """Results of one generation's device pipeline.

    Small per-candidate data (flow vectors, masks, device scores) transfers
    eagerly; bulky tensors (rendered images, flow frames) stay in HBM and
    are fetched row-by-row on demand — per generation the host sees a few
    hundred KB instead of hundreds of MB.
    """

    SMALL = ("vectors", "mask", "scores")

    def __init__(self, chunks, chunk_size: int, n: int) -> None:
        self._chunks = chunks  # list of dicts of device arrays
        self._chunk_size = chunk_size
        self._n = n

    def __len__(self) -> int:
        return self._n

    def small(self) -> Dict[str, np.ndarray]:
        """Host copies of the small outputs, truncated to the population."""
        out = {}
        for k in self._chunks[0]:
            if k in self.SMALL:
                out[k] = np.concatenate(
                    [np.asarray(c[k]) for c in self._chunks]
                )[: self._n]
        return out

    def fetch(self, key: str, i: int) -> np.ndarray:
        """Host copy of one candidate's row of a bulky output."""
        assert 0 <= i < self._n, i
        c, r = divmod(i, self._chunk_size)
        return np.asarray(self._chunks[c][key][r])

    def to_numpy(self) -> Dict[str, np.ndarray]:
        """Full host copy of everything (tests / debugging)."""
        out = {}
        for k in self._chunks[0]:
            out[k] = np.concatenate(
                [np.asarray(c[k]) for c in self._chunks]
            )[: self._n]
        return out


class GenerationEvaluator:
    """Evaluates NEAT populations; assigns ``genome.fitness`` in place.

    Drop-in role of the reference's ``get_fitnesses_neat``
    (generate_illusion.py:478-673) minus the filesystem.
    """

    def __init__(
        self,
        cfg: EvalConfig,
        params: PredNetParams,
        neat_cfg: NeatConfig,
    ) -> None:
        if cfg.equilum and cfg.c_dim != 3:
            raise ValueError("equiluminant rendering needs c_dim=3 (H,S,V nodes)")
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.cfg = cfg
        # resolve the backend-dependent default ONCE (it must be part of
        # the exported-program cache key — repr(cfg) alone would replay a
        # dense-layout program on TPU or an s2d one on CPU)
        self._s2d_l0 = (
            jax.default_backend() == "tpu" if cfg.s2d_l0 is None
            else cfg.s2d_l0
        )
        if cfg.prednet_int8:
            params = quantize_params_int8(params)
        self.params = params
        self.neat_cfg = neat_cfg
        grid = create_grid(cfg.structure, cfg.w, cfg.h, GRID_SCALING)
        self._x_mat = jnp.asarray(grid["x_mat"], jnp.float32)
        self._grid_flat = jnp.stack(
            [
                jnp.asarray(grid["x_mat"], jnp.float32).reshape(-1),
                jnp.asarray(grid["y_mat"], jnp.float32).reshape(-1),
            ]
        )
        self._levels = cfg.cppn_levels
        self._width = cfg.cppn_width
        while self._levels * self._width < (
            neat_cfg.num_inputs + neat_cfg.num_outputs + neat_cfg.num_hidden
        ):
            self._width *= 2
        self._pop_min = 8  # sharded subclass raises this to the mesh size
        # grow-only activation set (global ids); None = full stack
        self._act_set: tuple = (
            tuple(range(len(ACTIVATIONS)))
            if cfg.cppn_act_mode == "all"
            else ()
        )
        self._jitted = {}
        self.last_timings: Dict[str, float] = {}
        self.last_results: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------

    def _build_run(self):
        """The raw (unjitted) generation device program for one chunk (or
        the whole population when unchunked)."""
        cfg = self.cfg
        cppn_eval = make_population_eval(self._act_set or None)

        def eval_chunk(chunk, params):
            """Full per-candidate pipeline for a population chunk —
            bounding peak HBM (CPPN value buffers + PredNet states scale
            with the chunk, not the population)."""
            outs = cppn_eval(
                chunk["weights"],
                chunk["bias"],
                chunk["response"],
                chunk["act_id"],
                chunk["out_slot"],
                self._grid_flat,
            )  # (mb, O, P)
            if cfg.equilum:
                from ..ops.render import render_equilum_images

                imgs_u8 = render_equilum_images(outs, self._x_mat, bg=cfg.bg)
            else:
                imgs_u8 = render_images(
                    outs, self._x_mat, cfg.c_dim, bg=cfg.bg, gradient=cfg.gradient
                )
            imgs = to_unit_float(imgs_u8)
            f0, f1 = rollout_flow_frames(
                params,
                imgs,
                repeat=cfg.repeat,
                extension=cfg.extension,
                pair="population",
                use_pallas=cfg.use_pallas,
                compute_dtype=jnp.dtype(cfg.prednet_dtype),
                subpixel_up=cfg.subpixel_up,
                s2d_l0=self._s2d_l0,
            )
            vectors, vmask = batched_flow(f0, f1, cfg.flow)
            out = {
                "images_u8": imgs_u8,
                "vectors": vectors,
                "mask": vmask,
                # kept only for the winner's overlay artifact: uint8 is
                # 4x less HBM + 4x less tunnel traffic on fetch
                "flow_frame0": (jnp.clip(f0, 0.0, 1.0) * 255.0).astype(
                    jnp.uint8
                ),
            }
            if cfg.score_on_device:
                score_one = lambda v, m: score_vectors_jax(
                    int(cfg.structure), v, m, cfg.w, cfg.h
                )
                out["scores"] = jax.vmap(score_one)(vectors, vmask)
            return out

        return eval_chunk

    def _device_fn(self, pop_bucket: int, node_bucket: int, example_args=None):
        key = (pop_bucket, node_bucket, self._act_set)
        if key not in self._jitted:
            self._jitted[key] = self._finalize_fn(
                jax.jit(self._build_run()), key, example_args
            )
        return self._jitted[key]

    def _finalize_fn(self, jitted, key, example_args):
        """Back the jitted chunk program with the exported-program cache
        (warm starts skip host retracing — utils/program_cache.py).
        Skipped under ``debug_nans``: the NaN checker re-runs the traced
        Python, which an exported artifact no longer has."""
        cfg = self.cfg
        if example_args is None or not cfg.program_cache or cfg.debug_nans:
            return jitted
        from ..utils.program_cache import cached_program

        # everything program-shaping outside the input shapes/dtypes:
        # subclass (sharding layout), buckets + activation set (key), the
        # full frozen config (structure/grid/rollout/flow/dtype knobs)
        return cached_program(
            jitted,
            (type(self).__name__, key, repr(cfg), self._s2d_l0),
            example_args,
            label="gen",
        )

    # ------------------------------------------------------------------

    def evaluate_images(self, genomes: Sequence[Genome]) -> "GenerationOutputs":
        """Run the device pipeline; returns :class:`GenerationOutputs`.

        With ``cfg.microbatch`` set, the population is chunked at the HOST
        level: XLA compiles ONE chunk-sized program (regardless of
        population size — no pop-bucket recompiles) and it is dispatched
        per chunk; peak HBM scales with the chunk.  Bulky per-candidate
        tensors (images, flow frames) STAY ON DEVICE — callers fetch
        individual rows (e.g. the generation winner) on demand; only the
        (pop, K, 4) vectors and masks transfer per generation."""
        n = len(genomes)
        # grow the level bucket first if any genome outgrew it (capacity or
        # depth); growth recompiles, so buckets only ever expand
        need_nodes = max(len(required_nodes(g, self.neat_cfg)) for g in genomes)
        need_depth = max(genome_depth(g, self.neat_cfg) for g in genomes)
        while self._levels * self._width < need_nodes:
            self._width *= 2
        while self._levels < need_depth:
            self._levels *= 2
        # grow-only activation set (static in the device program)
        if len(self._act_set) < len(ACTIVATIONS):
            needed = population_act_set(genomes, self.neat_cfg)
            if not needed <= set(self._act_set):
                self._act_set = tuple(sorted(set(self._act_set) | needed))

        mb = self.cfg.microbatch
        chunk = min(mb, _bucket(n, self._pop_min)) if mb else _bucket(
            n, self._pop_min
        )
        packed = pack_population_levels(
            genomes,
            self.neat_cfg,
            self._levels,
            self._width,
            act_set=self._act_set or None,
        )
        # the packer may have grown the bucket further (greedy placement can
        # exceed the plain depth bound); sync so the jit cache key matches
        _, self._levels, self._width, _ = packed["weights"].shape
        padded = -(-n // chunk) * chunk
        if n < padded:
            pad = padded - n
            packed = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in packed.items()
            }

        fn = None
        pieces = []
        for start in range(0, padded, chunk):
            part = {
                k: jnp.asarray(v[start : start + chunk]) for k, v in packed.items()
            }
            if fn is None:
                fn = self._device_fn(
                    chunk, (self._levels, self._width), (part, self.params)
                )
            pieces.append(fn(part, self.params))
        return GenerationOutputs(pieces, chunk, n)

    def _score_host(self, vectors: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Exact f64 host scoring — C++ batch scorer when available."""
        backend = self.cfg.score_backend
        if backend in ("auto", "native"):
            from ..ops.fitness.native import is_available, score_population_native

            if is_available():
                return score_population_native(
                    int(self.cfg.structure), vectors, mask, self.cfg.w, self.cfg.h
                )
            if backend == "native":
                raise RuntimeError("native fitness scorer unavailable")
        scores = np.zeros(len(vectors))
        for i in range(len(vectors)):
            v = vectors[i][mask[i]]
            scores[i] = score_vectors(self.cfg.structure, v, self.cfg.w, self.cfg.h)
        return scores

    def __call__(self, population: List[Tuple[int, Genome]], neat_cfg=None):
        """Fitness-function interface for :class:`..neat.Population`."""
        cfg = self.cfg
        pertype = max(1, cfg.pertype_count)
        genomes = [g for _, g in population for _ in range(pertype)]
        t0 = time.time()
        outputs = self.evaluate_images(genomes)
        small = outputs.small()  # vectors + masks (+ device scores): ~KBs
        t1 = time.time()

        if cfg.score_on_device:
            scores = small["scores"].astype(np.float64)
        else:
            scores = self._score_host(small["vectors"], small["mask"])
        if cfg.nan_to_zero:
            bad = ~np.isfinite(scores)
            if bad.any():
                import warnings

                warnings.warn(
                    f"{int(bad.sum())} non-finite fitness scores zeroed "
                    f"(zero-norm flow vectors); set nan_to_zero=False for "
                    f"reference NaN propagation"
                )
                scores = np.where(bad, 0.0, scores)
        # per-genome fitness = mean over the pertype_count renders
        # (generate_illusion.py:615-616: m = score / pertype_count)
        per_render = scores.reshape(len(population), pertype)
        scores = per_render.mean(axis=1)
        t2 = time.time()

        best_idx = 0
        best_score = 0.0
        for i, (gid, genome) in enumerate(population):
            genome.fitness = float(scores[i])
            # reference tie-break: >= lets later candidates win
            # (generate_illusion.py:625)
            if scores[i] >= best_score:
                best_idx = i
                best_score = float(scores[i])

        self.last_timings = {"device": t1 - t0, "score": t2 - t1}
        self.last_results = {
            "best_idx": best_idx,
            "best_score": best_score,
            # device-output row of the winner's best render ("vectors"/"mask"
            # and ``outputs`` rows are per RENDER: population x pertype_count)
            "best_row": best_idx * pertype
            + int(np.argmax(per_render[best_idx])),
            "outputs": outputs,
            "vectors": small["vectors"],
            "mask": small["mask"],
            "scores": scores,
        }
        return scores
