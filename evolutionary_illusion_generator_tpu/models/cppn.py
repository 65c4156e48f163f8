"""CPPN compiler and batched device evaluator.

The reference evaluates CPPN genomes by building a small torch graph per
genome per render (pytorch_neat ``create_cppn``, generate_illusion.py:343-353)
and looping over pixels in Python for masking.  Here a genome is *compiled*
into fixed-shape tensors — a topo-ordered weight matrix plus per-node
bias/response/activation tables — so the whole population renders as ONE
jitted program: ``vmap`` over genomes, with a ``lax.scan`` over node slots
whose inner op is a (slots,) x (slots, pixels) contraction.

Ragged genomes under vmap (SURVEY.md §7 hard parts) are handled by padding to
a shared slot-count bucket; the bucket only grows (powers of two), so XLA
recompiles at most log2(max) times over a run.

Node semantics match neat-python/pytorch_neat: each node computes
``act(bias + response * sum_i(w_i * x_i))``; activations use neat-python's
scaled definitions (sigmoid(5z), tanh(2.5z), sin(5z), gauss(-5z^2), relu,
abs, identity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..neat.config import NeatConfig
from ..neat.genome import Genome

__all__ = [
    "ACTIVATIONS",
    "ACT_ID",
    "CompiledCppn",
    "compile_genome",
    "pack_population",
    "evaluate_cppn",
    "evaluate_population",
    "required_nodes",
    "population_act_set",
    "compile_genome_levels",
    "pack_population_levels",
    "evaluate_cppn_levels",
    "evaluate_population_levels",
    "make_population_eval",
    "genome_depth",
]

# ---------------------------------------------------------------------------
# activations (neat-python-compatible scalings)
# ---------------------------------------------------------------------------


def _sigmoid(z):
    return jax.nn.sigmoid(jnp.clip(5.0 * z, -60.0, 60.0))


def _tanh(z):
    return jnp.tanh(jnp.clip(2.5 * z, -60.0, 60.0))


def _sin(z):
    return jnp.sin(jnp.clip(5.0 * z, -60.0, 60.0))


def _gauss(z):
    return jnp.exp(-5.0 * jnp.clip(z, -3.4, 3.4) ** 2)


def _relu(z):
    return jnp.maximum(z, 0.0)


def _abs(z):
    return jnp.abs(z)


def _identity(z):
    return z


#: Order defines the integer activation ids used in compiled tables.
ACTIVATIONS = (
    ("sin", _sin),
    ("sigmoid", _sigmoid),
    ("gauss", _gauss),
    ("tanh", _tanh),
    ("relu", _relu),
    ("abs", _abs),
    ("identity", _identity),
)
_ACT_ID = {name: i for i, (name, _) in enumerate(ACTIVATIONS)}
_ACT_FNS = tuple(fn for _, fn in ACTIVATIONS)
ACT_ID = _ACT_ID  # public alias (evaluators map activation names to ids)


# ---------------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------------


def required_nodes(genome: Genome, cfg: NeatConfig) -> set:
    """Nodes on an enabled path into an output (neat-python
    ``required_for_output`` semantics); outputs are always included."""
    required = set(cfg.output_keys)
    frontier = set(cfg.output_keys)
    while frontier:
        new_frontier = set()
        for (i, o), conn in genome.connections.items():
            if conn.enabled and o in frontier and i not in required:
                if i >= 0:  # inputs are implicit
                    new_frontier.add(i)
                    required.add(i)
        frontier = new_frontier
    return required


@dataclass
class CompiledCppn:
    """One genome lowered to dense tables.

    Slot layout: ``[inputs (num_inputs) | eval nodes in topo order]``.
    ``weights[j, s]`` feeds slot ``num_inputs + j`` from slot ``s``; rows are
    strictly lower-triangular in slot order (feed-forward).
    """

    num_inputs: int
    num_nodes: int  # real (unpadded) eval nodes
    weights: np.ndarray  # (max_nodes, num_inputs + max_nodes) f32
    bias: np.ndarray  # (max_nodes,) f32
    response: np.ndarray  # (max_nodes,) f32
    act_id: np.ndarray  # (max_nodes,) i32
    out_slot: np.ndarray  # (num_outputs,) i32 — slot index per output node


def compile_genome(
    genome: Genome, cfg: NeatConfig, max_nodes: int
) -> CompiledCppn:
    """Lower one genome to a :class:`CompiledCppn` with ``max_nodes`` slots."""
    req = required_nodes(genome, cfg)
    enabled = {
        k: c for k, c in genome.connections.items() if c.enabled
        and k[1] in req and (k[0] < 0 or k[0] in req)
    }

    # topo order over required nodes (inputs come free)
    incoming: Dict[int, List[Tuple[int, float]]] = {n: [] for n in req}
    for (i, o), conn in enabled.items():
        incoming[o].append((i, conn.weight))
    order: List[int] = []
    placed = set(cfg.input_keys)
    pending = set(req)
    while pending:
        ready = sorted(
            n for n in pending if all(src in placed for src, _ in incoming[n])
        )
        if not ready:
            raise ValueError(f"genome {genome.key}: cycle in feed-forward net")
        for n in ready:
            order.append(n)
            placed.add(n)
            pending.discard(n)

    if len(order) > max_nodes:
        raise ValueError(
            f"genome {genome.key} needs {len(order)} slots > bucket {max_nodes}"
        )

    ni = cfg.num_inputs
    S = ni + max_nodes
    weights = np.zeros((max_nodes, S), dtype=np.float32)
    bias = np.zeros(max_nodes, dtype=np.float32)
    response = np.zeros(max_nodes, dtype=np.float32)
    act_id = np.full(max_nodes, _ACT_ID["identity"], dtype=np.int32)

    slot_of = {ik: idx for idx, ik in enumerate(cfg.input_keys)}
    for j, n in enumerate(order):
        slot_of[n] = ni + j

    for j, n in enumerate(order):
        node = genome.nodes[n]
        bias[j] = node.bias
        response[j] = node.response
        if node.aggregation != "sum":
            raise NotImplementedError(
                f"aggregation {node.aggregation!r} not supported on device"
            )
        act_id[j] = _ACT_ID[node.activation]
        for src, w in incoming[n]:
            weights[j, slot_of[src]] += w

    out_slot = np.array([slot_of[o] for o in cfg.output_keys], dtype=np.int32)
    return CompiledCppn(
        num_inputs=ni,
        num_nodes=len(order),
        weights=weights,
        bias=bias,
        response=response,
        act_id=act_id,
        out_slot=out_slot,
    )


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def pack_population(
    genomes: Sequence[Genome], cfg: NeatConfig, max_nodes: int | None = None
) -> Dict[str, np.ndarray]:
    """Compile a population into stacked arrays ready for the device.

    Returns dict of arrays with a leading population axis; ``max_nodes`` is
    the shared slot bucket (auto-sized to the largest genome, rounded up to a
    power of two so recompiles are rare).
    """
    if max_nodes is None:
        need = max((len(required_nodes(g, cfg)) for g in genomes), default=1)
        max_nodes = _bucket(need)
    progs = [compile_genome(g, cfg, max_nodes) for g in genomes]
    return {
        "weights": np.stack([p.weights for p in progs]),
        "bias": np.stack([p.bias for p in progs]),
        "response": np.stack([p.response for p in progs]),
        "act_id": np.stack([p.act_id for p in progs]),
        "out_slot": np.stack([p.out_slot for p in progs]),
    }


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _apply_act(act_id, z):
    """Select the activation per node id; under vmap/scan this lowers to a
    select over the (small, fixed) activation set."""
    stacked = jnp.stack([fn(z) for fn in _ACT_FNS])  # (A, P)
    return stacked[act_id]


def evaluate_cppn(weights, bias, response, act_id, out_slot, inputs):
    """Evaluate one compiled CPPN on a pixel batch.

    Args:
      weights: (N, ni+N); bias/response/act_id: (N,); out_slot: (O,)
      inputs: (ni, P) input planes (flattened grid rows).
    Returns:
      (O, P) output-node values.
    """
    n_nodes = weights.shape[0]
    ni = weights.shape[1] - n_nodes
    P = inputs.shape[1]
    vals = jnp.zeros((ni + n_nodes, P), dtype=inputs.dtype)
    vals = jax.lax.dynamic_update_slice(vals, inputs, (0, 0))

    # Node tables ride as scan xs (inputs, not jaxpr constants) so repeated
    # eager calls hit the scan compile cache.
    xs = (jnp.arange(n_nodes), weights, bias, response, act_id)

    def step(vals, x):
        j, w_row, b, r, a = x
        pre = w_row @ vals  # (P,)
        z = r * pre + b
        v = _apply_act(a, z)
        vals = jax.lax.dynamic_update_slice(vals, v[None, :], (ni + j, 0))
        return vals, None

    vals, _ = jax.lax.scan(step, vals, xs)
    return vals[out_slot]


#: vmap over the population axis of packed tables; the grid is shared.
evaluate_population = jax.vmap(evaluate_cppn, in_axes=(0, 0, 0, 0, 0, None))


# ---------------------------------------------------------------------------
# level-blocked compilation/evaluation (the fast path)
# ---------------------------------------------------------------------------
#
# The slot-serial scan above re-reads the whole value buffer once per NODE —
# O(slots^2 * pixels) traffic.  Feed-forward CPPNs are shallow, so nodes can
# be packed into topological LEVELS: each level is one (width, slots) x
# (slots, pixels) matmul on the MXU, and the buffer is re-read once per
# LEVEL.  A level only ever reads strictly earlier levels, so splitting a
# too-wide level into consecutive levels is always legal.


def compile_genome_levels(
    genome: Genome, cfg: NeatConfig, levels: int, width: int
) -> dict:
    """Lower one genome to per-level dense tables.

    Slot layout: ``[inputs | level0 (width) | level1 (width) | ...]``.
    Returns dict of arrays: weights (L, width, S), bias/response (L, width),
    act_id (L, width) i32, out_slot (O,) i32.
    """
    req = required_nodes(genome, cfg)
    enabled = {
        k: c
        for k, c in genome.connections.items()
        if c.enabled and k[1] in req and (k[0] < 0 or k[0] in req)
    }
    incoming: Dict[int, List[Tuple[int, float]]] = {n: [] for n in req}
    for (i, o), conn in enabled.items():
        incoming[o].append((i, conn.weight))

    ni = cfg.num_inputs
    S = ni + levels * width
    slot_of = {ik: idx for idx, ik in enumerate(cfg.input_keys)}
    level_of: Dict[int, int] = {}
    fill = [0] * levels

    # topo placement
    placed = set(cfg.input_keys)
    pending = set(req)
    order: List[int] = []
    while pending:
        ready = sorted(
            n for n in pending if all(src in placed for src, _ in incoming[n])
        )
        if not ready:
            raise ValueError(f"genome {genome.key}: cycle in feed-forward net")
        for n in ready:
            min_level = 0
            for src, _ in incoming[n]:
                if src >= 0:
                    min_level = max(min_level, level_of[src] + 1)
            k = min_level
            while k < levels and fill[k] >= width:
                k += 1
            if k >= levels:
                raise ValueError(
                    f"genome {genome.key} overflows level bucket "
                    f"({levels}x{width})"
                )
            level_of[n] = k
            slot_of[n] = ni + k * width + fill[k]
            fill[k] += 1
            order.append(n)
            placed.add(n)
            pending.discard(n)

    weights = np.zeros((levels, width, S), dtype=np.float32)
    bias = np.zeros((levels, width), dtype=np.float32)
    response = np.zeros((levels, width), dtype=np.float32)
    act_id = np.full((levels, width), _ACT_ID["identity"], dtype=np.int32)

    for n in order:
        node = genome.nodes[n]
        if node.aggregation != "sum":
            raise NotImplementedError(
                f"aggregation {node.aggregation!r} not supported on device"
            )
        k = level_of[n]
        j = slot_of[n] - ni - k * width
        bias[k, j] = node.bias
        response[k, j] = node.response
        act_id[k, j] = _ACT_ID[node.activation]
        for src, w in incoming[n]:
            weights[k, j, slot_of[src]] += w

    out_slot = np.array([slot_of[o] for o in cfg.output_keys], dtype=np.int32)
    return {
        "weights": weights,
        "bias": bias,
        "response": response,
        "act_id": act_id,
        "out_slot": out_slot,
    }


def genome_depth(genome: Genome, cfg: NeatConfig) -> int:
    """Topological depth (number of levels) a genome needs."""
    req = required_nodes(genome, cfg)
    incoming: Dict[int, List[int]] = {n: [] for n in req}
    for (i, o), conn in genome.connections.items():
        if conn.enabled and o in req and i >= 0 and i in req:
            incoming[o].append(i)
    depth: Dict[int, int] = {}
    placed = set()
    pending = set(req)
    while pending:
        ready = [n for n in pending if all(s in placed for s in incoming[n])]
        if not ready:
            raise ValueError("cycle")
        for n in ready:
            depth[n] = 1 + max((depth[s] for s in incoming[n]), default=0)
            placed.add(n)
            pending.discard(n)
    return max(depth.values(), default=1)


def population_act_set(genomes: Sequence[Genome], cfg: NeatConfig) -> set:
    """Activation ids used by any *required* node of any genome."""
    used = set()
    for g in genomes:
        for n in required_nodes(g, cfg):
            used.add(_ACT_ID[g.nodes[n].activation])
    return used


def pack_population_levels(
    genomes: Sequence[Genome],
    cfg: NeatConfig,
    levels: int = 8,
    width: int = 16,
    act_set: Sequence[int] | None = None,
) -> Dict[str, np.ndarray]:
    """Compile a population into stacked level tables (leading pop axis).

    ``levels``/``width`` grow (x2) automatically when a genome's depth or
    node count overflows the requested bucket.

    ``act_set`` (sorted global activation ids) remaps ``act_id`` entries to
    positions WITHIN the set, for evaluation with
    ``make_population_eval(act_set)`` — which then computes only those
    activation functions instead of all ``len(ACTIVATIONS)`` per level
    (VERDICT round-1 item 5).  It must cover ``population_act_set``; padding
    slots remap arbitrarily to position 0 (their values are never read:
    no weight row or out_slot references them).
    """
    while True:
        try:
            progs = [
                compile_genome_levels(g, cfg, levels, width) for g in genomes
            ]
            break
        except ValueError:
            need = max(len(required_nodes(g, cfg)) for g in genomes)
            if levels * width < need:
                width *= 2
            else:
                levels *= 2
    packed = {k: np.stack([p[k] for p in progs]) for k in progs[0]}
    if act_set is not None:
        used = population_act_set(genomes, cfg)
        if not used <= set(act_set):
            raise ValueError(
                f"act_set {tuple(act_set)} does not cover the population's "
                f"activations {sorted(used)}"
            )
        lut = np.zeros(len(ACTIVATIONS), dtype=np.int32)
        for local, gid in enumerate(act_set):
            lut[gid] = local
        packed["act_id"] = lut[packed["act_id"]]
    return packed


def evaluate_cppn_levels(
    weights, bias, response, act_id, out_slot, inputs, act_set=None
):
    """Evaluate one level-compiled CPPN on a pixel batch.

    weights: (L, width, S); bias/response/act_id: (L, width); inputs (ni, P).
    ``act_set`` (static tuple of global activation ids, or None for all):
    only these activation functions are computed per level; ``act_id``
    entries must then be positions within the set (pack_population_levels
    remaps them).  Returns (O, P).
    """
    L, width, S = weights.shape
    ni = S - L * width
    P = inputs.shape[1]
    vals = jnp.zeros((S, P), dtype=inputs.dtype)
    vals = jax.lax.dynamic_update_slice(vals, inputs, (0, 0))

    xs = (jnp.arange(L), weights, bias, response, act_id)

    def step(vals, x):
        k, w_k, b_k, r_k, a_k = x
        pre = jnp.dot(w_k, vals, preferred_element_type=jnp.float32)
        z = r_k[:, None] * pre + b_k[:, None]
        v = _apply_act_rows(a_k, z, act_set)
        vals = jax.lax.dynamic_update_slice(vals, v, (ni + k * width, 0))
        return vals, None

    vals, _ = jax.lax.scan(step, vals, xs)
    return vals[out_slot]


def _apply_act_rows(act_id, z, act_set=None):
    """Per-row activation: act_id (width,), z (width, P).

    Masked sum over the (pruned) activation set — every fn in the set is
    clipped/total, so the unselected branches contribute exact zeros."""
    fns = _ACT_FNS if act_set is None else tuple(_ACT_FNS[i] for i in act_set)
    if len(fns) == 1:
        return fns[0](z)
    out = jnp.zeros_like(z)
    for local, fn in enumerate(fns):
        out = out + jnp.where(act_id[:, None] == local, fn(z), 0.0)
    return out


evaluate_population_levels = jax.vmap(
    evaluate_cppn_levels, in_axes=(0, 0, 0, 0, 0, None)
)


def make_population_eval(act_set=None):
    """Population evaluator computing only ``act_set``'s activations.

    ``act_set`` is static (baked into the jaxpr): callers key their jit
    caches on it and keep it GROW-ONLY across a run so recompiles are rare
    (CLAUDE.md growable-bucket invariant)."""
    if act_set is None:
        return evaluate_population_levels
    act_set = tuple(act_set)

    def eval_one(weights, bias, response, act_id, out_slot, inputs):
        return evaluate_cppn_levels(
            weights, bias, response, act_id, out_slot, inputs, act_set
        )

    return jax.vmap(eval_one, in_axes=(0, 0, 0, 0, 0, None))
