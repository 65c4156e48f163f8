"""Reference call-contract shims (SURVEY.md Appendix A).

Drop-in signatures for the three external APIs the reference imports from
its submodules, so code written against the reference runs unchanged:

  * ``test_prednet(...)`` — chainer_prednet's file-bus runner
    (generate_illusion.py:533-537): reads a flat frame-path list, rolls the
    predictor with periodic state resets and closed-loop "extension"
    windows, writes ``%010d.png`` / ``%010d_extended.png`` into output_dir.
  * ``lucas_kanade(...)`` — re-exported from ops.flow.
  * ``create_cppn(genome, config, leaf_names, out_names)`` — pytorch_neat's
    CPPN builder: returns one callable per output node;
    ``node_fn(x=arr, y=arr) -> arr``.

These shims keep the reference's FILESYSTEM data plane; the native pipeline
(evolution/) bypasses it entirely and is the fast path.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.cppn import pack_population_levels, evaluate_population_levels
from .models.prednet.loader import load_or_init
from .models.prednet.model import init_state, prednet_step
from .neat.config import NeatConfig
from .neat.genome import Genome
from .ops.flow.api import lucas_kanade  # noqa: F401  (re-export)
from .utils.image_io import load_image, save_image

__all__ = ["test_prednet", "lucas_kanade", "create_cppn"]


def test_prednet(
    initmodel: str,
    sequence_list: Sequence[Sequence[str]],
    size: Sequence[int],
    channels: Sequence[int],
    gpu: int = 0,
    output_dir: str = "prediction/",
    skip_save_frames: int = 1,
    extension_start: int = 20,
    extension_duration: int = 2,
    reset_at: Optional[int] = None,
    verbose: int = 0,
    c_dim: Optional[int] = None,
) -> None:
    """File-bus predictor runner with the reference contract.

    Frames are consumed in windows of ``extension_start`` inputs; after each
    window the model free-runs ``extension_duration`` closed-loop steps;
    state resets every ``reset_at`` frames (the reference passes
    extension_start + extension_duration, isolating windows — which lets
    this implementation batch all windows as one device call).

    Writes, per global input index g: ``%010d.png`` (the model's prediction
    while seeing input g, renumbered consecutively when
    ``skip_save_frames > 1``), and per extension step j of the window
    starting at input w: ``%010d_extended.png`` with index w +
    extension_start + j.  ``gpu`` is accepted for signature parity.
    """
    del gpu, verbose
    w, h = int(size[0]), int(size[1])
    c_dim = int(c_dim if c_dim is not None else channels[0])
    if reset_at is None:
        reset_at = extension_start + extension_duration
    if reset_at != extension_start + extension_duration:
        raise NotImplementedError(
            "shim supports the reference schedule "
            "(reset_at == extension_start + extension_duration)"
        )
    paths = list(sequence_list[0])
    T = extension_start
    if len(paths) % T != 0:
        raise ValueError(f"sequence length {len(paths)} not divisible by "
                         f"extension_start {T}")
    n_win = len(paths) // T

    params = load_or_init(initmodel or None, list(channels))
    frames = np.stack(
        [load_image(p, size=(w, h), c_dim=c_dim) for p in paths]
    ).reshape(n_win, T, h, w, c_dim)

    @jax.jit
    def run(params, frames):
        B = frames.shape[0]
        state = init_state(B, h, w, list(channels),
                           dtype=params[0]["lstm_w"].dtype)

        def step(state, frame):
            state, pred = prednet_step(params, state, frame)
            return state, pred

        state, preds = jax.lax.scan(step, state, jnp.moveaxis(frames, 0, 1))
        preds = jnp.moveaxis(preds, 0, 1)  # (B, T, h, w, c)
        ext = []
        pred = preds[:, -1]
        for _ in range(extension_duration):
            state, pred = prednet_step(params, state, pred)
            ext.append(pred)
        return preds, jnp.stack(ext, axis=1)

    preds, ext = run(params, jnp.asarray(frames))
    preds = np.asarray(preds)
    ext = np.asarray(ext)

    os.makedirs(output_dir, exist_ok=True)
    saved = 0
    for win in range(n_win):
        for t in range(T):
            if t % skip_save_frames == 0:
                save_image(
                    preds[win, t],
                    os.path.join(output_dir, f"{saved:010d}.png"),
                )
                saved += 1
        for j in range(extension_duration):
            idx = win * T + T + j
            save_image(
                ext[win, j],
                os.path.join(output_dir, f"{idx:010d}_extended.png"),
            )


def create_cppn(
    genome: Genome,
    config: NeatConfig,
    leaf_names: Sequence[str] = ("x", "y"),
    out_names: Sequence[str] = (),
):
    """pytorch_neat-style CPPN builder (generate_illusion.py:343-348).

    Returns one callable per genome output; each accepts the leaf planes as
    keyword arrays (``node(x=..., y=...)``) and returns the node's values.
    """
    del out_names  # the reference passes [] too
    if len(leaf_names) != config.num_inputs:
        raise ValueError(
            f"{len(leaf_names)} leaves for {config.num_inputs}-input genome"
        )
    packed = {
        k: jnp.asarray(v)
        for k, v in pack_population_levels([genome], config).items()
    }

    def make_node(idx: int):
        def node_fn(**leaves):
            flat = jnp.stack(
                [jnp.asarray(leaves[n], jnp.float32).reshape(-1)
                 for n in leaf_names]
            )
            out = evaluate_population_levels(
                packed["weights"],
                packed["bias"],
                packed["response"],
                packed["act_id"],
                packed["out_slot"],
                flat,
            )
            shape = np.shape(list(leaves.values())[0])
            return np.asarray(out[0, idx]).reshape(shape)

        return node_fn

    return [make_node(i) for i in range(config.num_outputs)]
